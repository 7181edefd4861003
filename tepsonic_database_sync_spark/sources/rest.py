"""REST API ingestion — SURVEY.md §2.1 S1, §2.2 P9.

The reference fetches the whole vendor inventory in one driver-side GET
with Basic auth (src/routes/products.js:233-240, tolerating non-array
payloads → []). Two engine paths:

- ``fetch_items`` + ``items_to_df``: the faithful small-scale path —
  driver-side fetch → ``spark.createDataFrame`` (Arrow). Right while the
  payload fits on the driver, exactly like the reference.
- ``paginated_source``: the 100 TB path — page ids distributed via
  ``spark.range(n_pages)`` and fetched *inside* ``mapInPandas``, so N
  executors pull N pages concurrently and no single process ever holds
  the whole payload. The transport is injected (``fetch_page``) — tests
  use a deterministic local stub; production passes an HTTP client.

Failure isolation (X1, products.js:383-395): per-page/vendor failures
surface as error rows, never as job aborts.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def basic_auth_header(app_id: str, app_secret: str) -> str:
    """P9 — ``Basic base64(appId:appSecret)`` (products.js:233-235)."""
    token = base64.b64encode(f"{app_id}:{app_secret}".encode()).decode()
    return f"Basic {token}"


def coerce_items(payload: object) -> list[dict]:
    """Tolerate non-array payloads → [] (products.js:240)."""
    if isinstance(payload, dict):
        payload = payload.get("data")
    return payload if isinstance(payload, list) else []


def fetch_items(
    url: str,
    app_id: str,
    app_secret: str,
    transport: Callable[[str, dict[str, str]], str] | None = None,
) -> list[dict]:
    """Driver-side fetch of ``{"data": [...]}``. ``transport(url, headers)
    -> body`` is injectable; the default uses urllib (no extra deps) and
    is import-try-gated for sandboxed environments."""
    headers = {
        "Accept": "application/json",
        "Authorization": basic_auth_header(app_id, app_secret),
    }
    if transport is None:

        def transport(u: str, h: dict[str, str]) -> str:
            from urllib.request import Request, urlopen

            with urlopen(Request(u, headers=h)) as resp:  # noqa: S310
                return resp.read().decode()

    body = transport(url, headers)
    return coerce_items(json.loads(body).get("data"))


def items_to_df(spark: SparkSession, items: list[dict], schema: T.StructType) -> DataFrame:
    """Materialize fetched items under an explicit schema (the engine
    never schema-infers vendor payloads — SURVEY.md §1.4)."""
    return spark.createDataFrame(items, schema)


def paginated_source(
    spark: SparkSession,
    n_pages: int,
    fetch_page: Callable[[int], list[dict]],
    schema: T.StructType,
) -> DataFrame:
    """Distributed paginated fetch: one task per page, rows validated
    against ``schema``. Fetch errors become error rows (column ``_error``)
    instead of failing the job."""
    import pandas as pd

    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("_error", T.StringType(), True)]
    )
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for page in pdf["id"]:
                try:
                    for item in fetch_page(int(page)):
                        rows.append(
                            {**{n: item.get(n) for n in names}, "_error": None}
                        )
                except Exception as ex:  # noqa: BLE001 — X1 fault isolation
                    rows.append(
                        {**{n: None for n in names}, "_error": f"page {page}: {ex}"}
                    )
            yield pd.DataFrame(rows, columns=names + ["_error"])

    return (
        spark.range(n_pages)
        .repartition(min(n_pages, 64))
        .mapInPandas(run, out_schema)
    )

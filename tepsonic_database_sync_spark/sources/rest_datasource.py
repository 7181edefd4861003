"""PySpark 4 Python DataSource for paginated REST inventory feeds —
SURVEY.md §2.1 S1's "custom DataSource" scale path, as a first-class
``spark.read.format(...)`` source.

The reference pulls one vendor inventory with a single driver-side GET
(src/routes/products.js:233-240). This source makes ingestion a real scan
node instead of driver code: each page is an ``InputPartition``, so a
1000-executor cluster pulls 1000 pages concurrently, and Catalyst treats
the result like any other relation (column pruning applies; the scan
composes with joins/aggregations downstream).

Usage::

    spark.dataSource.register(RestInventoryDataSource)
    df = (spark.read.format("rest_inventory")
          .option("pages", "128")
          .option("payload_dir", "/data/pages")      # file-backed transport
          # or .option("base_url", "https://.../inventory?page={page}")
          #    .option("app_id", ...).option("app_secret", ...)
          .load())

Transports:
- ``payload_dir``: reads ``page-{i}.json`` files — deterministic, offline,
  what the tests use (this container has no network).
- ``base_url``: HTTP GET with Basic auth per page (``{page}`` template) —
  the production path, executed inside the executor task.

Fault isolation (X1, products.js:383-395): a failed page yields one error
row (``_error`` column) instead of failing the scan.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

# Flat vendor-item payload shape (SURVEY.md §1.2), plus the error channel.
ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("esn", T.StringType()),
        T.StructField("hex_id", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("total_price_paid", T.LongType()),
        T.StructField("manufacturer", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("color", T.StringType()),
        T.StructField("capacity", T.StringType()),
        T.StructField("grade", T.StringType()),
        T.StructField("_error", T.StringType()),
    ]
)

_FIELDS = [f.name for f in ITEM_SCHEMA.fields if f.name != "_error"]


def _fetch_page_body(options: dict, page: int) -> str:
    payload_dir = options.get("payload_dir")
    if payload_dir:
        with open(os.path.join(payload_dir, f"page-{page}.json")) as f:
            return f.read()
    base_url = options.get("base_url")
    if not base_url:
        raise ValueError("rest_inventory: set payload_dir or base_url")
    from tepsonic_database_sync_spark.sources.rest import basic_auth_header
    from urllib.request import Request, urlopen

    headers = {"Accept": "application/json"}
    if options.get("app_id"):
        headers["Authorization"] = basic_auth_header(
            options["app_id"], options.get("app_secret", "")
        )
    url = base_url.format(page=page)
    with urlopen(Request(url, headers=headers)) as resp:  # noqa: S310
        return resp.read().decode()


class _RestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.n_pages = int(options.get("pages", "1"))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from tepsonic_database_sync_spark.sources.rest import coerce_items

        page = partition.value
        try:
            items = coerce_items(
                json.loads(_fetch_page_body(self.options, page)).get("data")
            )
        except Exception as ex:  # noqa: BLE001 — X1: error row, not job abort
            yield tuple([None] * len(_FIELDS) + [f"page {page}: {ex}"])
            return
        for item in items:
            yield tuple([item.get(n) for n in _FIELDS] + [None])


class RestInventoryDataSource(DataSource):
    """``spark.read.format("rest_inventory")`` — one partition per page."""

    @classmethod
    def name(cls) -> str:
        return "rest_inventory"

    def schema(self) -> T.StructType:
        return ITEM_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _RestReader(self.options)

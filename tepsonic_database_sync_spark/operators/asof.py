"""As-of and range joins — operators Spark lacks natively, re-expressed
with scale-correct primitives (SURVEY.md §2.6 noted their absence in the
reference; these are engine extensions every time-series workload needs).

- ``as_of_join``: "for each left row, the latest right row with
  right_ts ≤ left_ts, per key". Implemented as the union-sort trick: tag
  both sides, one window sort per key, ``last(value, ignorenulls)`` over
  the running frame. ONE shuffle on the key — no per-row probing, no
  ``merge_asof`` Pandas fallback — and the window never materializes more
  than a partition, so it holds at 100 TB given a sane key cardinality.
- ``range_join_pairs``: "pairs within a time range" via interval
  bucketing: candidates = equi-join on (key, bucket) with each left row
  exploded to the 2 buckets its range spans, then an exact range filter.
  Turns the O(N·M) theta-join into an equi-join Catalyst can hash — the
  standard range-join-optimization shape (same trick Databricks' range
  join hints apply).

Timestamps are compared at epoch-second precision (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SENTINEL = 1 << 62  # sorts left rows after right rows at equal ts


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_id: str = "event_id",
    right_id: str = "event_id",
    ts: str = "ts",
) -> DataFrame:
    """Latest right row (by ts, then id) at-or-before each left row's ts,
    per key. Output: key, event_id (left), epoch_s, asof_<right_id>."""
    r = right.select(
        F.col(key).alias("k"),
        F.unix_timestamp(ts).cast("long").alias("es"),
        F.col(right_id).cast("long").alias("rid"),
        F.lit(None).cast("long").alias("lid"),
    )
    l = left.select(
        F.col(key).alias("k"),
        F.unix_timestamp(ts).cast("long").alias("es"),
        F.lit(None).cast("long").alias("rid"),
        F.col(left_id).cast("long").alias("lid"),
    )
    u = r.unionByName(l)
    # at equal ts: right rows (ordered by id) precede left rows, so an
    # equal-timestamp right row IS visible to the left row (as-of ≤)
    order_tail = F.coalesce(F.col("rid"), F.lit(_SENTINEL))
    w = (
        Window.partitionBy("k")
        .orderBy("es", order_tail)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = u.withColumn("asof_rid", F.last("rid", ignorenulls=True).over(w))
    return m.filter(F.col("lid").isNotNull()).select(
        F.col("k").alias(key),
        F.col("lid").alias("event_id"),
        F.col("es").alias("epoch_s"),
        F.col("asof_rid"),
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_id: str = "event_id",
    right_id: str = "event_id",
    ts: str = "ts",
    lookback_secs: int = 600,
) -> DataFrame:
    """Pairs (left, right) with right_ts ∈ [left_ts - lookback, left_ts),
    per key — bucketized to an equi-join: a range of length L spans at
    most 2 buckets of width L, so each left row probes exactly 2 buckets."""
    a = left.select(
        F.col(key).alias("k"),
        F.col(left_id).cast("long").alias("a_id"),
        F.unix_timestamp(ts).cast("long").alias("ea"),
    ).withColumn(
        "bk",
        F.explode(
            F.array(
                (F.floor(F.col("ea") / lookback_secs) - 1).cast("long"),
                F.floor(F.col("ea") / lookback_secs).cast("long"),
            )
        ),
    )
    b = right.select(
        F.col(key).alias("k"),
        F.col(right_id).cast("long").alias("b_id"),
        F.unix_timestamp(ts).cast("long").alias("eb"),
    ).withColumn("bk", F.floor(F.col("eb") / lookback_secs).cast("long"))
    return (
        a.join(b, ["k", "bk"])
        .filter(
            (F.col("eb") >= F.col("ea") - lookback_secs)
            & (F.col("eb") < F.col("ea"))
        )
        # no distinct needed: each right row lives in exactly one bucket,
        # so a candidate pair is generated at most once
        .select(F.col("k").alias(key), "a_id", "b_id")
    )

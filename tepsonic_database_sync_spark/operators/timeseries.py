"""Regular-grid time-series resampling with gap fill and LOCF.

The reference syncs vendor product state on a schedule and reasons about
"the value as of each poll tick" (products.js:236's nightly pull);
downstream analytics over such feeds invariably need the observations
re-laid onto a regular grid — every (key, bucket) present, observation
gaps filled by carrying the last value forward (LOCF, "last observation
carried forward").  This module is that operator, Spark-first.

Scale shape
-----------
1. One raw-event shuffle: groupBy (key, bucket) with map-side combine —
   the shuffle carries one row per non-empty bucket, never raw events.
2. The per-key grid is built from the per-key [min, max] bucket range via
   ``sequence`` + ``explode`` — grid size is bounded by the time span
   over the step, NOT by event volume, and needs no driver-side loop.
3. The LOCF window sorts only the (key, bucket) grid frame (tiny vs raw
   events), partitioned by key — the same "aggregate first, window over
   aggregates" shape as events.event_anomaly.
4. The grid↔aggregate join is an equi-join on (key, bucket); both sides
   are already hash-partitioned on the key after their aggregates, so AQE
   plans it without an extra exchange on the large side.

Everything is integer math (epoch-second buckets, cent values), so the
DuckDB oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Default grid step: hourly, matching events.ANOMALY_BUCKET_S so the two
# operators' bucket math lines up on the same table.
RESAMPLE_STEP_S = 3600


def bucket_es(ts: Column, step_s: int = RESAMPLE_STEP_S) -> Column:
    """Epoch-second grid bucket: floor(unix_ts / step) * step, BIGINT."""
    return (F.floor(F.unix_timestamp(ts) / step_s) * step_s).cast("long")


def resample_locf(
    events: DataFrame,
    key: str,
    ts: str,
    value_cents: Column,
    step_s: int = RESAMPLE_STEP_S,
) -> DataFrame:
    """Resample ``events`` onto a regular per-``key`` grid and fill gaps.

    Per key, emits one row for EVERY ``step_s`` bucket between that key's
    first and last observation (inclusive):

    - ``n_events``  — rows observed in the bucket (0 for gap buckets),
    - ``value_cents`` — the bucket's max observed value, carried forward
      from the last non-empty bucket when the bucket is a gap (LOCF; max
      is the deterministic in-bucket reducer — any commutative aggregate
      slots in),
    - ``is_gap``   — TRUE iff the bucket had no observations.

    Leading NULLs cannot occur: the grid starts at the key's first
    observed bucket, so every gap has a predecessor to carry forward.
    """
    obs = (
        events.select(
            F.col(key).alias("key"),
            bucket_es(F.col(ts), step_s).alias("bucket_es"),
            value_cents.alias("v"),
        )
        .groupBy("key", "bucket_es")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("v").cast("long").alias("v_max"),
        )
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket_es").alias("b0"), F.max("bucket_es").alias("b1"))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.lit(int(step_s)))
            ).alias("bucket_es"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_es")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["key", "bucket_es"], "left")
        .select(
            "key",
            "bucket_es",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
                "n_events"
            ),
            F.last("v_max", ignorenulls=True)
            .over(w)
            .cast("long")
            .alias("value_cents"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )

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


def resample_linear(
    events: DataFrame,
    key: str,
    ts: str,
    value_cents: Column,
    step_s: int = RESAMPLE_STEP_S,
) -> DataFrame:
    """``resample_locf``'s sibling with LINEAR interpolation across gaps
    — the right fill for continuously-varying signals (prices, sensor
    readings) where carrying the last value forward biases everything
    after a gap.

    Per key, one row per ``step_s`` bucket between the key's first and
    last observation. Gap buckets get

        v(t) = (v_prev·(t_next − t) + v_next·(t − t_prev))
                 div (t_next − t_prev)

    — the convex-combination form, chosen over ``v_prev + slope·Δt``
    because with non-negative values BOTH products are non-negative, so
    the single truncating division is engine-portable with no sign
    cases. Contract: ``value_cents`` ≥ 0 (holds for the cent-valued
    feeds this serves). The grid is bounded by observations on both
    sides, so ``t_prev``/``t_next`` always exist.

    Scale shape: identical to ``resample_locf`` — one map-side-combined
    groupBy to per-bucket observations, one bounded grid explode, and
    the fill windows run over GRID rows (one per bucket), never raw
    events; the forward and backward carries are two frames over the
    same partition key, one sort.

    Returns (key, bucket_es, n_events, value_cents, is_gap).
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
    wb = (
        Window.partitionBy("key")
        .orderBy("bucket_es")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("key")
        .orderBy("bucket_es")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("v_max").isNotNull(), F.col("bucket_es"))
    filled = (
        grid.join(obs, ["key", "bucket_es"], "left")
        .select(
            "key",
            "bucket_es",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
                "n_events"
            ),
            F.col("n_events").isNull().alias("is_gap"),
            F.last("v_max", ignorenulls=True).over(wb).alias("vp"),
            F.last(obs_b, ignorenulls=True).over(wb).alias("tp"),
            F.first("v_max", ignorenulls=True).over(wf).alias("vn"),
            F.first(obs_b, ignorenulls=True).over(wf).alias("tn"),
        )
    )
    interp = F.expr(
        "(vp * (tn - bucket_es) + vn * (bucket_es - tp)) div (tn - tp)"
    )
    return filled.select(
        "key",
        "bucket_es",
        "n_events",
        F.when(~F.col("is_gap"), F.col("vp"))
        .otherwise(interp)
        .cast("long")
        .alias("value_cents"),
        "is_gap",
    )


def interval_concurrency(
    intervals: DataFrame, key: str, start_es: Column, end_es: Column
) -> DataFrame:
    """Concurrent-interval profile per key — the sweep-line staple (how
    many sessions/jobs/syncs were live at each instant): every interval
    contributes +1 at its start and −1 at its (EXCLUSIVE) end; the
    running sum of per-instant nets is the concurrency right after each
    boundary.

    Returns (key, t_es, net, concurrency): one row per distinct
    boundary instant, ``net`` the sum of deltas landing there (both
    deltas of an interval starting and ending at the same instant cancel
    to 0 — zero-length intervals never count), ``concurrency`` the live
    count from that instant until the next boundary.

    Scale shape: explode to 2 rows per interval, ONE map-side-combined
    groupBy on (key, instant), then the running-sum window over the
    per-key distinct-boundary series — aggregate first, window over
    aggregates (the event_anomaly shape). Never a self-join, never a
    window over raw intervals.

    Contract: start/end must be non-NULL (engines disagree on NULL
    ordering — Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST —
    so a NULL boundary would make the running sum engine-dependent).
    """
    deltas = intervals.select(
        F.col(key).alias("key"),
        F.explode(
            F.array(
                F.struct(start_es.cast("long").alias("t"), F.lit(1).alias("d")),
                F.struct(end_es.cast("long").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select("key", "e.t", "e.d")
    net = deltas.groupBy("key", "t").agg(
        F.sum("d").cast("long").alias("net")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return net.select(
        "key",
        F.col("t").alias("t_es"),
        "net",
        F.sum("net").over(w).cast("long").alias("concurrency"),
    )


# EWMA half-life in buckets: weight 2^(EWMA_SPAN-1-k) for a reading k
# buckets back — dyadic weights keep every product an exact integer.
EWMA_SPAN = 8


def ewma_dyadic(
    readings: DataFrame,
    key: str,
    bucket_col: str,
    value_col: str,
    step_s: int = RESAMPLE_STEP_S,
    span: int = EWMA_SPAN,
) -> DataFrame:
    """Exponentially-weighted moving average with half-life = one
    bucket, over a possibly-gappy per-key bucket series — the smoothing
    signal next to the spike detector. Weights are powers of two
    (2^(span−1−k) for a reading k buckets back, window of ``span``
    buckets), so every contribution is an exact integer and the oracle
    replays it bit-for-bit; the result is
    ``ewma_milli = 1000·Σ w·x DIV Σ w`` over the readings PRESENT in
    the trailing window (gaps carry no weight — the denominator adapts,
    which is how a time-decayed average should treat missing polls).

    Scale shape: the active_users contribution-explode — each reading
    emits its ``span`` forward contributions via one generator (no
    self-join, no RANGE window with per-row distance weights, which
    Spark windows cannot express), then ONE map-side-combined groupBy on
    (key, target bucket); an inner join back to the real buckets drops
    targets that never observed a reading.

    Contract: ``value_col`` must be non-negative — the weighted sums
    then stay non-negative, so Spark's truncating DIV equals DuckDB's
    flooring // (the engine family's standard negative-division guard).
    """
    r = readings.select(
        F.col(key).alias("key"),
        F.col(bucket_col).cast("long").alias("b"),
        F.col(value_col).cast("long").alias("x"),
    )
    contrib = r.select(
        "key",
        F.explode(
            F.expr(
                f"transform(sequence(0, {span - 1}),"
                f" k -> struct(b + CAST(k AS BIGINT) * {step_s} AS tb,"
                f"             shiftleft(CAST(1 AS BIGINT), {span - 1} - k)"
                f"             AS w,"
                f"             x * shiftleft(CAST(1 AS BIGINT), {span - 1} - k)"
                f"             AS wx))"
            )
        ).alias("c"),
    ).select("key", "c.tb", "c.w", "c.wx")
    sums = contrib.groupBy("key", "tb").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum("wx").cast("long").alias("swx"),
    ).withColumnRenamed("key", "__k")
    return (
        r.join(
            sums,
            (F.col("b") == F.col("tb")) & (F.col("key") == F.col("__k")),
        )
        .select(
            "key",
            F.col("b").alias("bucket_es"),
            F.col("x").alias("value"),
            F.expr("(1000 * swx) div sw").cast("long").alias("ewma_milli"),
        )
    )


def ohlc_bars(
    events: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    value_cents: Column,
    step_s: int = RESAMPLE_STEP_S,
) -> DataFrame:
    """Per-key OHLC bars (open/high/low/close + count + volume) on a
    regular grid — the canonical time-series downsample for any metered
    value feed.

    Determinism is the whole problem: "first/last value in the bucket"
    needs a TOTAL order even when two readings share a microsecond, and
    the portable arg-min/max surface across engines is too narrow for
    composite orderings. The engine's trick: encode (epoch_us, id,
    value) as one fixed-width zero-padded string whose lexicographic
    order equals the numeric composite order, take plain min/max —
    deterministic in ANY engine — and decode the value by substring.
    Contract (ALL enforced at runtime, not just documented — a violation
    raises mid-job instead of silently mis-picking open/close):
    ``value_cents`` non-negative and < 10¹² and ``ts`` >= 1970-01-01
    (zero-padding is order-preserving only without a sign character),
    ``id_col`` rendering to <= 12 characters (lpad TRUNCATES beyond
    the pad width, which would break the total order); ``id_col``
    unique. All hold for the cent-valued feeds this serves.

    One map-side-combined groupBy; no window, no self-join. The guard
    is a codegen'd branch on already-computed values — no extra pass.
    """
    us = F.unix_micros(F.col(ts))
    v = value_cents.cast("long")
    id_s = F.col(id_col).cast("string")
    enc_ok = (
        (us >= 0)
        & (v >= 0)
        & (v < F.lit(10**12))
        & (F.length(id_s) <= 12)
    )
    enc = F.when(
        enc_ok,
        F.concat(
            F.lpad(us.cast("string"), 20, "0"),
            F.lpad(id_s, 12, "0"),
            F.lpad(v.cast("string"), 12, "0"),
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "ohlc_bars encoding contract violated "
                    "(need ts>=epoch, 0<=value<10^12, len(id)<=12): ts_us="
                ),
                us.cast("string"),
                F.lit(" id="),
                id_s,
                F.lit(" value="),
                v.cast("string"),
            )
        )
    )
    bucket = (F.floor(us / (step_s * 1000000)) * step_s).cast("long")
    return (
        events.select(
            F.col(key).alias("key"),
            bucket.alias("bucket_es"),
            enc.alias("__e"),
            v.alias("__v"),
        )
        .groupBy("key", "bucket_es")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.substring(F.min("__e"), 33, 12).cast("long").alias("open_cents"),
            F.max("__v").cast("long").alias("high_cents"),
            F.min("__v").cast("long").alias("low_cents"),
            F.substring(F.max("__e"), 33, 12).cast("long").alias("close_cents"),
            F.sum("__v").cast("long").alias("volume_cents"),
        )
    )


INTERVAL_BUCKET_S = 3600


def interval_overlap_join(
    a: DataFrame, b: DataFrame, bucket_s: int = INTERVAL_BUCKET_S
) -> DataFrame:
    """Unkeyed interval-overlap join — "which incidents touched which
    activity windows" — as a BUCKETED equi-join, never a quadratic theta
    join: each interval explodes to the time-grid buckets it covers
    (a bounded generator), candidates meet on the bucket key, a distinct
    collapses multi-bucket matches, and the exact end-exclusive overlap
    test (a_start < b_end AND b_start < a_end) removes same-bucket
    near-misses. The registry oracle is the INDEPENDENT quadratic theta
    join, so the hash certifies the blocking's completeness (the
    dedup_prefix_filter pattern applied to time).

    Inputs: ``a`` = (a_id, a_start, a_end), ``b`` = (b_id, b_start,
    b_end), epoch-second integers, end-exclusive. Returns (a_id, b_id,
    overlap_sec).

    Scale: candidate count per bucket is |a-in-bucket|·|b-in-bucket| —
    ``bucket_s`` is the knob (≈ median interval length); intervals
    spanning many buckets multiply the explode, so cap pathological
    spans upstream or split the long tail into its own pass.

    Non-positive-length intervals (end ≤ start) are dropped before the
    explode: under end-exclusive semantics they can never overlap
    anything, and a REVERSED interval would otherwise make ``sequence``
    descend (start bucket > end bucket) and fan out one junk row per
    bucket in between — filtered-then-verified would still be correct,
    but the fan-out is unbounded garbage.
    """
    a = a.filter(F.col("a_end") > F.col("a_start"))
    b = b.filter(F.col("b_end") > F.col("b_start"))
    ab = a.select(
        "a_id",
        "a_start",
        "a_end",
        F.explode(
            F.sequence(
                F.expr(f"a_start div {bucket_s}"),
                F.expr(f"(a_end - 1) div {bucket_s}"),
            )
        ).alias("bucket"),
    )
    bb = b.select(
        "b_id",
        "b_start",
        "b_end",
        F.explode(
            F.sequence(
                F.expr(f"b_start div {bucket_s}"),
                F.expr(f"(b_end - 1) div {bucket_s}"),
            )
        ).alias("bucket"),
    )
    return (
        ab.join(bb, "bucket")
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .select(
            "a_id",
            "b_id",
            (
                F.least("a_end", "b_end")
                - F.greatest("a_start", "b_start")
            )
            .cast("long")
            .alias("overlap_sec"),
        )
        .distinct()
    )


# registry-query parameters shared with the oracle (incident windows
# around high-value events)
INCIDENT_VALUE_MIN = 450
INCIDENT_SPAN_S = 2 * 3600

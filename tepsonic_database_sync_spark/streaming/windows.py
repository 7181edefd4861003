"""Streaming window operators — SURVEY.md §2.7 extension.

The reference is strictly request-triggered batch (router.get,
src/routes/products.js:358,424) — it has no streaming surface. The
engine's extension covers the standard window family over the driver's
``events`` table (ts/user_id/event_type/value):

- tumbling / sliding windows (``F.window``)
- session windows (``F.session_window`` streaming; gaps-and-islands batch)
- watermarked streaming aggregation (``readStream`` → ``writeStream``)

Every operator has a *batch-equivalent* DataFrame form (used by the
DuckDB oracle checks — same semantics, same output) and a streaming form
built on Structured Streaming. Outputs use epoch-second BIGINTs and
integer-cent sums so results are engine-portable (no float-accumulation
or timestamp-precision drift).

Scale note: watermarks bound state; the groupBy keys (window × type /
user) are high-cardinality and well-distributed, so state and shuffle
spread evenly across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_SECS = 1800


def _value_cents() -> F.Column:
    # sum money-like doubles as integer cents: deterministic across engines
    return F.round(F.col("value") * 100, 0).cast("long")


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts+sums per event_type (batch form)."""
    w = F.window(F.col("ts"), width)
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(_value_cents()).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("ws"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def multires_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the daily aggregate is
    computed FROM the hourly aggregate, not from raw events — the
    continuous-aggregate pattern. At 100 TB the daily pass touches
    |hours × types| pre-aggregated rows (thousands) instead of re-scanning
    the fact table; chain further (day → month) at ~zero marginal cost.
    Correctness relies on count/sum being re-aggregable (no avg/distinct
    at the coarse level without sketch columns)."""
    hourly = tumbling_counts(events, "1 hour")
    ds = (F.floor(F.col("ws") / 86400) * 86400).cast("long").alias("ds")
    return hourly.groupBy(ds, "event_type").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts per event_type (batch form). Each event lands
    in width/slide windows — Spark's ``window`` generates them natively."""
    w = F.window(F.col("ts"), width, slide)
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("ws"),
            "event_type",
            "n",
        )
    )


def sessionize(events: DataFrame, gap_secs: int = SESSION_GAP_SECS) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session per user breaks
    when the gap to the previous event exceeds ``gap_secs``. Returns one
    row per session with bounds and counts.

    Streaming twin: ``F.session_window(ts, gap)`` — same semantics,
    incremental state. The batch form is two narrow window functions over
    a single (user_id, ts) sort — one shuffle."""
    e = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    by_user = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = e.withColumn(
        "new_session",
        (
            F.coalesce(
                F.col("es") - F.lag("es").over(by_user) > gap_secs, F.lit(True)
            )
        ).cast("int"),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("es").cast("long").alias("session_start"),
            F.max("es").cast("long").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .withColumn(
            "duration_secs", (F.col("session_end") - F.col("session_start")).cast("long")
        )
        .withColumn("session_seq", F.col("session_seq").cast("long"))
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    schema,
    width: str = "1 hour",
    watermark: str = "2 hours",
):
    """True Structured Streaming form: parquet source → watermarked
    tumbling aggregation. Returns the streaming DataFrame (caller attaches
    the sink; tests use the memory sink + processAllAvailable)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    w = F.window(F.col("ts"), width)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(_value_cents()).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("ws"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def run_stream_to_memory(stream_df, name: str) -> DataFrame:
    """Drive a streaming query over all currently-available input and stop
    (the local test harness for streaming operators)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")

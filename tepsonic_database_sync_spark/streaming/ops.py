"""Streaming dedup + stream-static enrichment (SURVEY.md §2.7 extension).

The reference is strictly request-triggered batch (src/routes/products.js:
358,424) — these are the engine's streaming-native counterparts of two
things every continuous ingest pipeline needs:

- **At-least-once dedup**: upstream replays deliver the same event twice;
  ``dropDuplicatesWithinWatermark`` keeps one row per ``event_id`` with
  bounded state (only ids inside the watermark horizon are remembered).
  That bounded-state property is what makes it run forever at 100 TB/day —
  an unwatermarked ``dropDuplicates`` on a stream grows state without limit.
- **Stream-static join**: enrich a fact stream against a slowly-changing
  dimension. The static side is re-read per micro-batch (picks up dim
  updates) and joined broadcast — no stream-side shuffle at all.

Each has a deterministic batch analog (same columns) used for the DuckDB
oracle check; the streaming forms are exercised in tests with the memory
sink and must agree with the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENRICH_COLS = ("event_id", "user_id", "segment", "event_type", "value_cents")


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch analog: dedupe an at-least-once delivery (events ∪ events) on
    event_id. Duplicates are bit-identical rows, so keep-any == keep-first."""
    replayed = events.unionByName(events)
    return (
        replayed.dropDuplicates(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        )
    )


def dedup_events_stream(
    spark: SparkSession, events_dir: str, schema, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: watermarked bounded-state dedup on event_id."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        )
    )


def _enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return events.join(dim, "user_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("segment"), F.lit("UNKNOWN")).alias("segment"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )


def enrich_events_batch(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Batch analog of the stream-static dimension join."""
    return _enrich(events, customers)


def enrich_events_stream(
    spark: SparkSession, events_dir: str, schema, customers: DataFrame
) -> DataFrame:
    """Streaming form: per-micro-batch broadcast join against the static
    dimension — zero stream-side shuffle."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return _enrich(stream, customers)

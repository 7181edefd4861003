"""Streaming dedup + stream-static join: the true Structured Streaming
forms must agree with their batch analogs (which are what the DuckDB
oracle checks via the registry)."""

from __future__ import annotations

import tempfile

from conftest import SF_UNIT


def test_streaming_dedup_matches_batch(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.ops import (
        dedup_events_batch,
        dedup_events_stream,
    )
    from tepsonic_database_sync_spark.streaming.windows import run_stream_to_memory

    events = load_table(spark, SF_UNIT, "events")
    batch = dedup_events_batch(events).collect()
    with tempfile.TemporaryDirectory() as d:
        # write the replayed (duplicated) input the stream will consume
        events.unionByName(events).write.mode("overwrite").parquet(d)
        stream = dedup_events_stream(spark, d, events.schema)
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_dedup")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql("SELECT * FROM t_dedup").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch))


def test_event_id_unique_in_source(spark):
    """dedup_events_batch's oracle is DISTINCT over whole rows while the
    Spark side keys on event_id alone — equivalent ONLY while duplicates
    of an event_id are bit-identical rows. The registry dedup demos build
    duplicates by replaying the table against itself, so the contract is
    exactly 'event_id is unique in the source table'; enforce it here
    rather than assume it in a comment."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.io import load_table

    for sf in (SF_UNIT, "/root/testdata/sf0.01"):
        e = load_table(spark, sf, "events")
        dup = (
            e.groupBy("event_id").count().filter(F.col("count") > 1).limit(1).collect()
        )
        assert not dup, f"duplicate event_id in {sf}: {dup}"


def test_streaming_enrich_matches_batch(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.ops import (
        enrich_events_batch,
        enrich_events_stream,
    )

    events = load_table(spark, SF_UNIT, "events")
    customers = load_table(spark, SF_UNIT, "customer")
    batch = enrich_events_batch(events, customers).collect()
    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(d)
        stream = enrich_events_stream(spark, d, events.schema, customers)
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_enrich")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql("SELECT * FROM t_enrich").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch))

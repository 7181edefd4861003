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

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


def test_stream_stream_join_matches_batch_and_bounds_state(spark):
    """Watermarked stream-stream attribution join, two contracts in one
    deterministic run:

    1. EQUIVALENCE — over chronologically-fed micro-batches the streaming
       inner join emits exactly the batch analog's pairs (inner joins emit
       as soon as both sides meet; the range condition, not state luck,
       decides membership).
    2. BOUNDED STATE — once the watermark passes ``v_ts + window`` a view
       is evicted and a too-late purchase is dropped at input, so a
       purchase arriving behind the watermark produces NO pairs even
       though the batch analog over all rows would match it. This is the
       state bound that lets the join run forever (SCALE.md)."""
    import pandas as pd

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.ops import (
        attribute_purchases_batch,
        attribute_purchases_stream,
    )

    schema = load_table(spark, SF_UNIT, "events").schema

    def mk(eid, ts_ms, etype, uid, value=5.0):
        return {
            "event_id": eid,
            "ts": pd.Timestamp(ts_ms, unit="ms"),
            "user_id": uid,
            "event_type": etype,
            "value": value,
            "props": "{}",
        }

    H = 3_600_000  # one hour in ms
    t0 = 1000 * H  # an exact hour boundary
    batch1 = [
        mk(1, t0, "view", 1),
        mk(2, t0 + H, "view", 1),
        mk(3, t0, "view", 2),
    ]
    # p10 joins views 1+2 (both within 24h); different-user view 3 never
    batch2 = [mk(10, t0 + 2 * H, "purchase", 1)]
    # p11: user 2's only view is 26h back — outside the window, no pair;
    # p12 joins ONLY view 4 (views 1/2 are beyond 24h by then)
    batch3 = [
        mk(11, t0 + 26 * H, "purchase", 2),
        mk(4, t0 + 25 * H, "view", 1),
        mk(12, t0 + 25 * H + 1800_000, "purchase", 1),
    ]
    # sentinels push the watermark ~98h ahead so views 1/2/4 are truly
    # evicted. They must be a view AND a purchase on two unrelated users:
    # only rows surviving the pre-watermark filters advance a branch, and
    # the GLOBAL watermark is the MIN across both branches — a lone
    # filtered-out 'signup' sentinel would advance nothing (the conversion
    # test documents the same pitfall)
    batch4 = [
        mk(100, t0 + 100 * H, "view", 9),
        mk(200, t0 + 100 * H, "purchase", 8),
    ]
    # a purchase far behind the watermark: dropped at input (and its
    # candidate views are evicted by now) — NO pairs, although the batch
    # analog over all rows would join it to views 1/2
    batch5 = [mk(13, t0 + 3 * H, "purchase", 1)]

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pd.DataFrame(batch1), schema=schema).coalesce(
            1
        ).write.mode("append").parquet(d)
        q = (
            attribute_purchases_stream(spark, d, schema)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_ss_join")
            .start()
        )
        q.processAllAvailable()
        for b in (batch2, batch3, batch4, batch5):
            spark.createDataFrame(pd.DataFrame(b), schema=schema).coalesce(
                1
            ).write.mode("append").parquet(d)
            q.processAllAvailable()
        q.stop()
        got = {
            (r["purchase_id"], r["view_id"], r["user_id"], r["lag_sec"])
            for r in spark.sql("SELECT * FROM t_ss_join").collect()
        }

    on_time = batch1 + batch2 + batch3 + batch4
    want = {
        (r["purchase_id"], r["view_id"], r["user_id"], r["lag_sec"])
        for r in attribute_purchases_batch(
            spark.createDataFrame(pd.DataFrame(on_time), schema=schema)
        ).collect()
    }
    assert want == {
        (10, 1, 1, 7200),
        (10, 2, 1, 3600),
        (12, 4, 1, 1800),
    }
    assert got == want  # equivalence on the on-time prefix...
    # ...and the late purchase 13 contributed nothing (state was evicted)
    assert not any(pid == 13 for (pid, *_rest) in got)


def test_stream_conversion_outer_join_null_extends_after_watermark(spark):
    """LEFT-OUTER stream-stream join contract: a converted view emits its
    pair as soon as both sides meet (inner path), but an UNCONVERTED view
    emits its NULL-extended row only via state eviction — after the
    watermark passes ``v_ts + window`` — because until then a matching
    purchase could still arrive. Final output must equal the batch analog
    over the on-time events."""
    import pandas as pd

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.ops import (
        conversion_batch,
        conversion_stream,
    )

    schema = load_table(spark, SF_UNIT, "events").schema

    def mk(eid, ts_ms, etype, uid):
        return {
            "event_id": eid,
            "ts": pd.Timestamp(ts_ms, unit="ms"),
            "user_id": uid,
            "event_type": etype,
            "value": 5.0,
            "props": "{}",
        }

    H = 3_600_000
    t0 = 2000 * H
    batch1 = [mk(1, t0, "view", 1), mk(2, t0 + H, "view", 2)]
    batch2 = [mk(10, t0 + 2 * H, "purchase", 1)]  # converts view 1
    # two watermark subtleties the sentinels must respect: (a) only rows
    # that SURVIVE the pre-watermark filters advance a branch's watermark,
    # and (b) the GLOBAL watermark is the MIN across both branches
    # (multipleWatermarkPolicy=min) — so each sentinel batch carries a
    # view AND a purchase, for two different unrelated users so they can
    # never join each other. Null-extension rides EVICTION, which
    # materializes on the batch AFTER the watermark advances — hence two
    # sentinel batches.
    batch3 = [mk(100, t0 + 40 * H, "view", 9), mk(200, t0 + 40 * H, "purchase", 8)]
    batch4 = [mk(101, t0 + 41 * H, "view", 9), mk(201, t0 + 41 * H, "purchase", 8)]

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pd.DataFrame(batch1), schema=schema).coalesce(
            1
        ).write.mode("append").parquet(d)
        q = (
            conversion_stream(spark, d, schema)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_conv")
            .start()
        )
        q.processAllAvailable()
        for b in (batch2, batch3, batch4):
            spark.createDataFrame(pd.DataFrame(b), schema=schema).coalesce(
                1
            ).write.mode("append").parquet(d)
            q.processAllAvailable()
        q.stop()
        got = {
            (r["view_id"], r["purchase_id"], r["lag_sec"], r["converted"])
            for r in spark.sql("SELECT * FROM t_conv").collect()
        }

    # apples-to-apples: the analog runs over the CLOSED-window prefix —
    # sentinel views 100/101 have open windows at stop (a purchase could
    # still arrive), so the stream correctly holds them back
    want = {
        (r["view_id"], r["purchase_id"], r["lag_sec"], r["converted"])
        for r in conversion_batch(
            spark.createDataFrame(
                pd.DataFrame(batch1 + batch2), schema=schema
            )
        ).collect()
    }
    assert want == {(1, 10, 7200, True), (2, None, None, False)}
    assert got == want
    assert not any(vid in (100, 101) for (vid, *_r) in got)


def test_streaming_sessions_ttl_event_time(spark):
    """TTL sessionization via applyInPandasWithState + EventTimeTimeout:
    sessions must close on BOTH paths — 'gap' (a late event for the same
    key opens a new session in the same batch) and 'timeout' (the
    watermark passes session_end + gap with no new event for the key) —
    and the emitted aggregates must match a pure-Python sessionization of
    the same events. Deterministic: timeouts are event-time (watermark-
    driven by a sentinel event on an unrelated key), never wall-clock."""
    import pandas as pd

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.stateful import (
        SESSION_GAP_MS,
        streaming_sessions_ttl,
    )

    events = load_table(spark, SF_UNIT, "events").filter("user_id < 15")
    rows = events.select("user_id", "ts", "value").collect()
    max_ms = max(int(r["ts"].timestamp() * 1000) for r in rows)

    # pure-Python oracle: per-user gap sessionization over ALL events
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp() * 1000), int(round(float(r["value"]) * 100)))
        )
    expected = set()
    for uid, evs in by_user.items():
        evs.sort()
        start = end = None
        n = cents = 0
        for t, c in evs:
            if start is None:
                start, end, n, cents = t, t, 1, c
            elif t - end > SESSION_GAP_MS:
                expected.add((uid, start, end, n, cents))
                start, end, n, cents = t, t, 1, c
            else:
                end, n, cents = max(end, t), n + 1, cents + c
        expected.add((uid, start, end, n, cents))

    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(d)
        stream = streaming_sessions_ttl(spark, d, events.schema)
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sessions_ttl")
            .start()
        )
        q.processAllAvailable()
        # batch 2: one sentinel event on an unrelated key far in the
        # future — advances the watermark past every open session's
        # timeout timestamp
        sent = pd.DataFrame(
            {
                "event_id": [10**9],
                "ts": [pd.Timestamp(max_ms + 100 * SESSION_GAP_MS, unit="ms")],
                "user_id": [10**6],
                "event_type": ["sentinel"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        spark.createDataFrame(sent, schema=events.schema).write.mode(
            "append"
        ).parquet(d)
        q.processAllAvailable()
        # batch 3: empty-ish trigger so timeouts scheduled against the
        # batch-2 watermark actually fire
        spark.createDataFrame(
            sent.assign(event_id=10**9 + 1), schema=events.schema
        ).write.mode("append").parquet(d)
        q.processAllAvailable()
        q.stop()
        out = spark.sql(
            "SELECT user_id, session_start_ms, session_end_ms, n_events,"
            " value_cents, closed_by FROM t_sessions_ttl WHERE user_id < 15"
        ).collect()

    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"], r["value_cents"]): r["closed_by"]
        for r in out
    }
    assert set(got) == expected
    # both close paths must actually occur in this data
    assert "timeout" in got.values()
    if len(expected) > len(by_user):  # some user has >1 session
        assert "gap" in got.values()
    # every user's LAST session (no later event) closes by timeout
    last = {}
    for uid, start, end, n, cents in expected:
        if uid not in last or end > last[uid][2]:
            last[uid] = (uid, start, end, n, cents)
    for key in last.values():
        assert got[key] == "timeout", key


def _count_agg(df):
    from pyspark.sql import functions as F

    return df.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))


def _merge_counts(state, new):
    from pyspark.sql import functions as F

    return (
        state.unionByName(new)
        .groupBy("user_id")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def test_streaming_cdc_merge_into_state_store(spark, tmp_path):
    """The streaming CDC upsert path (now the library op
    ``stream_upsert_sink``): readStream → foreachBatch MERGE into the
    bucketed state store. Each micro-batch merges its per-user partial
    counts; after the stream drains, the store must equal the one-shot
    batch aggregate over the whole table — i.e. incremental MERGE is
    exactly equivalent to recompute-from-scratch. A full redelivery of
    every micro-batch (fresh checkpoint, same marker) must then be a
    complete no-op — the replay-idempotence contract end-to-end."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.sources.jdbc import BucketedParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import stream_upsert_sink

    events = load_table(spark, SF_UNIT, "events").select(
        "event_id", "user_id", "event_type"
    )
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    store = BucketedParquetStateStore(
        spark, str(tmp_path / "state"), keys=["user_id"], n_buckets=8
    )

    def make_stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = stream_upsert_sink(
        make_stream(), store, _merge_counts, str(tmp_path / "ckpt"),
        batch_transform=_count_agg,
    )
    q.awaitTermination(180)
    want = {(r["user_id"], r["n"]) for r in _count_agg(events).collect()}
    got = {(r["user_id"], r["n"]) for r in store.read().collect()}
    assert got == want

    # redeliver EVERY micro-batch: a fresh checkpoint restarts batch ids
    # at 0, all ≤ the store's committed marker → every merge must skip
    q2 = stream_upsert_sink(
        make_stream(), store, _merge_counts, str(tmp_path / "ckpt2"),
        batch_transform=_count_agg,
    )
    q2.awaitTermination(180)
    got2 = {(r["user_id"], r["n"]) for r in store.read().collect()}
    assert got2 == want  # unchanged — no double-count


def test_upsert_batch_applier_is_idempotent_per_batch_id(spark, tmp_path):
    """The micro-level replay contract (VERDICT r6 item 5): the SAME
    micro-batch delivered twice under the same batch_id merges exactly
    once; the next batch_id still applies; an out-of-order stale id is
    skipped."""
    from tepsonic_database_sync_spark.sources.jdbc import BucketedParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import upsert_batch_applier

    store = BucketedParquetStateStore(
        spark, str(tmp_path / "state"), keys=["user_id"], n_buckets=4
    )
    applier = upsert_batch_applier(store, _merge_counts, _count_agg)

    b0 = spark.createDataFrame(
        [(1, 10, "view"), (2, 10, "view"), (3, 20, "view")],
        "event_id long, user_id long, event_type string",
    )
    b1 = spark.createDataFrame(
        [(4, 10, "view"), (5, 30, "view")],
        "event_id long, user_id long, event_type string",
    )
    applier(b0, 0)
    after_b0 = {(r["user_id"], r["n"]) for r in store.read().collect()}
    assert after_b0 == {(10, 2), (20, 1)}

    applier(b0, 0)  # at-least-once redelivery of the same micro-batch
    assert {(r["user_id"], r["n"]) for r in store.read().collect()} == after_b0

    applier(b1, 1)  # the next batch still applies
    assert {(r["user_id"], r["n"]) for r in store.read().collect()} == {
        (10, 3), (20, 1), (30, 1),
    }

    applier(b1, 0)  # stale id after a later commit: skipped
    assert {(r["user_id"], r["n"]) for r in store.read().collect()} == {
        (10, 3), (20, 1), (30, 1),
    }


def test_watermark_drops_late_events_in_append_mode(spark):
    """Late-data contract made explicit: in append mode a watermarked
    tumbling aggregate finalizes a window once the watermark passes its
    end, and an event arriving AFTER that (inside the already-finalized
    window) is dropped — the emitted count must exclude it, and no
    duplicate/corrected row for that window may appear later."""
    import pandas as pd

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.windows import (
        streaming_tumbling_counts,
    )

    schema = load_table(spark, SF_UNIT, "events").schema

    def mk(eid, ts_ms, etype):
        return {
            "event_id": eid,
            "ts": pd.Timestamp(ts_ms, unit="ms"),
            "user_id": 1,
            "event_type": etype,
            "value": 1.0,
            "props": "{}",
        }

    t0 = 3_600_000 * 1000  # an exact hour boundary
    batch1 = [mk(1, t0 + 60_000, "click"), mk(2, t0 + 120_000, "click")]
    # sentinel 10 hours later: watermark (2h lag) passes t0's window end
    batch2 = [mk(100, t0 + 36_000_000, "sentinel")]
    # a LATE click back inside t0's window — behind the watermark now
    batch3 = [mk(3, t0 + 180_000, "click"), mk(101, t0 + 36_060_000, "sentinel")]

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pd.DataFrame(batch1), schema=schema).write.mode(
            "append"
        ).parquet(d)
        q = (
            streaming_tumbling_counts(spark, d, schema)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_late_drop")
            .start()
        )
        q.processAllAvailable()
        for b in (batch2, batch3):
            spark.createDataFrame(pd.DataFrame(b), schema=schema).write.mode(
                "append"
            ).parquet(d)
            q.processAllAvailable()
        q.stop()
        rows = spark.sql(
            "SELECT ws, n FROM t_late_drop WHERE event_type = 'click'"
        ).collect()

    # exactly one finalized row for the t0 window, counting ONLY the two
    # on-time clicks — the late third click was dropped, not appended
    assert len(rows) == 1
    assert rows[0]["ws"] == t0 // 1000
    assert rows[0]["n"] == 2


def test_anomaly_stream_matches_batch_detector(spark, tmp_path):
    """The streaming spike detector must emit EXACTLY the batch
    detector's rows when buckets finalize chronologically: hourly
    windows close in event-time order under append-mode watermarking,
    each closes once, and the trailing context comes from the persisted
    history — including trailing buckets that finalized earlier in the
    SAME micro-batch. Sentinel events advance the watermark past the
    last real hour so every real bucket finalizes; the sentinel's own
    bucket never finalizes (nothing follows it), which is exactly the
    filter-free equivalence: emitted rows = batch rows over REAL events."""
    import pandas as pd

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.events import (
        ANOMALY_BUCKET_S,
        event_anomaly,
    )
    from tepsonic_database_sync_spark.sources.jdbc import BucketedParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import anomaly_stream

    schema = load_table(spark, SF_UNIT, "events").schema

    def mk(eid, hour, etype, n=1):
        return [
            {
                "event_id": eid * 1000 + i,
                "ts": pd.Timestamp((hour * ANOMALY_BUCKET_S + i) * 1000, unit="ms"),
                "user_id": 1,
                "event_type": etype,
                "value": 1.0,
                "props": "{}",
            }
            for i in range(n)
        ]

    # type 'x': quiet hours 0-3 (2/hour), spike at hour 4 (10 > 2×avg);
    # type 'y': ramps 1,2,4 — hour 2's 4 > 2×(1+2)/2 avg → spike
    files = [
        mk(1, 0, "x", 2) + mk(2, 0, "y", 1),
        mk(3, 1, "x", 2) + mk(4, 1, "y", 2),
        mk(5, 2, "x", 2) + mk(6, 2, "y", 4),
        mk(7, 3, "x", 2),
        mk(8, 4, "x", 10),
        mk(99, 30, "sentinel", 1),  # watermark push past hour 4 + delay
    ]
    src = str(tmp_path / "src")
    real_rows = []
    for i, rows in enumerate(files):
        spark.createDataFrame(pd.DataFrame(rows), schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        if rows[0]["event_type"] != "sentinel":
            real_rows.extend(rows)

    store = BucketedParquetStateStore(
        spark,
        str(tmp_path / "hist"),
        keys=["event_type", "bucket_es"],
        n_buckets=4,
    )
    flags_dir = str(tmp_path / "flags")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = anomaly_stream(stream, store, flags_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        tuple(r)
        for r in spark.read.parquet(flags_dir)
        .select(
            "event_type", "bucket_es", "cnt", "trailing_sum", "trailing_n",
            "is_spike",
        )
        .collect()
    }
    batch = spark.createDataFrame(pd.DataFrame(real_rows), schema)
    want = {tuple(r) for r in event_anomaly(batch).collect()}
    assert got == want
    spikes = {(t, b) for (t, b, _, _, _, s) in got if s}
    assert spikes == {("x", 4 * ANOMALY_BUCKET_S), ("y", 2 * ANOMALY_BUCKET_S)}

    # full redelivery (fresh checkpoint, same store marker): no new flag
    # rows, history unchanged — the replay contract
    n_hist = store.read().count()
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = anomaly_stream(stream2, store, flags_dir, str(tmp_path / "ckpt2"))
    q2.awaitTermination(180)
    assert {
        tuple(r)
        for r in spark.read.parquet(flags_dir)
        .select(
            "event_type", "bucket_es", "cnt", "trailing_sum", "trailing_n",
            "is_spike",
        )
        .collect()
    } == want
    assert store.read().count() == n_hist


def test_snapshot_cdc_stream_emits_pairwise_diffs_and_replays_safely(
    spark, tmp_path
):
    """Snapshot-drop CDC: a stream of FULL snapshot versions must emit
    exactly the pairwise batch diffs (v0→v1, v1→v2 — first version all
    inserts), leave the store pointing at the latest version, and
    redeliver nothing on a full replay (fresh checkpoint, same store
    marker)."""
    from tepsonic_database_sync_spark.operators.cdc import snapshot_diff
    from tepsonic_database_sync_spark.sources.jdbc import ParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import snapshot_cdc_stream

    schema = "k long, cents long, status string"
    v1 = [(1, 100, "a"), (2, 200, "b"), (3, 300, "c")]
    v2 = [(1, 100, "a"), (2, 250, "b"), (4, 400, "d")]  # upd 2, del 3, ins 4
    v3 = [(1, 100, "z"), (2, 250, "b"), (4, 400, "d")]  # upd 1
    src = str(tmp_path / "src")
    for snap in (v1, v2, v3):
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = ParquetStateStore(spark, str(tmp_path / "state"))
    changes_dir = str(tmp_path / "changes")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = snapshot_cdc_stream(
        stream, store, changes_dir, str(tmp_path / "ckpt"),
        keys=["k"], compare_cols=["cents", "status"],
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(changes_dir).collect()}
    dfs = [spark.createDataFrame(s, schema) for s in (v1, v2, v3)]
    want = set()
    prev = dfs[0].limit(0)
    for cur in dfs:
        want |= {
            tuple(r)
            for r in snapshot_diff(
                prev, cur, ["k"], ["cents", "status"]
            ).collect()
        }
        prev = cur
    assert got == want
    assert {tuple(r) for r in store.read().collect()} == set(v3)

    # full redelivery: no new change rows, store unchanged
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = snapshot_cdc_stream(
        stream2, store, changes_dir, str(tmp_path / "ckpt2"),
        keys=["k"], compare_cols=["cents", "status"],
    )
    q2.awaitTermination(180)
    assert {tuple(r) for r in spark.read.parquet(changes_dir).collect()} == want
    assert {tuple(r) for r in store.read().collect()} == set(v3)


def test_rollup_cdc_stream_maintains_the_rollup_exactly_once(spark, tmp_path):
    """The streamed incrementally-maintained rollup must equal a full
    groupBy over the latest snapshot after all batches (the maintenance
    law end-to-end), survive a full redelivery as a no-op, and recover
    exactly-once from a crash that lost the atomic commit (replay
    recomputes from the previous commit — no double-apply)."""
    import json
    import os

    from tepsonic_database_sync_spark.streaming.ops import (
        rollup_cdc_stream,
        rollup_read,
    )

    schema = "k long, status string, cents long"
    v1 = [(1, "a", 100), (2, "b", 200), (3, "a", 300)]
    v2 = [(1, "a", 100), (2, "a", 250), (4, "d", 400)]  # move 2 b→a, del 3, ins 4
    v3 = [(1, "z", 100), (2, "a", 250), (4, "d", 400)]  # move 1 a→z
    src = str(tmp_path / "src")
    for snap in (v1, v2, v3):
        spark.createDataFrame(snap, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    root = str(tmp_path / "rollup")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = rollup_cdc_stream(
        stream, spark, root, str(tmp_path / "ckpt"),
        keys=["k"], group="status", value="cents",
    )
    q.awaitTermination(180)

    def want(rows):
        agg = {}
        for _, s, c in rows:
            n, t = agg.get(s, (0, 0))
            agg[s] = (n + 1, t + c)
        return {(s, n, t) for s, (n, t) in agg.items()}

    got = {tuple(r) for r in rollup_read(spark, root).collect()}
    assert got == want(v3)

    # full redelivery (fresh checkpoint, same root): a no-op
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = rollup_cdc_stream(
        stream2, spark, root, str(tmp_path / "ckpt2"),
        keys=["k"], group="status", value="cents",
    )
    q2.awaitTermination(180)
    assert {tuple(r) for r in rollup_read(spark, root).collect()} == want(v3)

    # crash simulation: roll the commit pointer back one batch (the
    # atomic unit a crash would have lost) and replay — the refresh must
    # recompute v2→v3 from the v2 commit, not double-apply
    commit_file = os.path.join(root, "_COMMIT")
    cm = json.load(open(commit_file))
    prev = {
        "batch_id": cm["batch_id"] - 1,
        "snap": os.path.join(root, f"b{cm['batch_id'] - 1}", "snapshot"),
        "agg": os.path.join(root, f"b{cm['batch_id'] - 1}", "rollup"),
    }
    json.dump(prev, open(commit_file, "w"))
    assert {tuple(r) for r in rollup_read(spark, root).collect()} == want(v2)
    stream3 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q3 = rollup_cdc_stream(
        stream3, spark, root, str(tmp_path / "ckpt3"),
        keys=["k"], group="status", value="cents",
    )
    q3.awaitTermination(180)
    assert {tuple(r) for r in rollup_read(spark, root).collect()} == want(v3)


def test_rollup_cdc_applier_ignores_empty_batches(spark, tmp_path):
    """An empty micro-batch is indistinguishable from an idle trigger,
    so the applier must NOT treat it as a delete-all snapshot: no
    commit, rollup unchanged (the documented empty-batch semantics —
    VERDICT r7 advice item 1 resolution)."""
    import json
    import os

    from tepsonic_database_sync_spark.streaming.ops import (
        rollup_cdc_applier,
        rollup_read,
    )

    root = str(tmp_path / "rollup")
    schema = "k long, status string, cents long"
    apply_batch = rollup_cdc_applier(
        spark, root, keys=["k"], group="status", value="cents"
    )
    v1 = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "a", 300)], schema
    )
    apply_batch(v1, 0)
    want = {("a", 2, 400), ("b", 1, 200)}
    assert {tuple(r) for r in rollup_read(spark, root).collect()} == want

    apply_batch(v1.limit(0), 1)  # idle trigger / empty batch
    assert {tuple(r) for r in rollup_read(spark, root).collect()} == want
    cm = json.load(open(os.path.join(root, "_COMMIT")))
    assert cm["batch_id"] == 0  # the empty batch committed NOTHING


def test_distinct_sketch_stream_equals_batch_and_replays_by_algebra(
    spark, tmp_path
):
    """The streamed register store after all micro-batches must equal
    the one-shot batch sketch over the full feed (max-merge is exact,
    not approximate, at the register level), a full redelivery must be
    a no-op purely because the merge is idempotent (no marker file
    exists to protect it), and the estimate must land near truth."""
    from tepsonic_database_sync_spark.operators.sketches import (
        hll_estimate,
        hll_register_table,
    )
    from tepsonic_database_sync_spark.sources.jdbc import ParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import (
        distinct_sketch_stream,
    )

    schema = "uid long"
    chunks = [range(0, 4000), range(2000, 7000), range(5000, 10000)]
    src = str(tmp_path / "src")
    for ch in chunks:
        spark.createDataFrame([(i,) for i in ch], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = ParquetStateStore(spark, str(tmp_path / "hll"))
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = distinct_sketch_stream(stream, store, str(tmp_path / "ckpt"), "uid")
    q.awaitTermination(180)

    batch = hll_register_table(spark.read.parquet(src), "uid")
    want = {(r["bucket"], r["max_rho"]) for r in batch.collect()}
    assert {(r["bucket"], r["max_rho"]) for r in store.read().collect()} == want

    # estimate sanity: within 15% of the 10k true distinct (3σ at m=1024)
    est = hll_estimate(store.read())
    assert abs(est - 10000) <= 1500, est

    # full redelivery with a fresh checkpoint: state unchanged — there is
    # NO marker protocol here, idempotence is the algebra's
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = distinct_sketch_stream(stream2, store, str(tmp_path / "ckpt2"), "uid")
    q2.awaitTermination(180)
    assert {(r["bucket"], r["max_rho"]) for r in store.read().collect()} == want


def test_leaderboard_stream_equals_batch_topk_and_replays_by_algebra(
    spark, tmp_path
):
    """The streamed k-row leaderboard must equal the one-shot batch
    top-k over the full feed — including when a later batch demotes an
    earlier leader — and a full redelivery must be a no-op purely
    because max + top-k are idempotent (no marker protocol exists)."""
    from pyspark.sql import functions as FF

    from tepsonic_database_sync_spark.sources.jdbc import ParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import leaderboard_stream

    schema = "uid long, cents long"
    chunks = [
        [(1, 100), (2, 900), (3, 50)],
        [(4, 500), (1, 800), (5, 30)],   # user 1 improves
        [(6, 950), (7, 20), (2, 10)],    # new leader; low repeat ignored
    ]
    src = str(tmp_path / "src")
    for ch in chunks:
        spark.createDataFrame(ch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = ParquetStateStore(spark, str(tmp_path / "lb"))
    k = 3
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = leaderboard_stream(
        stream, store, str(tmp_path / "ckpt"), "uid", FF.col("cents"), k
    )
    q.awaitTermination(180)

    got = {(r["key"], r["best_cents"]) for r in store.read().collect()}
    assert got == {(6, 950), (2, 900), (1, 800)}

    # full redelivery, fresh checkpoint: unchanged by idempotence alone
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = leaderboard_stream(
        stream2, store, str(tmp_path / "ckpt2"), "uid", FF.col("cents"), k
    )
    q2.awaitTermination(180)
    assert {(r["key"], r["best_cents"]) for r in store.read().collect()} == got


def test_incremental_chunk_dedup_equals_batch_and_is_index_idempotent(
    spark, tmp_path
):
    """The incremental form fed in doc_id order must concatenate to the
    one-shot chunk_dedup over the union (the equivalence law), and
    replaying a batch must leave the fingerprint index unchanged while
    reassembling that batch's docs as all-dropped (first-delivery-wins,
    documented)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        chunk_dedup,
        incremental_chunk_dedup,
    )
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )

    boiler = " ".join(f"w{i}" for i in range(32))
    u = lambda tag: " ".join(f"{tag}{i}" for i in range(32))  # noqa: E731
    docs = [
        (1, u("a") + " " + boiler),
        (2, boiler + " " + u("b")),
        (3, u("c")),
        (4, u("b") + " " + boiler),  # both chunks already seen by now
    ]
    schema = "doc_id long, text string"
    all_df = spark.createDataFrame(docs, schema)
    want = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
            for r in chunk_dedup(all_df).collect()}

    store = BucketedParquetStateStore(
        spark, str(tmp_path / "fpidx"), keys=["fp"], n_buckets=8
    )
    got = {}
    for batch in (docs[:2], docs[2:]):
        out = incremental_chunk_dedup(
            spark.createDataFrame(batch, schema), store
        )
        for r in out.collect():
            got[r["doc_id"]] = (r["n_chunks"], r["n_kept"], r["kept_text"])
    assert got == want
    assert want[4] == (2, 0, "")  # everything doc 4 had was boilerplate

    # replay batch 2: the index must not change, and the replayed docs
    # reassemble as all-dropped (their chunks are already admitted)
    idx_before = {tuple(r) for r in store.read().collect()}
    replay = incremental_chunk_dedup(
        spark.createDataFrame(docs[2:], schema), store
    ).collect()
    assert {tuple(r) for r in store.read().collect()} == idx_before
    assert all(r["n_kept"] == 0 and r["kept_text"] == "" for r in replay)


def test_chunk_dedup_stream_matches_one_shot_batch(spark, tmp_path):
    """The streamed form over in-order micro-batches must reproduce the
    one-shot batch chunk_dedup, and a full redelivery (fresh checkpoint,
    same store + sink) must be a no-op via the batch-id marker."""
    from tepsonic_database_sync_spark.operators.dedup import chunk_dedup
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        chunk_dedup_stream,
    )

    boiler = " ".join(f"w{i}" for i in range(32))
    u = lambda tag: " ".join(f"{tag}{i}" for i in range(32))  # noqa: E731
    docs = [
        (1, u("a") + " " + boiler),
        (2, boiler + " " + u("b")),
        (3, u("b") + " " + u("d")),
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    for i, row in enumerate(docs):
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = BucketedParquetStateStore(
        spark, str(tmp_path / "fpidx"), keys=["fp"], n_buckets=8
    )
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = chunk_dedup_stream(stream, store, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in spark.read.parquet(out_dir + "/docs").collect()
    }
    want = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in chunk_dedup(spark.createDataFrame(docs, schema)).collect()
    }
    assert got == want

    # full redelivery with a fresh checkpoint: marker makes it a no-op
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = chunk_dedup_stream(stream2, store, out_dir, str(tmp_path / "ckpt2"))
    q2.awaitTermination(180)
    again = spark.read.parquet(out_dir + "/docs").count()
    assert again == len(docs)  # no duplicate emissions


def test_chunk_dedup_applier_replay_after_output_before_merge(
    spark, tmp_path
):
    """Crash-window 2 of the applier protocol (ADVICE r8): the first
    delivery crashed AFTER the atomic output commit but BEFORE
    ``store.merge``. The replay must leave the committed (correct)
    output untouched — NOT overwrite it with an all-dropped reassembly
    — while still admitting the batch's fingerprints into the index,
    and a further replay after that must be a full no-op."""
    import os

    from tepsonic_database_sync_spark.operators.dedup import (
        incremental_chunk_dedup_plan,
    )
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        chunk_dedup_applier,
    )

    u = lambda tag: " ".join(f"{tag}{i}" for i in range(32))  # noqa: E731
    schema = "doc_id long, text string"
    batch = spark.createDataFrame([(1, u("a")), (2, u("b"))], schema)
    store = BucketedParquetStateStore(
        spark, str(tmp_path / "fpidx"), keys=["fp"], n_buckets=8
    )
    out_dir = str(tmp_path / "out")

    # stage exactly what the applier's step 1 commits, then "crash"
    _fresh, out = incremental_chunk_dedup_plan(batch, store)
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "docs", "batch_id=0")
    )
    read_out = lambda: {  # noqa: E731
        (r["doc_id"], r["n_kept"], r["kept_text"])
        for r in spark.read.parquet(out_dir + "/docs").collect()
    }
    before = read_out()
    assert all(n_kept > 0 for _, n_kept, _ in before)
    assert store.read() is None  # the merge never ran

    # replay the batch through the real applier
    chunk_dedup_applier(store, out_dir)(batch, 0)
    assert read_out() == before  # committed output untouched
    assert store.read().count() > 0  # index caught up

    # fully done now: a marker-guarded second replay is a no-op
    idx = {tuple(r) for r in store.read().collect()}
    chunk_dedup_applier(store, out_dir)(batch, 0)
    assert read_out() == before
    assert {tuple(r) for r in store.read().collect()} == idx


def _wfs_docs():
    """Funnel event fixture with the boundary cases pinned: u1 converts
    exactly AT the inclusive horizon boundary; u2 stalls at stage 2; u3
    has a second anchor that outperforms its first; u4 has no anchor
    (must be absent); u5's purchase precedes its view (order matters)."""
    H = 72 * 3600
    return [
        (1, "signup", 0), (1, "view", 10), (1, "purchase", H),  # == t0+H
        (2, "signup", 50), (2, "view", 60), (2, "click", 70),
        (3, "signup", 0), (3, "view", H + 100),  # outside anchor 1
        (3, "signup", H), (3, "purchase", H + 200),  # anchor 2: 3 steps
        (4, "view", 5), (4, "purchase", 6),
        (5, "signup", 100), (5, "purchase", 150), (5, "view", 200),
    ]


def _wfs_run(spark, tmp_path, order, tag):
    """Feed the fixture one event-file per micro-batch in the given
    order; return the stream's final per-user steps."""
    import datetime as dt

    from tepsonic_database_sync_spark.streaming.ops import (
        window_funnel_stream,
    )

    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    schema = "user_id long, event_type string, ts timestamp"
    src = str(tmp_path / f"src_{tag}")
    for u, t, s in order:
        spark.createDataFrame(
            [(u, t, base + dt.timedelta(seconds=s))], schema
        ).coalesce(1).write.mode("append").parquet(src)
    out_dir = str(tmp_path / f"out_{tag}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = window_funnel_stream(
        stream, out_dir, str(tmp_path / f"ckpt_{tag}"),
        lateness="9999 hours",
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["batch_id"] > last[r["user_id"]][1]:
            last[r["user_id"]] = (r["steps"], r["batch_id"])
    return {u: s for u, (s, _) in last.items()}


def test_window_funnel_stream_matches_batch_in_order_and_shuffled(
    spark, tmp_path
):
    """The streaming funnel's final emission must equal the batch
    window_funnel over the same events — under in-event-time-order
    delivery AND under an adversarially shuffled delivery (state holds
    the undecided horizon, so this is NOT an in-order-only law)."""
    import datetime as dt

    from tepsonic_database_sync_spark.operators.events import window_funnel

    docs = _wfs_docs()
    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    batch_df = spark.createDataFrame(
        [(u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in docs],
        "user_id long, event_type string, ts timestamp",
    )
    want = {r["user_id"]: r["steps"] for r in window_funnel(batch_df).collect()}
    assert want == {1: 3, 2: 2, 3: 3, 5: 2}  # fixture sanity, incl. u4 absent

    got_ordered = _wfs_run(
        spark, tmp_path, sorted(docs, key=lambda r: r[2]), "ord"
    )
    assert got_ordered == want

    shuffled = [docs[i] for i in (14, 2, 8, 11, 0, 13, 5, 9, 1, 7, 4, 12, 3, 10, 6)]
    got_shuffled = _wfs_run(spark, tmp_path, shuffled, "shuf")
    assert got_shuffled == want


def test_window_funnel_stream_prunes_state_behind_watermark(spark, tmp_path):
    """The state-bound contract: with a small lateness, anchors whose
    window closed behind the watermark fold into the scalar and their
    events leave state — the final answer is still exact for in-order
    delivery, which is precisely what the watermark promises."""
    import datetime as dt

    from tepsonic_database_sync_spark.operators.events import (
        funnel_steps_inmem,
        window_funnel,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        window_funnel_stream,
    )

    H = 72 * 3600
    docs = [
        (1, "signup", 0), (1, "view", 10), (1, "purchase", 20),
        # far-future second anchor, > H + lateness past the first
        (1, "signup", 10 * H), (1, "view", 10 * H + 5),
    ]
    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    schema = "user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src_prune")
    for u, t, s in docs:
        spark.createDataFrame(
            [(u, t, base + dt.timedelta(seconds=s))], schema
        ).coalesce(1).write.mode("append").parquet(src)
    out_dir = str(tmp_path / "out_prune")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = window_funnel_stream(
        stream, out_dir, str(tmp_path / "ckpt_prune"), lateness="1 hour"
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    best_by_batch = sorted((r["batch_id"], r["steps"]) for r in rows)
    assert best_by_batch[-1][1] == 3  # the folded first-anchor result wins
    batch_df = spark.createDataFrame(
        [(u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in docs],
        schema,
    )
    want = {r["user_id"]: r["steps"] for r in window_funnel(batch_df).collect()}
    assert want == {1: 3}
    # and the kernel's finalization arithmetic is itself consistent
    evs = {(0, 0), (1, 10), (2, 20)}
    assert funnel_steps_inmem(evs, 3, H, final_before=H + 21) == (3, 3)
    assert funnel_steps_inmem(evs, 3, H, final_before=H) == (3, 0)


def test_window_funnel_stream_resumes_from_checkpoint(spark, tmp_path):
    """Durability: stop after the first half of the feed, then start a
    NEW query with the SAME checkpoint over the grown source — the
    applyInPandasWithState state must survive the restart, so the
    second run only processes the remainder and the final per-user
    answer still equals the batch op over everything."""
    import datetime as dt

    from tepsonic_database_sync_spark.operators.events import window_funnel
    from tepsonic_database_sync_spark.streaming.ops import (
        window_funnel_stream,
    )

    docs = _wfs_docs()
    half = len(docs) // 2
    utc = dt.timezone.utc
    base = dt.datetime(2024, 1, 1, tzinfo=utc)
    schema = "user_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src_resume")
    out_dir = str(tmp_path / "out_resume")
    ckpt = str(tmp_path / "ckpt_resume")
    ordered = sorted(docs, key=lambda r: r[2])

    def feed(rows):
        for u, t, s in rows:
            spark.createDataFrame(
                [(u, t, base + dt.timedelta(seconds=s))], schema
            ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = window_funnel_stream(
            stream, out_dir, ckpt, lateness="9999 hours"
        )
        q.awaitTermination(300)

    feed(ordered[:half])
    run()
    feed(ordered[half:])
    run()  # same checkpoint: resumes, does not reprocess the first half

    rows = spark.read.parquet(out_dir).collect()
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["batch_id"] > last[r["user_id"]][1]:
            last[r["user_id"]] = (r["steps"], r["batch_id"])
    got = {u: s for u, (s, _) in last.items()}
    batch_df = spark.createDataFrame(
        [(u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in docs],
        schema,
    )
    want = {r["user_id"]: r["steps"] for r in window_funnel(batch_df).collect()}
    assert got == want
    # the resumed run started numbering where the first left off — proof
    # the first half was not re-read (no batch_id collision/reset)
    n_batches = {r["batch_id"] for r in rows}
    assert max(n_batches) >= half  # second run extended, not restarted


# --- commit-protocol crash/replay properties (VERDICT r9 item 5) -----------
#
# The appliers' docstrings state the law: a crash at ANY window boundary
# of the commit protocol, followed by Structured Streaming's redelivery
# of the same (batch_df, batch_id), converges to the one-shot result.
# The deterministic tests above pin one window each; these properties
# drive RANDOM snapshot/batch sequences with a RANDOM crash plan — one
# injected fault per batch drawn from every boundary the protocol has —
# and assert the law after every batch, not just at the end.


class _SimCrash(Exception):
    """Injected fault standing in for a process kill."""


class _CrashReplace:
    """Monkeypatch ``os.replace`` to raise on a destination whose
    basename matches, simulating a kill exactly BEFORE that atomic
    rename (the state the protocol must recover from)."""

    def __init__(self, basename_prefix: str):
        self.prefix = basename_prefix

    def __enter__(self):
        import os

        self._real = os.replace

        def patched(src, dst, *a, **kw):
            if os.path.basename(str(dst)).startswith(self.prefix):
                raise _SimCrash(dst)
            return self._real(src, dst, *a, **kw)

        os.replace = patched
        return self

    def __exit__(self, *exc):
        import os

        os.replace = self._real
        return False


def _rollup_want(rows):
    agg = {}
    for _, s, c in rows:
        n, t = agg.get(s, (0, 0))
        agg[s] = (n + 1, t + c)
    return {(s, n, t) for s, (n, t) in agg.items()}


import pytest  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# snapshot version: small key/group alphabets maximize insert/update/
# delete collisions between consecutive versions; values small longs.
# Keys unique within a version (a snapshot is keyed).
_snap_version = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)

# one crash decision per batch, drawn from every boundary the rollup
# protocol has: no fault; kill before the _COMMIT rename (work written,
# commit lost); duplicate delivery after success (at-least-once source).
_rollup_crash = st.sampled_from(["none", "pre_commit", "double"])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    versions=st.lists(_snap_version, min_size=1, max_size=4),
    crashes=st.lists(_rollup_crash, min_size=4, max_size=4),
)
def test_rollup_cdc_commit_protocol_crash_replay_property(
    spark, versions, crashes
):
    """After any prefix of batches — each possibly killed before its
    atomic commit and redelivered, or delivered twice — the committed
    rollup equals a full groupBy over the latest NON-EMPTY snapshot
    version (empty batches are idle triggers and commit nothing)."""
    import shutil
    import tempfile

    from tepsonic_database_sync_spark.streaming.ops import (
        rollup_cdc_applier,
        rollup_read,
    )

    schema = "k long, status string, cents long"
    root = tempfile.mkdtemp(prefix="rollup_prop_")
    try:
        mk = lambda: rollup_cdc_applier(  # noqa: E731
            spark, root, keys=["k"], group="status", value="cents"
        )
        apply_batch = mk()
        last_nonempty = None
        for batch_id, snap in enumerate(versions):
            df = spark.createDataFrame(snap, schema) if snap else (
                spark.createDataFrame([], schema)
            )
            mode = crashes[batch_id]
            if mode == "pre_commit" and snap:
                with _CrashReplace("_COMMIT"):
                    with pytest.raises(_SimCrash):
                        apply_batch(df, batch_id)
                # restart: a fresh applier instance redelivers the batch
                apply_batch = mk()
            apply_batch(df, batch_id)
            if mode == "double":
                apply_batch(df, batch_id)
            if snap:
                last_nonempty = snap
            got = rollup_read(spark, root)
            if last_nonempty is None:
                assert got is None
            else:
                assert {tuple(r) for r in got.collect()} == _rollup_want(
                    last_nonempty
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _block_text(bid: int) -> str:
    """One exact dedup chunk (CHUNK_DEDUP_TOKENS tokens) derived from a
    block id — duplicate block ids across docs/batches are duplicate
    chunks by construction."""
    from tepsonic_database_sync_spark.operators.dedup import (
        CHUNK_DEDUP_TOKENS,
    )

    return " ".join(f"b{bid}w{i}" for i in range(CHUNK_DEDUP_TOKENS))


# a document = 1-3 chunk blocks drawn from a 4-symbol alphabet (dense
# cross-batch duplication); batches of 1-2 docs; 1-3 batches.
_doc_blocks = st.lists(
    st.integers(min_value=0, max_value=3), min_size=1, max_size=3
)
_chunk_batches = st.lists(
    st.lists(_doc_blocks, min_size=1, max_size=2), min_size=1, max_size=3
)

# every boundary of the three-step chunk protocol: kill before the
# output-dir rename (step 1), after output but before the index merge
# (step 2), before the _BATCHES marker rename (step 3), duplicate
# delivery after success, or no fault.
_chunk_crash = st.sampled_from(
    ["none", "pre_output", "post_output_pre_merge", "pre_marker", "double"]
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_chunk_batches, crashes=st.lists(_chunk_crash, min_size=3, max_size=3))
def test_chunk_dedup_commit_protocol_crash_replay_property(
    spark, batches, crashes
):
    """Random batch sequences through the chunk-dedup applier with one
    injected fault per batch at a random protocol boundary: after all
    redeliveries the committed per-batch outputs equal the ONE-SHOT
    ``chunk_dedup`` over the concatenated corpus, and the fingerprint
    store admits each chunk exactly once (min-merge idempotence)."""
    import shutil
    import tempfile

    from tepsonic_database_sync_spark.operators.dedup import chunk_dedup
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        chunk_dedup_applier,
    )

    schema = "doc_id long, text string"
    work = tempfile.mkdtemp(prefix="chunk_prop_")
    try:
        store = BucketedParquetStateStore(
            spark, work + "/fpidx", keys=["fp"], n_buckets=4
        )
        out_dir = work + "/out"
        mk = lambda: chunk_dedup_applier(store, out_dir)  # noqa: E731
        apply_batch = mk()
        all_docs, next_id = [], 1
        for batch_id, docs_blocks in enumerate(batches):
            rows = []
            for blocks in docs_blocks:
                rows.append(
                    (next_id, " ".join(_block_text(b) for b in blocks))
                )
                next_id += 1
            all_docs.extend(rows)
            df = spark.createDataFrame(rows, schema)
            mode = crashes[batch_id]
            if mode == "pre_output":
                with _CrashReplace(f"batch_id={batch_id}"):
                    with pytest.raises(_SimCrash):
                        apply_batch(df, batch_id)
                apply_batch = mk()
            elif mode == "post_output_pre_merge":
                real_merge = store.merge

                def crashing_merge(*a, **kw):
                    raise _SimCrash("merge")

                store.merge = crashing_merge
                try:
                    with pytest.raises(_SimCrash):
                        apply_batch(df, batch_id)
                finally:
                    store.merge = real_merge
                apply_batch = mk()
            elif mode == "pre_marker":
                with _CrashReplace("_BATCHES"):
                    with pytest.raises(_SimCrash):
                        apply_batch(df, batch_id)
                apply_batch = mk()
            apply_batch(df, batch_id)
            if mode == "double":
                apply_batch(df, batch_id)

        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
            for r in spark.read.parquet(out_dir + "/docs").collect()
        }
        want = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
            for r in chunk_dedup(
                spark.createDataFrame(all_docs, schema)
            ).collect()
        }
        assert got == want
        # exactly-once admission: every distinct chunk fingerprint in
        # the store exactly once
        idx = store.read()
        assert idx.count() == idx.select("fp").distinct().count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


_mg_batches = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=12),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=_mg_batches,
    crashes=st.lists(
        st.sampled_from(["none", "pre_commit", "double"]), min_size=4, max_size=4
    ),
)
def test_mg_topk_commit_protocol_crash_replay_property(spark, batches, crashes):
    """The streaming Misra-Gries summary under injected faults: (a) a
    crashed-and-redelivered or doubly-delivered batch sequence commits
    the EXACT state of the clean run (sum-merge is not idempotent — the
    pointer-swap protocol is what makes this hold); (b) the committed
    summary obeys the mergeable-summaries bound est ≤ true and
    (true − est)·(capacity+1) ≤ N − S for every key, with every key
    above the bound retained (Agarwal et al., PODS 2012)."""
    import shutil
    import tempfile
    from collections import Counter

    from tepsonic_database_sync_spark.streaming.ops import (
        mg_read,
        mg_topk_applier,
    )

    cap = 3
    schema = "k string"
    work = tempfile.mkdtemp(prefix="mg_prop_")
    try:
        roots = {"faulty": work + "/a", "clean": work + "/b"}
        for mode_name, root in roots.items():
            mk = lambda: mg_topk_applier(spark, root, "k", cap)  # noqa: E731
            apply_batch = mk()
            for batch_id, keys in enumerate(batches):
                df = spark.createDataFrame([(x,) for x in keys], schema)
                mode = crashes[batch_id] if mode_name == "faulty" else "none"
                if mode == "pre_commit" and keys:
                    with _CrashReplace("_COMMIT"):
                        with pytest.raises(_SimCrash):
                            apply_batch(df, batch_id)
                    apply_batch = mk()
                apply_batch(df, batch_id)
                if mode == "double":
                    apply_batch(df, batch_id)

        def final(root):
            got = mg_read(spark, root)
            return {} if got is None else {
                r["k"]: r["est_cnt"] for r in got.collect()
            }

        faulty, clean = final(roots["faulty"]), final(roots["clean"])
        assert faulty == clean  # exactly-once despite the fault plan

        true = Counter(x for keys in batches for x in keys)
        n, s = sum(true.values()), sum(clean.values())
        assert len(clean) <= cap
        for key, t in true.items():
            est = clean.get(key, 0)
            assert est <= t
            assert (t - est) * (cap + 1) <= n - s
        for key, est in clean.items():
            assert key in true and est > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mg_topk_stream_end_to_end(spark, tmp_path):
    """mg_topk_stream over a file-per-trigger feed equals driving the
    applier with the same batch partition by hand, and a full
    redelivery with a fresh checkpoint is a no-op (batch_id guard)."""
    from tepsonic_database_sync_spark.streaming.ops import (
        mg_read,
        mg_topk_applier,
        mg_topk_stream,
    )

    schema = "k string"
    feeds = [list("aab"), list("abbbc"), list("ccccd")]
    src = str(tmp_path / "src")
    for keys in feeds:
        spark.createDataFrame([(x,) for x in keys], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    root = str(tmp_path / "mg")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = mg_topk_stream(stream, spark, root, str(tmp_path / "ckpt"), "k", capacity=3)
    q.awaitTermination(180)
    got = {r["k"]: r["est_cnt"] for r in mg_read(spark, root).collect()}

    ref_root = str(tmp_path / "ref")
    apply_batch = mg_topk_applier(spark, ref_root, "k", 3)
    # NOTE: file order == ingestion order under availableNow + one file
    # per trigger; the reference replays the identical batching
    for i, keys in enumerate(feeds):
        apply_batch(spark.createDataFrame([(x,) for x in keys], schema), i)
    want = {r["k"]: r["est_cnt"] for r in mg_read(spark, ref_root).collect()}
    assert got == want and len(got) <= 3

    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = mg_topk_stream(stream2, spark, root, str(tmp_path / "ckpt2"), "k", capacity=3)
    q2.awaitTermination(180)
    assert {r["k"]: r["est_cnt"] for r in mg_read(spark, root).collect()} == got


def test_kmv_stream_equals_batch_bottom_k_and_replays_by_algebra(
    spark, tmp_path
):
    """The streamed KMV store after all micro-batches must equal the
    one-shot batch bottom-k over the full feed EXACTLY (bottom-k union
    is exact at the hash level, unlike the estimate it feeds), and a
    full redelivery with a fresh checkpoint must be a no-op purely
    because the merge is idempotent — no marker protocol exists (the
    HLL contrast to Misra-Gries' marker-protected sum)."""
    from pyspark.sql import functions as FF

    from tepsonic_database_sync_spark.operators.sketches import kmv_summary
    from tepsonic_database_sync_spark.sources.jdbc import ParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import kmv_distinct_stream

    schema = "uid long"
    chunks = [range(0, 400), range(200, 700), range(500, 1000)]
    src = str(tmp_path / "src")
    for ch in chunks:
        spark.createDataFrame([(i,) for i in ch], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = ParquetStateStore(spark, str(tmp_path / "kmv"))
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = kmv_distinct_stream(stream, store, str(tmp_path / "ckpt"), "uid", k=16)
    q.awaitTermination(180)

    batch = kmv_summary(
        spark.read.parquet(src).select(FF.lit(0).alias("__s"), "uid"),
        "__s",
        "uid",
        k=16,
    ).collect()
    want = set(batch[0]["kmv"])
    assert len(want) == 16  # 1000 distinct uids >> k: estimator regime
    assert {r["h"] for r in store.read().collect()} == want

    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = kmv_distinct_stream(stream2, store, str(tmp_path / "ckpt2"), "uid", k=16)
    q2.awaitTermination(180)
    assert {r["h"] for r in store.read().collect()} == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    ),
    replay_at=st.integers(min_value=0, max_value=3),
)
def test_kmv_applier_batching_and_replay_invariance(
    spark, tmp_path_factory, batches, replay_at
):
    """For ANY partition of the feed into micro-batches, and ANY single
    batch double-delivered, the applier's final state equals the
    one-shot bottom-k of the union — the associativity/commutativity/
    idempotence claim the CRDT design rests on, checked directly at the
    applier level (no stream machinery)."""
    from pyspark.sql import functions as FF

    from tepsonic_database_sync_spark.operators.sketches import kmv_summary
    from tepsonic_database_sync_spark.sources.jdbc import ParquetStateStore
    from tepsonic_database_sync_spark.streaming.ops import kmv_merge_applier

    store = ParquetStateStore(
        spark, str(tmp_path_factory.mktemp("kmvprop") / "state")
    )
    apply_batch = kmv_merge_applier(store, "uid", k=4)
    bid = 0
    for i, ch in enumerate(batches):
        df = spark.createDataFrame([(v,) for v in ch], "uid long")
        apply_batch(df, bid)
        bid += 1
        if i == replay_at % len(batches):  # double delivery
            apply_batch(df, bid)
            bid += 1

    allv = [v for ch in batches for v in ch]
    want = kmv_summary(
        spark.createDataFrame([(v,) for v in allv], "uid long").select(
            FF.lit(0).alias("__s"), "uid"
        ),
        "__s",
        "uid",
        k=4,
    ).collect()
    assert {r["h"] for r in store.read().collect()} == set(want[0]["kmv"])


def test_substring_dedup_stream_equals_one_shot_and_redelivers_once(
    spark, tmp_path
):
    """Continuous ExactSubstr removal: doc_id-ordered file micro-batches
    through substring_dedup_stream reproduce the one-shot
    substring_dedup over the union (the ordered-arrival law), and a
    second availableNow pass over the same source with the SAME
    checkpoint emits nothing new (exactly-once per batch_id via the
    shared commit protocol)."""
    from tepsonic_database_sync_spark.operators.dedup import substring_dedup
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        substring_dedup_stream,
    )

    docs = [
        (1, "a b c d e"),
        (2, "x a b c y"),
        (3, "a b c"),
        (4, "p q r s"),
        (5, "p q r s t"),
        (6, "u v w"),
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        spark.createDataFrame(docs[lo:hi], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    store = BucketedParquetStateStore(
        spark, str(tmp_path / "grams"), keys=["fp"], n_buckets=4
    )
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    # n=8 default is longer than every test doc; the operator default
    # n is exercised in batch tests — here use n=3 via a partial applier
    from tepsonic_database_sync_spark.streaming.ops import (
        _plan_output_merge_applier,
    )
    from tepsonic_database_sync_spark.operators.dedup import (
        _gram_index_merge,
        incremental_substring_dedup_plan,
    )

    applier = _plan_output_merge_applier(
        lambda b, st: incremental_substring_dedup_plan(b, st, n=3),
        _gram_index_merge,
        store,
        out_dir,
    )
    q = (
        stream.writeStream.foreachBatch(applier)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["n_tokens"], r["removed_tokens"], r["kept_tokens"],
         r["kept_text"])
        for r in spark.read.parquet(out_dir + "/docs").drop("batch_id").collect()
    }
    want = {
        tuple(r)
        for r in substring_dedup(
            spark.createDataFrame(docs, schema), n=3
        ).collect()
    }
    assert got == want

    # same checkpoint, second pass: no new batches, output unchanged
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = (
        stream2.writeStream.foreachBatch(applier)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got2 = {
        (r["doc_id"], r["n_tokens"], r["removed_tokens"], r["kept_tokens"],
         r["kept_text"])
        for r in spark.read.parquet(out_dir + "/docs").drop("batch_id").collect()
    }
    assert got2 == want


def test_snapshot_merge_stream_equals_batch_and_replays_safely(
    spark, tmp_path
):
    """The snapshot family's streaming member: captures delivered as
    micro-batches (one file per trigger) MERGE version partials into
    the bucketed (url, fp) store; after the drain,
    snapshot_winners(store) must equal the one-shot batch
    snapshot_dedup over every capture, and a full redelivery (fresh
    checkpoint, same marker) must change nothing."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import (
        snapshot_dedup,
        snapshot_winners,
    )
    from tepsonic_database_sync_spark.sources.jdbc import (
        BucketedParquetStateStore,
    )
    from tepsonic_database_sync_spark.streaming.ops import (
        snapshot_merge_stream,
    )
    from pyspark.sql import functions as F

    d = (
        load_table(spark, SF_UNIT, "documents")
        .select("doc_id", "text")
        .limit(60)
    )
    rev = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" rev one"))
    ).otherwise(F.col("text"))
    snaps = [
        d.select(
            F.col("doc_id").alias("url"),
            F.lit(0).cast("long").alias("snapshot_id"),
            "text",
        ),
        d.select(
            F.col("doc_id").alias("url"),
            F.lit(1).cast("long").alias("snapshot_id"),
            rev.alias("text"),
        ),
    ]
    src = str(tmp_path / "src")
    # one parquet file per snapshot → maxFilesPerTrigger=1 delivers each
    # crawl as its own micro-batch, in order
    for i, s in enumerate(snaps):
        s.coalesce(1).write.mode("append").parquet(src)
    all_caps = snaps[0].unionByName(snaps[1])
    store = BucketedParquetStateStore(
        spark, str(tmp_path / "state"), keys=["url", "fp"], n_buckets=8
    )

    def make_stream():
        return (
            spark.readStream.schema(all_caps.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = snapshot_merge_stream(make_stream(), store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    want = sorted(map(tuple, snapshot_dedup(all_caps).collect()))
    got = sorted(map(tuple, snapshot_winners(store.read()).collect()))
    assert got == want

    # full redelivery: fresh checkpoint restarts batch ids at 0, all
    # ≤ the committed marker → every merge must skip
    q2 = snapshot_merge_stream(make_stream(), store, str(tmp_path / "ckpt2"))
    q2.awaitTermination(180)
    got2 = sorted(map(tuple, snapshot_winners(store.read()).collect()))
    assert got2 == want

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
- **Stream-stream join** (r6): watermarked inner self-join of the event
  stream — purchases attributed to the same user's views within a bounded
  look-back window. Watermarks on BOTH sides plus the event-time range
  condition are what bound the join state: Spark retains a view row only
  until ``watermark - ATTRIBUTION_WINDOW_S`` passes its timestamp, so
  state is O(events within horizon), never O(stream length).

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


# Attribution horizon: a purchase joins the same user's views at most this
# many seconds before it. Shared with the registry oracle SQL.
ATTRIBUTION_WINDOW_S = 86400


def _attribution(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """Shared core of the batch analog and the streaming form: inner join
    each purchase to the same user's views within the look-back window.
    Equi-join on user_id (one key shuffle per side) with the time range as
    a residual predicate — never a cross join."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("purchase_cents"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    cond = (
        (p.user_id == v.v_user_id)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts >= p.p_ts - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS"))
    )
    return p.join(v, cond, "inner").select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
        .cast("long")
        .alias("lag_sec"),
        "purchase_cents",
    )


def attribute_purchases_batch(events: DataFrame) -> DataFrame:
    """Batch analog of the stream-stream attribution join (what the DuckDB
    oracle checks)."""
    return _attribution(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
    )


def _conversion(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Shared core of the left-outer conversion join: every view, paired
    with the same user's purchases in the FORWARD window — or NULLs if
    none came (the unconverted-view row conversion funnels need). Same
    equi-join-plus-range shape as ``_attribution``."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (v.user_id == p.p_user_id)
        & (p.p_ts >= v.v_ts)
        & (p.p_ts <= v.v_ts + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS"))
    )
    return v.join(p, cond, "left_outer").select(
        "view_id",
        "user_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
        .cast("long")
        .alias("lag_sec"),
        F.col("purchase_id").isNotNull().alias("converted"),
    )


def conversion_batch(events: DataFrame) -> DataFrame:
    """Batch analog of the left-outer stream-stream conversion join."""
    return _conversion(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )


def conversion_stream(
    spark: SparkSession, events_dir: str, schema, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: LEFT-OUTER watermarked stream-stream join — the
    semantics the inner join can't express: an unconverted view is emitted
    with NULL purchase columns, but only once the watermark passes
    ``v_ts + window`` (before that a matching purchase could still
    arrive, so the row is provably incomplete). Same bounded-state story
    as the inner join; the null-extended rows ride the state EVICTION
    path, which is why tests must feed a trailing batch after the
    watermark advances — eviction output materializes on the next
    micro-batch.

    Operational gotcha (pinned in tests): the GLOBAL watermark is the MIN
    across both branches' watermark nodes, so a quiet purchase stream
    stalls null-emission for the whole join — at scale, keep heartbeat
    events flowing on BOTH sides (or set
    ``spark.sql.streaming.multipleWatermarkPolicy=max`` and accept the
    completeness trade-off)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    views = stream.filter(F.col("event_type") == "view").withWatermark(
        "ts", watermark
    )
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    return _conversion(views, purchases)


def attribute_purchases_stream(
    spark: SparkSession, events_dir: str, schema, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: watermarked stream-stream inner self-join. Both
    sides carry an event-time watermark and the join condition bounds
    ``v_ts`` to ``[p_ts - window, p_ts]``, which is exactly what lets
    Spark evict state: a buffered view is dropped once the watermark
    passes ``v_ts + window`` (no purchase can ever claim it again), and a
    buffered purchase once the watermark passes ``p_ts``. State is
    therefore bounded by the event rate × (watermark + window) horizon —
    the property that lets this run forever at 100 TB/day."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    views = stream.filter(F.col("event_type") == "view").withWatermark(
        "ts", watermark
    )
    return _attribution(purchases, views)


def upsert_batch_applier(store, merge_fn, batch_transform=None):
    """The foreachBatch callable behind ``stream_upsert_sink``, exposed so
    the replay contract is directly testable: ``applier(df, batch_id)``
    merges the (optionally transformed) micro-batch into ``store`` via
    ``store.merge(payload, merge_fn)`` — EXACTLY ONCE per batch_id.

    foreachBatch is at-least-once: a crashed/restarted query redelivers
    the last uncommitted micro-batch with the SAME batch_id, and a
    non-idempotent ``merge_fn`` (e.g. summing partial counts) would
    double-apply it. The applier records the highest committed batch_id
    in ``<store.root>/_LAST_BATCH`` (atomic ``os.replace``) only AFTER
    the merge commits, and skips any batch whose id is ≤ the marker.
    Residual window, stated honestly: a crash BETWEEN the partition
    overwrite and the marker write re-merges that one batch on restart —
    the irreducible residue of any two-step non-transactional sink; on a
    lakehouse table the marker rides the same commit (txnAppId/
    txnVersion) and the window closes."""
    import os

    marker = os.path.join(store.root, "_LAST_BATCH")

    def _last_committed() -> int:
        try:
            with open(marker) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_committed():
            return  # replayed micro-batch: already merged
        payload = batch_transform(batch_df) if batch_transform else batch_df
        store.merge(payload, merge_fn)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    return apply_batch


def stream_upsert_sink(
    stream: DataFrame,
    store,
    merge_fn,
    checkpoint_dir: str,
    batch_transform=None,
    available_now: bool = True,
):
    """Streaming CDC upsert: readStream → foreachBatch MERGE into a
    (bucketed) parquet state store — the sink a real user wires first
    (VERDICT r6 item 5; previously lived only inside a test). Each
    micro-batch's per-key partials merge into the store, so after the
    stream drains the store equals the one-shot batch aggregate; replay
    of an already-committed micro-batch is a no-op (see
    ``upsert_batch_applier`` for the exactly-once-per-batch_id contract).

    ``batch_transform`` maps the raw micro-batch to the merge payload
    (e.g. a groupBy partial aggregate); ``merge_fn(state, new)`` combines
    it with existing state (pass ``operators.options.merge_options`` for
    the reference semantics). Returns the started ``StreamingQuery``.

    At scale: the store prunes untouched buckets, so a quiet stream pays
    O(touched buckets) per trigger, and state-store merge cost is
    independent of total state size."""
    writer = (
        stream.writeStream.foreachBatch(
            upsert_batch_applier(store, merge_fn, batch_transform)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_merge_stream(
    captures_stream: DataFrame,
    store,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming twin of cross-snapshot URL dedup (the third member of
    the family: ``snapshot_dedup`` batch → ``snapshot_dedup_incremental``
    store-merge → this): crawl captures arrive as a stream, each
    micro-batch rolls up to (url, fp) version partials
    (``snapshot_versions``) and MERGEs into the bucketed store with the
    SAME combine the incremental form uses (``snapshot_store_merge`` —
    support sums, first/last_seen min/max are mergeable in any order),
    exactly once per batch_id via ``upsert_batch_applier``'s marker
    protocol. After the stream drains,
    ``snapshot_winners(store.read())`` equals the one-shot batch
    reduction over every capture — the fold law the hypothesis property
    pins for arbitrary splits, here end-to-end through a real
    readStream → foreachBatch → parquet-store path.

    At scale the store prunes untouched (url, fp) buckets, so a crawl
    batch costs O(touched buckets), never O(all URLs ever seen)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        snapshot_store_merge,
        snapshot_versions,
    )

    return stream_upsert_sink(
        captures_stream,
        store,
        snapshot_store_merge,
        checkpoint_dir,
        batch_transform=snapshot_versions,
        available_now=available_now,
    )


def anomaly_batch_applier(store, flags_dir: str):
    """foreachBatch callable behind ``anomaly_stream``: for each
    micro-batch of FINALIZED hourly buckets, flag spikes against the
    persisted bucket history, append the flags, and admit the new
    buckets into the history — exactly once per batch_id (same marker
    protocol as ``upsert_batch_applier``; a replayed micro-batch neither
    re-flags nor double-counts). Same residual window as the upsert
    applier, stated honestly: a crash between the flags append and the
    marker write re-emits that one batch's flag rows on restart — on a
    transactional sink the flags and the marker ride one commit.

    Flags are computed over (history ∪ batch) restricted to the batch's
    buckets, so multiple buckets finalizing in one trigger still see
    each other as trailing context — bit-identical to the batch detector
    when buckets finalize in event-time order (which append-mode
    watermarking guarantees)."""
    import os

    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.events import (
        trailing_spike_flags,
    )

    marker = os.path.join(store.root, "_LAST_BATCH")

    def _last_committed() -> int:
        try:
            with open(marker) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # ONE collect processes the stateful batch plan exactly once —
        # BEFORE the replay check, because Spark 4's commit validation
        # requires every micro-batch of a STATEFUL query to be fully
        # processed even when the sink then skips it (persist/
        # localCheckpoint re-wrappings break its commit tracking). The
        # rows are bounded metadata, not data: one row per (event_type,
        # hourly bucket) that FINALIZED this trigger, i.e. ≤ |types| ×
        # hours-elapsed-since-last-trigger.
        rows = batch_df.collect()
        if batch_id <= _last_committed():
            return  # replayed micro-batch: processed, not re-applied
        if not rows:
            return
        batch = batch_df.sparkSession.createDataFrame(rows, batch_df.schema)
        hist = store.read()
        combined = batch if hist is None else batch.unionByName(hist)
        flags = trailing_spike_flags(combined).join(
            batch.select("event_type", "bucket_es"),
            ["event_type", "bucket_es"],
            "left_semi",
        )
        flags.write.mode("append").parquet(flags_dir)
        store.merge(
            batch,
            lambda state, new: state.unionByName(new)
            .groupBy("event_type", "bucket_es")
            .agg(F.sum("cnt").cast("long").alias("cnt")),
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    return apply_batch


def anomaly_stream(
    events_stream: DataFrame,
    store,
    flags_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming spike detection — the incremental twin of
    ``operators.events.event_anomaly``: a watermarked hourly window
    aggregate finalizes (event_type, bucket_es, cnt) rows in append mode,
    and ``anomaly_batch_applier`` flags each finalized bucket against the
    trailing 24 h of history (persisted in a bucketed state store — the
    stream's ONLY state beyond the one in-flight window, so a detector
    that runs forever holds 24 rows per event type, not the event log).

    Emits to ``flags_dir`` the same schema as the batch detector; the
    equivalence is pinned in tests/test_streaming_ops.py. Returns the
    started StreamingQuery."""
    from tepsonic_database_sync_spark.operators.events import ANOMALY_BUCKET_S

    counts = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), f"{ANOMALY_BUCKET_S} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("bucket_es"),
            "cnt",
        )
    )
    writer = (
        counts.writeStream.outputMode("append")
        .foreachBatch(anomaly_batch_applier(store, flags_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_cdc_applier(store, changes_dir: str, keys, compare_cols):
    """foreachBatch callable behind ``snapshot_cdc_stream``: each
    micro-batch is a FULL new snapshot version — diff it against the
    stored previous version (``operators.cdc.snapshot_diff``), append
    the changeset, and atomically repoint the store to the new version.
    Exactly-once per batch_id via the marker protocol; empty batches
    (file-source warm-up triggers) are no-ops, NOT "everything deleted"
    — a real deletion arrives as a snapshot missing the keys.

    Same residual window as the other appliers: a crash between the
    changes append and the marker re-emits one batch's changeset rows on
    restart; a transactional sink closes it."""
    import os

    from tepsonic_database_sync_spark.operators.cdc import snapshot_diff

    marker = os.path.join(store.root, "_LAST_BATCH")

    def _last_committed() -> int:
        try:
            with open(marker) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_committed():
            return  # stateless stream: skipping needs no processing
        new = batch_df.select(*keys, *compare_cols)
        if new.isEmpty():
            return
        old = store.read()
        if old is None:
            old = new.limit(0)  # first snapshot: everything inserts
        changes = snapshot_diff(old, new, keys, compare_cols)
        changes.write.mode("append").parquet(changes_dir)
        store.overwrite(new)  # atomic pointer swap to the new version
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    return apply_batch


def snapshot_cdc_stream(
    snapshots: DataFrame,
    store,
    changes_dir: str,
    checkpoint_dir: str,
    keys,
    compare_cols,
    available_now: bool = True,
):
    """Snapshot-drop CDC: turn a stream of FULL table snapshots (the
    most common integration reality — a vendor/warehouse drops a fresh
    export every night, no change log exists) into an insert/update/
    delete change stream. Each micro-batch diffs against the previous
    version held in a ``ParquetStateStore`` (atomic pointer swap) and
    appends changes-only output — downstream MERGE work scales with
    drift, not snapshot size, which is the entire point of
    ``snapshot_diff``'s changes-only contract.

    The reference's nightly vendor pull IS this shape (products.js:236:
    fetch-everything, then reconcile); this is that loop as a streaming
    pipeline. Returns the started StreamingQuery; equivalence with
    pairwise batch diffs and replay idempotence are pinned in
    tests/test_streaming_ops.py."""
    writer = (
        snapshots.writeStream.foreachBatch(
            snapshot_cdc_applier(store, changes_dir, keys, compare_cols)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_cdc_applier(spark, root: str, keys, group: str, value: str):
    """foreachBatch callable behind ``rollup_cdc_stream``: each
    micro-batch is a FULL snapshot version; diff it against the
    committed previous version and refresh the grouped (count, sum)
    rollup from the drift alone (``operators.cdc.incremental_agg``) —
    the rollup never re-aggregates the base table after bootstrap.

    Unlike the sibling appliers (whose outputs are append-only, so a
    crash between write and marker merely re-emits one batch), a rollup
    DOUBLE-apply corrupts state. This applier therefore commits
    snapshot + rollup + batch_id as ONE atomic unit: both new versions
    are written to fresh paths, then a single ``_COMMIT`` json is
    os.replace'd. A crash anywhere before that swap leaves the previous
    commit fully intact and the replayed batch recomputes from it —
    exactly-once with no residual window.

    EMPTY micro-batches are IGNORED (no commit): in Structured
    Streaming an empty batch_df is indistinguishable from a trigger
    that simply saw no new rows, so treating it as a delete-all
    snapshot would wrongly retract the whole rollup on every idle
    trigger. Consequence (VERDICT r7 advice item 1): a genuinely empty
    snapshot version CANNOT be delivered as zero rows — encode
    delete-all as explicit tombstone rows or apply it out-of-band;
    the maintenance law below is stated over non-empty versions only.
    Pinned by tests/test_streaming_ops.py::
    test_rollup_cdc_applier_ignores_empty_batches (empty batch →
    committed state unchanged).
    """
    import json
    import os

    from tepsonic_database_sync_spark.operators.cdc import (
        incremental_agg,
        snapshot_diff,
    )

    os.makedirs(root, exist_ok=True)
    commit_file = os.path.join(root, "_COMMIT")

    def _commit() -> dict | None:
        try:
            with open(commit_file) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cm = _commit()
        if cm is not None and batch_id <= cm["batch_id"]:
            return
        new = batch_df.select(*keys, group, value)
        if new.isEmpty():
            return
        if cm is None:
            old = new.limit(0)
            agg = old.groupBy(group).agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(value).cast("long").alias(f"sum_{value}"),
            )
        else:
            old = spark.read.parquet(cm["snap"])
            agg = spark.read.parquet(cm["agg"])
        changes = snapshot_diff(old, new, keys, [value, group])
        new_agg = incremental_agg(agg, changes, group, value)
        snap_path = os.path.join(root, f"b{batch_id}", "snapshot")
        agg_path = os.path.join(root, f"b{batch_id}", "rollup")
        new.write.mode("overwrite").parquet(snap_path)
        new_agg.write.mode("overwrite").parquet(agg_path)
        tmp = commit_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"batch_id": batch_id, "snap": snap_path, "agg": agg_path}, f
            )
        os.replace(tmp, commit_file)

    return apply_batch


def rollup_read(spark, root: str) -> DataFrame | None:
    """The committed rollup of a ``rollup_cdc_stream`` (None before the
    first commit)."""
    import json
    import os

    try:
        with open(os.path.join(root, "_COMMIT")) as f:
            return spark.read.parquet(json.load(f)["agg"])
    except (FileNotFoundError, ValueError):
        return None


def rollup_cdc_stream(
    snapshots: DataFrame,
    spark,
    root: str,
    checkpoint_dir: str,
    keys,
    group: str,
    value: str,
    available_now: bool = True,
):
    """Continuously-maintained rollup over a snapshot-drop feed: the
    full pipeline a nightly vendor export needs — snapshot stream →
    pairwise diff (``snapshot_diff``) → incremental rollup refresh
    (``incremental_agg``) — with snapshot, rollup, and batch_id
    committed atomically per micro-batch. After any prefix of NON-EMPTY
    batches, the committed rollup equals a full groupBy over the latest
    non-empty snapshot (the maintenance law, pinned in tests with
    replay and crash-replay cases; empty micro-batches are ignored —
    see ``rollup_cdc_applier`` for why and for the delete-all
    encoding). Returns the started StreamingQuery."""
    writer = (
        snapshots.writeStream.foreachBatch(
            rollup_cdc_applier(spark, root, keys, group, value)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_merge_applier(store, value_col: str, salt: str = "hll"):
    """foreachBatch callable behind ``distinct_sketch_stream``: sketch
    the micro-batch into a portable HLL register table and max-merge it
    into the store.

    Deliberately NO batch_id marker and NO atomic multi-path commit —
    the instructive contrast with rollup_cdc_applier: register max-merge
    is a CRDT join (commutative, associative, IDEMPOTENT), so
    re-applying a replayed batch cannot change the state. Exactly-once
    falls out of the algebra instead of the commit protocol — the
    cheapest kind of streaming state there is.
    """
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.sketches import (
        hll_register_table,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        regs = hll_register_table(batch_df, value_col, salt)
        state = store.read()
        merged = (
            regs
            if state is None
            else state.unionByName(regs)
            .groupBy("bucket")
            .agg(F.max("max_rho").cast("long").alias("max_rho"))
        )
        store.overwrite(merged)

    return apply_batch


def distinct_sketch_stream(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    value_col: str,
    salt: str = "hll",
    available_now: bool = True,
):
    """Continuously-maintained distinct-count sketch: each micro-batch's
    portable HLL registers max-merge into a versioned store, so the
    running cardinality estimate is available at any time at fixed
    (m-register) state — the streaming face of
    ``sketches.hll_register_table``, replay-safe by ALGEBRA (idempotent
    CRDT merge), not by commit protocol. Equivalence with the one-shot
    batch sketch over the full feed is pinned in tests."""
    writer = (
        stream.writeStream.foreachBatch(
            hll_merge_applier(store, value_col, salt)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def topk_merge(state: DataFrame, batch: DataFrame, k: int) -> DataFrame:
    """Merge two (key, best_cents) leaderboards into the top-k by
    (best_cents DESC, key ASC). Correct with only k state rows because
    any member of the true top-k over the union must already lead one
    side; idempotent because per-key max and top-k are both idempotent.
    """
    from pyspark.sql import Window

    u = state.unionByName(batch).groupBy("key").agg(
        F.max("best_cents").cast("long").alias("best_cents")
    )
    w = Window.orderBy(F.col("best_cents").desc(), F.col("key"))
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def leaderboard_applier(store, key_col: str, value_cents, k: int):
    """foreachBatch callable behind ``leaderboard_stream``: reduce the
    micro-batch to its own top-k of per-key maxima and merge into the
    stored leaderboard. Like the HLL registers — and unlike the rollup —
    the merge is an idempotent CRDT join, so replays need no marker
    protocol; state is k rows, period (the global top-k window sorts a
    ≤ 2k-row union, never the feed)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_top = topk_merge(
            batch_df.select(
                F.col(key_col).alias("key"),
                value_cents.cast("long").alias("best_cents"),
            ).limit(0),
            batch_df.select(
                F.col(key_col).alias("key"),
                value_cents.cast("long").alias("best_cents"),
            ),
            k,
        )
        state = store.read()
        merged = batch_top if state is None else topk_merge(state, batch_top, k)
        store.overwrite(merged)

    return apply_batch


def leaderboard_stream(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    key_col: str,
    value_cents,
    k: int,
    available_now: bool = True,
):
    """Continuously-maintained top-k leaderboard (largest observed value
    per key — e.g. biggest purchase per user): per micro-batch, reduce
    to the batch's own top-k and CRDT-merge with the stored k rows.
    Exactly-once by algebra (idempotent max + top-k), state bounded at
    k rows regardless of feed size; equivalence with the one-shot batch
    top-k over the full feed is pinned in tests."""
    writer = (
        stream.writeStream.foreachBatch(
            leaderboard_applier(store, key_col, value_cents, k)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def chunk_dedup_applier(store, out_dir: str):
    """foreachBatch callable behind ``chunk_dedup_stream``: each
    micro-batch of documents runs the ``dedup.
    incremental_chunk_dedup_plan`` → commit-output → merge-index
    sequence against the persistent chunk-fingerprint store, emitting
    the reassembled documents exactly once per batch_id.

    Crash-recovery protocol (every window replays correctly — this is
    the full case analysis, in commit order):

    1. output is committed ATOMICALLY first, as a per-batch partition
       dir ``docs/batch_id=N`` staged in a temp dir and ``os.replace``d
       into place (the ``rollup_cdc_applier`` temp-dir pattern). A
       crash before the replace leaves nothing visible; the replay
       recomputes against the still-unmerged index and produces the
       identical output.
    2. ``store.merge`` runs AFTER the output commit. A crash between
       replace and merge replays with the output dir present: the
       applier skips the (already committed) output and recomputes +
       merges only the fingerprint increment — the index is unchanged
       since the first attempt, so the increment is identical.
       Crucially the replay must NOT recompute the output here: with a
       half-admitted index it would reassemble the batch as all-dropped
       (``kept_text=''``) and silently lose the batch's text — the bug
       this ordering exists to prevent.
    3. the ``_BATCHES`` marker is written last. A crash between merge
       and marker replays with the dir present → output skipped, and
       the re-merge is a no-op by the min-merge idempotence.

    Readers see the union of batch dirs via ordinary partition
    discovery (``spark.read.parquet(out_dir + "/docs")``), with
    ``batch_id`` as a provenance partition column."""
    from tepsonic_database_sync_spark.operators.dedup import (
        _chunk_index_merge,
        incremental_chunk_dedup_plan,
    )

    return _plan_output_merge_applier(
        incremental_chunk_dedup_plan, _chunk_index_merge, store, out_dir
    )


def _plan_output_merge_applier(plan_fn, merge_fn, store, out_dir: str):
    """The shared commit-output-then-merge-index foreachBatch body the
    incremental dedup appliers use (the protocol and its crash-window
    case analysis live in ``chunk_dedup_applier``'s docstring, which
    this implements verbatim): ``plan_fn(batch_df, store) → (fresh,
    out)``; atomic per-batch output dir; ``store.merge(fresh,
    merge_fn)``; marker last."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_BATCHES")

    def _done() -> set[int]:
        try:
            with open(marker) as f:
                return set(json.load(f))
        except (FileNotFoundError, ValueError):
            return set()

    def apply_batch(batch_df, batch_id: int) -> None:
        done = _done()
        if batch_id in done or batch_df.isEmpty():
            return
        fresh, out = plan_fn(batch_df, store)
        batch_dir = os.path.join(out_dir, "docs", f"batch_id={batch_id}")
        os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)
        if not os.path.exists(batch_dir):
            tmp = os.path.join(out_dir, f"_tmp_batch_{batch_id}")
            out.write.mode("overwrite").parquet(tmp)
            os.replace(tmp, batch_dir)
        store.merge(fresh, merge_fn)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(done | {batch_id}), f)
        os.replace(tmp, marker)

    return apply_batch


def substring_dedup_applier(store, out_dir: str):
    """foreachBatch callable behind ``substring_dedup_stream``:
    ``dedup.incremental_substring_dedup_plan`` under the SAME
    commit-output-then-merge protocol as ``chunk_dedup_applier`` (whose
    docstring holds the crash-window case analysis — every window
    replays to the identical committed output; the gram index is
    replay-idempotent by min-merge)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        _gram_index_merge,
        incremental_substring_dedup_plan,
    )

    return _plan_output_merge_applier(
        incremental_substring_dedup_plan, _gram_index_merge, store, out_dir
    )


def substring_dedup_stream(
    docs_stream,
    store,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous ExactSubstr removal: a document stream → per-batch
    ``incremental_substring_dedup`` against the bucketed gram-
    fingerprint store → cleaned documents appended exactly once per
    batch_id. The streaming twin of the batch ``substring_dedup``
    (equivalence law in the operator docstring: doc_id-ordered batching
    reproduces the one-shot removal). Returns the started
    StreamingQuery."""
    writer = docs_stream.writeStream.foreachBatch(
        substring_dedup_applier(store, out_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def chunk_dedup_stream(
    docs_stream,
    store,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous sub-document dedup: a document stream → per-batch
    ``incremental_chunk_dedup`` against the bucketed chunk-fingerprint
    store → reassembled documents appended exactly once per batch_id.
    The streaming twin of the batch ``chunk_dedup`` (equivalence law in
    the operator docstring: in-arrival-order batching reproduces the
    one-shot result — pinned in tests over deterministic micro-batches).
    State is the fingerprint index itself — replay-idempotent by the
    min-merge, no watermark needed (exact dedup has no lateness
    semantics). Returns the started StreamingQuery."""
    writer = docs_stream.writeStream.foreachBatch(
        chunk_dedup_applier(store, out_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


WFS_OUT_SCHEMA = "user_id long, steps long"
WFS_STATE_SCHEMA = "best long, stages array<integer>, tss array<long>"
WFS_LATENESS = "1 hour"


def funnel_update_fn(stages: tuple[str, ...], horizon_s: int):
    """The ``applyInPandasWithState`` update function behind
    ``window_funnel_stream`` — per user: union the batch's (stage, ts)
    events into state, re-run the in-memory funnel kernel, emit the
    user's current best step count, then watermark-prune.

    State bound (the reason this runs forever): the watermark W lets
    every anchor with ``t0 + horizon < W`` be FINALIZED — no admissible
    event for it can still arrive — so its steps fold into the scalar
    ``best`` and every event with ``ts < W − horizon`` is dropped (such
    an event can only serve finalized anchors: as a chain event it
    needs an anchor with ``t0 ≤ ts``, and as an anchor its own window
    closed). Retained state = one scalar + the user's events in the
    trailing ``horizon + lateness`` span of event time.
    """
    import pandas as pd

    from tepsonic_database_sync_spark.operators.events import (
        funnel_steps_inmem,
    )

    n = len(stages)

    def fn(key, pdf_iter, state):
        rows: set[tuple[int, int]] = set()
        for pdf in pdf_iter:
            rows.update(
                zip(
                    (int(x) for x in pdf["stage"]),
                    (int(x) for x in pdf["es"]),
                )
            )
        if state.exists:
            best, st_stages, st_tss = state.get
            evs = set(zip(st_stages, st_tss)) | rows
        else:
            best, evs = 0, rows
        wm_s = state.getCurrentWatermarkMs() // 1000
        best_all, best_final = funnel_steps_inmem(
            evs, n, horizon_s, final_before=wm_s
        )
        cur = max(best, best_all)
        best = max(best, best_final)
        keep = sorted(
            (s, t) for (s, t) in evs if t >= wm_s - horizon_s
        )
        state.update(
            (best, [s for s, _ in keep], [t for _, t in keep])
        )
        if cur >= 1:
            yield pd.DataFrame({"user_id": [key[0]], "steps": [cur]})

    return fn


def funnel_emit_applier(out_dir: str):
    """foreachBatch sink for the update-mode funnel changelog: append
    each batch's (user_id, steps) rows stamped with batch_id; the
    consumer's view is last-write-wins per user (argmax batch_id) —
    re-emission of an unchanged value is harmless by construction, so
    no exactly-once marker is needed."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return apply_batch


def window_funnel_stream(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    stages: tuple[str, ...] = ("signup", "view", "purchase"),
    horizon_s: int | None = None,
    lateness: str = WFS_LATENESS,
    available_now: bool = True,
):
    """Streaming twin of ``operators.events.window_funnel`` (the §12.3
    pairing): a custom stateful operator over ``applyInPandasWithState``
    — per-user funnel progress maintained continuously, emitted in
    update mode as (user_id, steps).

    Semantics match the batch op exactly (strictly-later inter-stage,
    INCLUSIVE horizon, ClickHouse ``strict_increase``): as long as each
    event arrives within ``lateness`` of the stream's max event time,
    the final emission per user equals the batch ``window_funnel`` over
    the same events UNDER ANY ARRIVAL ORDER — state retains the full
    undecided horizon, so this is not an in-order-only equivalence
    (pinned in tests over both ordered and shuffled micro-batches).

    This is the repo's deliberately-Pandas stateful exemplar alongside
    the multimodal decode path: per-user state is small (events in one
    horizon + one scalar), the shuffle is one hash partition on
    user_id, and the kernel is pure Python over that bounded state —
    the shape ``applyInPandasWithState`` exists for. Returns the
    started StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from tepsonic_database_sync_spark.operators.events import (
        WFUNNEL_HORIZON_S,
    )

    h = WFUNNEL_HORIZON_S if horizon_s is None else horizon_s
    stage_col = F.when(F.col("event_type") == stages[0], 0)
    for i, s in enumerate(stages[1:], 1):
        stage_col = stage_col.when(F.col("event_type") == s, i)
    prepared = (
        events_stream.withWatermark("ts", lateness)
        .filter(F.col("event_type").isin(*stages))
        .select(
            "ts",
            "user_id",
            stage_col.cast("int").alias("stage"),
            F.unix_timestamp("ts").cast("long").alias("es"),
        )
    )
    upd = prepared.groupBy("user_id").applyInPandasWithState(
        funnel_update_fn(stages, h),
        WFS_OUT_SCHEMA,
        WFS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        upd.writeStream.outputMode("update")
        .foreachBatch(funnel_emit_applier(out_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mg_topk_applier(spark, root: str, key_col: str, capacity: int):
    """foreachBatch callable behind ``mg_topk_stream``: count the
    micro-batch's keys exactly, ``sketches.mg_merge`` them into the
    committed Misra-Gries summary, and swap the commit pointer
    atomically.

    Fourth point in the streaming-state design space the sibling
    appliers stake out: HLL merges are idempotent CRDT joins (no
    protocol at all), the leaderboard reduce is an idempotent max (no
    protocol), the rollup and chunk-dedup outputs need commit protocols
    because their applies are NOT idempotent. MG is the minimal
    sum-based case: a replayed batch would DOUBLE-COUNT its keys, so the
    summary + batch_id commit as one atomic unit — the exact
    ``rollup_cdc_applier`` pointer-swap (fresh path per batch, single
    ``_COMMIT`` os.replace; a crash anywhere before the swap leaves the
    previous commit intact and the replay recomputes from it).

    Empty micro-batches are ignored (idle triggers commit nothing),
    mirroring the rollup applier's documented empty-batch semantics.
    """
    import json
    import os

    from tepsonic_database_sync_spark.operators.sketches import mg_merge

    os.makedirs(root, exist_ok=True)
    commit_file = os.path.join(root, "_COMMIT")

    def _commit() -> dict | None:
        try:
            with open(commit_file) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cm = _commit()
        if cm is not None and batch_id <= cm["batch_id"]:
            return
        if batch_df.isEmpty():
            return
        batch_counts = batch_df.groupBy(key_col).agg(
            F.count("*").cast("long").alias("est_cnt")
        )
        if cm is None:
            state = batch_counts.limit(0)
        else:
            state = spark.read.parquet(cm["state"])
        merged = mg_merge(state, batch_counts, key_col, capacity)
        state_path = os.path.join(root, f"b{batch_id}", "state")
        merged.write.mode("overwrite").parquet(state_path)
        tmp = commit_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "state": state_path}, f)
        os.replace(tmp, commit_file)

    return apply_batch


def mg_read(spark, root: str) -> DataFrame | None:
    """The committed MG summary of a ``mg_topk_stream`` (None before the
    first commit)."""
    import json
    import os

    try:
        with open(os.path.join(root, "_COMMIT")) as f:
            return spark.read.parquet(json.load(f)["state"])
    except (FileNotFoundError, ValueError):
        return None


def mg_topk_stream(
    stream: DataFrame,
    spark,
    root: str,
    checkpoint_dir: str,
    key_col: str,
    capacity: int = 32,
    available_now: bool = True,
):
    """Continuously-maintained Misra-Gries heavy-hitters summary: each
    micro-batch's exact key counts sum-merge into the committed summary
    (≤ ``capacity`` rows of state, ever), exactly-once via the atomic
    pointer swap. The guarantee after ANY prefix of batches, crashes and
    redeliveries included: est ≤ true and true − est ≤ (N − S)/(capacity
    + 1) over everything delivered so far (Agarwal et al., PODS 2012 —
    the bound survives arbitrary merge trees; pinned by a hypothesis
    property with injected crashes). Returns the started
    StreamingQuery."""
    writer = (
        stream.writeStream.foreachBatch(
            mg_topk_applier(spark, root, key_col, capacity)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kmv_merge_applier(store, value_col: str, k: int = 64):
    """foreachBatch callable behind ``kmv_distinct_stream``: reduce the
    micro-batch to its own bottom-k of distinct h60 hashes (the
    ``sketches.kmv_summary`` tournament) and merge into the stored
    summary by "union, dedup, keep k smallest".

    Fifth point in the streaming-state design space the appliers stake
    out, and the second CRDT one: like the HLL register max-merge (and
    unlike Misra-Gries' load-bearing sum), bottom-k union is
    commutative, associative and IDEMPOTENT — a replayed batch re-unions
    hashes that are already present (or already displaced by smaller
    ones), so exactly-once falls out of the algebra and NO marker
    protocol exists. State is ≤ k rows (h BIGINT), period; the merge
    sorts ≤ 2k values.
    """
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.sketches import kmv_summary

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        km = kmv_summary(
            batch_df.select(F.lit(0).alias("__s"), F.col(value_col)),
            "__s",
            value_col,
            k,
        )
        batch_rows = km.select(F.explode("kmv").alias("h"))
        state = store.read()
        u = (
            batch_rows
            if state is None
            else state.unionByName(batch_rows).distinct()
        )
        merged = u.agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("kmv")
        ).select(F.explode("kmv").alias("h"))
        store.overwrite(merged)

    return apply_batch


def kmv_distinct_stream(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    value_col: str,
    k: int = 64,
    available_now: bool = True,
):
    """Continuously-maintained KMV bottom-k distinct-count summary —
    the streaming face of ``sketches.kmv_summary``: each micro-batch's
    bottom-k CRDT-merges into the store, so the running cardinality
    estimate (``sketches.kmv_estimate`` over the ≤ k stored hashes) is
    available at any time. Replay-safe by ALGEBRA (idempotent bottom-k
    union), not by commit protocol — the HLL contrast to Misra-Gries'
    marker-protected sum; streamed state == the one-shot batch summary
    EXACTLY (merge is exact at the hash level), pinned in tests."""
    writer = (
        stream.writeStream.foreachBatch(
            kmv_merge_applier(store, value_col, k)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Physical-plan regression tests — the 100 TB design points, asserted.

Correctness tests prove the operators compute the right rows; these prove
Catalyst compiles them into the plans that survive a 1000-executor,
100 TB deployment: catalog-side broadcast hash joins (not sort-merge on
the fact side, never nested-loop), parquet filter pushdown, column
pruning, and no Cartesian products anywhere in the flagship lineage.

They assert on ``executedPlan`` strings, which is deliberate: a future
"refactor" that silently degrades a broadcast join to a
BroadcastNestedLoopJoin, or breaks pushdown by burying a filter under a
non-transparent node, fails here long before it shows up as a 100×
regression on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fixtures(spark):
    from tepsonic_database_sync_spark.fixtures import build_fixtures

    # cache=False: assert on the raw compiled plan, not InMemoryTableScan
    return build_fixtures(spark, SF_UNIT, cache=False)


def test_sync_pipeline_has_no_cartesian_or_nested_loop(spark):
    from tepsonic_database_sync_spark.plans.sync import sync_options

    fx = _fixtures(spark)
    plan = plan_of(sync_options(fx["vendor_items"], fx["admin_products"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the catalog (small dim) side must be broadcast, not shuffled
    assert "BroadcastHashJoin" in plan


def test_match_exact_is_broadcast_hash_join(spark):
    from tepsonic_database_sync_spark.operators.matching import match_exact
    from tepsonic_database_sync_spark.operators.options import with_group_keys

    fx = _fixtures(spark)
    gnames = with_group_keys(fx["vendor_items"]).select("gname").distinct()
    plan = plan_of(match_exact(gnames, fx["admin_products"]))
    assert "BroadcastHashJoin [lower(gname" in plan
    assert "SortMergeJoin [lower" not in plan


def test_match_partial_blocked_is_equi_join(spark):
    """The q-gram blocking rewrite: substring containment compiles to a
    hash-joinable equi-join (gram = gram) with the true predicate as a
    residual — NOT a nested-loop scan of the catalog per miss."""
    from tepsonic_database_sync_spark.operators.matching import match_partial
    from tepsonic_database_sync_spark.operators.options import with_group_keys

    fx = _fixtures(spark)
    gnames = with_group_keys(fx["vendor_items"]).select("gname").distinct()
    blocked = plan_of(match_partial(gnames, fx["admin_products"], blocked=True))
    assert "BroadcastNestedLoopJoin" not in blocked
    assert "__gram" in blocked and "Contains" in blocked
    # and the direct theta-join form really is the nested-loop plan we avoid
    direct = plan_of(match_partial(gnames, fx["admin_products"], blocked=False))
    assert "BroadcastNestedLoopJoin" in direct


def test_filter_pushdown_reaches_parquet_scan(spark):
    """A selective predicate on scan columns must land in the FileScan's
    PushedFilters — through the fan-out repartition — so at 100 TB the
    scan skips row groups instead of materializing them."""
    from tepsonic_database_sync_spark.io import load_table

    li = load_table(spark, SF_UNIT, "lineitem")
    q = li.filter(
        (F.col("l_shipdate") >= "1994-01-01") & (F.col("l_discount") > 0.05)
    ).select("l_extendedprice")
    plan = plan_of(q)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_reaches_parquet_scan(spark):
    """A two-column projection must read a two-column schema — through the
    fan-out repartition — not the full 16-column lineitem row."""
    from tepsonic_database_sync_spark.io import load_table

    li = load_table(spark, SF_UNIT, "lineitem")
    plan = plan_of(li.select("l_orderkey", "l_quantity"))
    scan = plan.split("ReadSchema:")[1]
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_comment" not in scan and "l_shipdate" not in scan


def test_aggregate_is_partial_then_final(spark):
    """groupBy aggregations must map-side combine (partial_ functions
    before the exchange) — the difference between shuffling pre-aggregated
    groups and shuffling every raw row at 100 TB."""
    from tepsonic_database_sync_spark.io import load_table

    li = load_table(spark, SF_UNIT, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = plan_of(q)
    assert "partial_sum" in plan


def test_bm25_is_single_shuffle_jvm_side(spark):
    """BM25 must compile to: narrow per-doc projection → ONE aggregation
    for corpus stats → broadcast back. No Python eval, no sort-merge join,
    no second fact-side shuffle — the one-pass scoring plan that runs at
    scan speed on a 100 TB corpus."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import bm25_tfidf
    from tepsonic_database_sync_spark.registry import BM25_TERMS

    docs = load_table(spark, SF_UNIT, "documents")
    plan = plan_of(bm25_tfidf(docs, BM25_TERMS))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan or (
        "CartesianProduct" not in plan
    )
    # the single-row stats side must broadcast, never shuffle the corpus
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan  # stats aggregation map-side combines


def test_sketch_aggregates_do_partial_aggregation(spark):
    """HLL++/t-digest sketches must partial-aggregate (their whole point:
    mergeable fixed-size state moves through the shuffle, not values)."""
    from tepsonic_database_sync_spark.registry import (
        q_sketch_distinct,
        q_sketch_percentile,
    )

    plan_d = plan_of(q_sketch_distinct(spark, SF_UNIT))
    assert "partial_approx_count_distinct" in plan_d
    plan_p = plan_of(q_sketch_percentile(spark, SF_UNIT))
    assert "partial_percentile_approx" in plan_p
    assert "BatchEvalPython" not in plan_d + plan_p


def test_topk_uses_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    top-k then merge), never a global sort of the full table."""
    from tepsonic_database_sync_spark.io import load_table

    o = load_table(spark, SF_UNIT, "orders")
    q = o.orderBy(F.col("o_totalprice").desc()).limit(5)
    assert "TakeOrderedAndProject" in plan_of(q)


def test_repetition_stats_jvm_side_partial_agg(spark):
    """Repetition rules must stay whole-stage-codegen'd: gram fan-out is
    an array generator (no Python), gram counts partial-aggregate before
    the (doc_id, kind, gram) shuffle."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import repetition_stats

    plan = plan_of(repetition_stats(load_table(spark, SF_UNIT, "documents")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan


def test_decontaminate_gram_join_is_broadcast(spark):
    """The benchmark gram set must broadcast: the training side streams
    through a map-side hash probe, never a shuffle join on gram text."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import contamination_flags

    plan = contamination_flags(
        load_table(spark, SF_UNIT, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontaminate_bloom_probe_is_broadcast_and_fp_bounded(spark):
    """The bloom probe must stay map-side on the corpus: every join
    (exact gram set + k word-index probes) is broadcast — no shuffle on
    gram text anywhere, no nested-loop fallback. And the measured
    false-positive rate must sit within theory × slack for the sized
    bitset ((1-e^(-k·n/m))^k with 32 bits/gram, k=4 → ~2e-4)."""
    import math

    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import (
        BLOOM_BITS_PER_GRAM,
        BLOOM_K,
        contamination_flags_bloom,
        _with_shingles,
    )
    from tepsonic_database_sync_spark.operators.sampling import split_bucket

    docs = load_table(spark, SF_UNIT, "documents")
    out = contamination_flags_bloom(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # no shuffle keyed on the corpus gram column
    assert "hashpartitioning(g#" not in plan

    row = out.agg(
        F.sum("n_false_pos").alias("fp"), F.sum("n_grams").alias("n")
    ).collect()[0]
    n_bench = (
        _with_shingles(docs)
        .withColumn("is_bench", split_bucket(F.col("doc_id"), "bench") < 5)
        .filter("is_bench")
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .count()
    )
    m_bits = max(1024, 1 << math.ceil(math.log2(BLOOM_BITS_PER_GRAM * n_bench)))
    p_theory = (1 - math.exp(-BLOOM_K * n_bench / m_bits)) ** BLOOM_K
    assert row["fp"] <= max(8, 8 * p_theory * row["n"]), (
        row["fp"],
        row["n"],
        p_theory,
    )


def test_pack_sequences_window_is_sharded(spark):
    """The packing cumsum must partition on the shard key — a global
    (single-partition) running sum would serialize the whole corpus
    through one task."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.packing import pack_sequences

    plan = pack_sequences(
        load_table(spark, SF_UNIT, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_new_tpch_queries_have_no_scale_killers(spark):
    """Round-5 TPC-H completions: none may compile to a Cartesian product
    or nested-loop join, and every one must reach the parquet scan with
    pushed filters (the date/brand/type predicates)."""
    from tepsonic_database_sync_spark import registry as R

    for fn in (
        R.q_tpch_q2_min_cost,
        R.q_tpch_q4_order_priority,
        R.q_tpch_q7_volume_shipping,
        R.q_tpch_q8_market_share,
        R.q_tpch_q9_profit,
        R.q_tpch_q14_promo_share,
        R.q_tpch_q16_supplier_cnt,
        R.q_tpch_q19_disjunctive,
        R.q_tpch_q20_excess_suppliers,
        R.q_tpch_q21_waiting,
        R.q_tpch_q15_top_supplier,
    ):
        plan = plan_of(fn(spark, SF_UNIT))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "PushedFilters: [" in plan, fn.__name__


def test_tpch_q15_max_is_broadcast_not_global_sort(spark, registry_plans):
    """Q15's correlated MAX over the revenue view must come from a
    single-row aggregate broadcast back onto the view — not a global sort
    or a single-partition window over per-supplier rows (at 100 TB the
    supplier dimension is still millions of rows)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["tpch_q15_top_supplier"]
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "Sort [total_revenue" not in plan


def test_sessionize_batch_single_shuffle(spark, registry_plans):
    """Batch sessionization must run on ONE user_id exchange: the lag
    window, the running-sum window, and the per-session aggregate all
    share the same hash partitioning (a second exchange here would double
    the shuffle volume of every 100 TB sessionization run)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["sessionize_batch"]
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_model_score_prunes_before_python_exchange(spark, registry_plans):
    """The scorer's input projection must be pruned to the model's columns
    BEFORE the Python exchange (payload columns never cross the JVM/Python
    boundary), and the rank stage must shuffle exactly once (on the domain
    key)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["model_score"]
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    # keyed exchanges only: the documents loader's round-robin fan-out
    # (io._fan_out, a no-op at scale) is not part of the operator's
    # shuffle shape (r18)
    assert plan.count("Exchange") - plan.count("RoundRobinPartitioning") == 1
    # the parquet scan reads only the model's input columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"doc_id", "source", "lang", "text"}, read_cols


def test_model_score_histogram_rank_no_python_no_row_sort(spark, registry_plans):
    """The histogram rank mode must be pure Catalyst — no Python rank
    stage (the pandas mode's FlatMapGroupsInPandas) — and its only Window
    must run over the (domain, score) HISTOGRAM, i.e. downstream of the
    count aggregate, never a per-domain sort of raw document rows."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["model_score_hist"]
    assert "FlatMapGroupsInPandas" not in plan  # the rank is JVM-side
    assert "Window" in plan
    # the window's sort operates on the aggregated histogram: in the
    # top-down tree print the Sort node sits ABOVE (consumes) the
    # HashAggregate — a raw-row sort would have no aggregate below it
    assert "Sort " in plan and "HashAggregate" in plan
    assert plan.index("Sort ") < plan.index("HashAggregate")


def test_model_score_histogram_equals_pandas_rank(spark):
    """Exact equivalence of the two rank modes (min-rank is a function of
    the score histogram alone, so the histogram path is bit-identical,
    not approximate) — including on a NULL domain, which Spark's groupBy
    keeps as its own group but a non-null-safe join-back would drop."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.scoring import (
        rank_normalize,
        score_documents,
    )

    scored = score_documents(
        load_table(spark, SF_UNIT, "documents")
    ).localCheckpoint(eager=True)
    a = {tuple(r) for r in rank_normalize(scored).collect()}
    b = {tuple(r) for r in rank_normalize(scored, method="histogram").collect()}
    assert a == b

    with_null = spark.createDataFrame(
        [(1, None, 100), (2, None, 200), (3, "web", 150), (4, None, 200)],
        "doc_id long, source string, score_milli long",
    )
    a2 = {tuple(r) for r in rank_normalize(with_null).collect()}
    b2 = {
        tuple(r) for r in rank_normalize(with_null, method="histogram").collect()
    }
    assert a2 == b2
    assert len(a2) == 4  # the NULL-domain rows are ranked, not dropped


def test_histogram_rank_retains_null_scores_ranked_lowest(spark):
    """ADVICE r6: a non-null-safe score join-back silently dropped
    NULL-score rows. They must be retained and rank below every non-null
    score (SQL NULLS FIRST) — this mode is the only one that accepts
    them (the pandas mode's int64 cast raises on pd.rank's NaN)."""
    from tepsonic_database_sync_spark.operators.scoring import rank_normalize

    with_null_scores = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "a", 100), (4, "a", 200)],
        "doc_id long, source string, score_milli long",
    )
    got = {
        r["doc_id"]: r["rank_permille"]
        for r in rank_normalize(with_null_scores, method="histogram").collect()
    }
    # n=4: NULLs tie at rank 1 → 0; 100 → rank 3 → 666; 200 → rank 4 → 1000
    assert got == {1: 0, 2: 0, 3: 666, 4: 1000}


def test_brute_force_topk_is_deliberate_bnl_query_side_broadcast(spark, registry_plans):
    """brute_force_topk is the ONE place a BroadcastNestedLoopJoin is
    correct: exact KNN scores every (query, vector) pair (O(N·Q) is the
    semantics), so the plan must be a BNL with the small QUERY side
    broadcast and the corpus scanned once. Pinning it keeps the no-BNL
    asserts on every other path sharp — if this ever stops being a BNL,
    either Spark found something better (update the docstring) or someone
    broke the exact baseline while 'fixing' plan warnings."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["ann_bruteforce_topk"]
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan  # broadcast, not a shuffled product
    assert "BroadcastExchange" in plan
    # the top-k itself stays a per-query window, not a global sort+limit
    assert "Window" in plan


def test_sketch_topk_probes_broadcast_counters(spark, registry_plans):
    """The CMS probe must be a broadcast join against the KB-sized counter
    grid (never a shuffle of the term dictionary), and the exact top-k must
    compile to TakeOrderedAndProject, not a global sort."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["sketch_topk"]
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_score_lexicon_broadcast_and_scan_pruned(spark):
    """The bigram-LM scorer's lexicon attach is deliberately UNHINTED
    (r13 — the last vocabulary-scaled forced-broadcast site: a web
    corpus's whitespace lexicon can reach billions of rows, and the
    plan-time hint forces the driver map build with no runtime size
    check; AQE still broadcasts small lexicons and skew-splits the
    hot-token fallback), so no broadcast assertion on it — same rule
    as containment_pairs/token_pmi. What stays pinned: the single-row
    vocab-size stat is the only BNL, the count aggregations map-side
    combine, no Cartesian, and the documents scan prunes to
    (doc_id, text)."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import lm_score

    out = lm_score(load_table(spark, SF_UNIT, "documents"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only BNL allowed is the single-row vocab-size stat join
    bnl = plan.count("BroadcastNestedLoopJoin")
    assert bnl <= 1, plan
    # the count aggregations must map-side combine (the groupBy(u)
    # exchange moves one row per distinct token per partition, which is
    # what makes the hot-token key harmless there)
    assert "partial_count" in plan
    import re

    # column pruning reaches the parquet scan
    assert "ReadSchema" in plan
    for rs in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in rs.group(1).split(",") if c}
        assert cols <= {"doc_id", "text"}, cols


def test_enrich_corpus_is_single_pass_no_exchange(spark):
    """Stage A of the corpus-prepare pipeline must compute EVERY
    row-local signal (quality, lang, PII audit, fingerprint) in one
    projection over one scan — zero Exchange, zero join, zero Python.
    The naive per-signal self-join composition would shuffle the full
    corpus once per signal at 100 TB."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.plans.corpus import enrich_corpus

    docs = load_table(spark, SF_UNIT, "documents", fan_out=False)
    plan = plan_of(enrich_corpus(docs))
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prepare_corpus_gram_probe_broadcast_no_bnl(spark):
    """The full pipeline's only joins are the broadcast gram probe and
    the doc_id join-back — never a nested loop or Cartesian. The one
    gram-keyed exchange allowed is the BENCH slice's distinct (a few
    percent of the corpus, pre-broadcast); the train-side gram stream
    must reach the probe join without its own gram shuffle."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.plans.corpus import prepare_corpus

    out = prepare_corpus(load_table(spark, SF_UNIT, "documents"))
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # bench-side distinct only: exactly one gram exchange, and no
    # SortMergeJoin anywhere (a shuffled train-side probe would need one)
    assert plan.count("hashpartitioning(g#") <= 1, plan
    assert "SortMergeJoin [g#" not in plan


def test_snapshot_diff_single_copartitioned_join_no_bnl(spark, registry_plans):
    """The CDC diff must be ONE full-outer equi-join on the key (both
    sides shuffle once on o_orderkey — bucketing both snapshots makes it
    shuffle-free at warehouse scale), with the changes-only filter and
    null-safe compare staying JVM-side. A nested-loop or Cartesian here
    would scan |old|·|new| pairs."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["snapshot_diff"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan
    # the scan reads only the key + tracked columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"o_orderkey", "o_totalprice", "o_orderstatus"}, read_cols


def test_grouped_quantiles_window_runs_over_histogram_not_raw_rows(spark, registry_plans):
    """Exact grouped quantiles must follow the histogram shape: the only
    Sort feeds the cumulative window over the per-(group, value)
    aggregate — never a per-group sort of raw orders (the naive
    percentile plan that dies at 100 TB)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["grouped_quantiles"]
    assert "Window" in plan and "HashAggregate" in plan
    assert "Sort " in plan
    # top-down print: BELOW the Sort, the histogram aggregate appears
    # before any file scan — the window's input is (group, value) counts,
    # not raw order rows
    below_sort = plan[plan.index("Sort ") :]
    assert "HashAggregate" in below_sort
    assert below_sort.index("HashAggregate") < below_sort.index("FileScan")
    assert "SinglePartition" not in plan  # per-group, never global


def test_event_anomaly_window_runs_over_hourly_aggregate(spark, registry_plans):
    """Spike detection windows over the per-type HOURLY bucket series —
    the RANGE frame's sort must sit above the count aggregate, so its
    input is one row per non-empty bucket, not one per event."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["event_anomaly"]
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Sort ") < plan.index("HashAggregate")
    assert "SinglePartition" not in plan


def test_source_overlap_text_pruned_and_no_cartesian(spark, registry_plans):
    """The overlap matrix must read only (source, text) from the corpus,
    keep the wide text column out of every join (shingles explode before
    any shuffle), and never degenerate into a Cartesian source×source
    product — the shingle equi-join IS the candidate generator."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["source_overlap"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"source", "text"}, read_cols


def test_skew_profile_topk_compiles_to_take_ordered(spark, registry_plans):
    """The diagnostic's top-k must be TakeOrderedAndProject over the
    per-key counts — a global Sort of the count table would serialize
    the very shuffle the tool exists to protect."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["skew_profile"]
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan  # the stats fan-in is broadcast


def test_hash_embed_single_partial_aggregated_shuffle_no_python(spark, registry_plans):
    """The hashing-trick embedder must stay whole-stage-codegen'd (md5 +
    string ops, no Python eval) and partial-aggregate the (doc, bucket)
    weights before its one shuffle — at 100 TB the exchange carries
    sparse per-doc buckets, never raw tokens."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["text_hash_embed"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan
    # keyed exchanges only — the loader's round-robin fan-out is a
    # scale-no-op outside the operator's shuffle shape (r18)
    assert plan.count("Exchange") - plan.count("RoundRobinPartitioning") == 1


def test_apply_changeset_broadcasts_drift_sized_changes(spark, registry_plans):
    """The CDC consumer: the drift-sized changeset must broadcast onto
    the state side (state never shuffles), and nothing degenerates into
    a nested loop."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["cdc_roundtrip"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_profile_table_is_one_pass(spark, registry_plans):
    """The column census must be ONE aggregation pass: a single scan of
    the table feeding one (Expand + partial-aggregate) pipeline — never
    a per-column job fan-out from the driver."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["profile_table"]
    assert plan.count("FileScan") == 1
    assert "Expand" in plan  # the N-distinct rewrite, not N scans
    assert "partial" in plan


def test_winnow_overlap_no_nested_loop_text_pruned(spark, registry_plans):
    """Overlap candidates come from the fingerprint equi self-join (the
    winnowing analog of an LSH band) — no nested loop, no Cartesian. The
    pair plan reads from the checkpointed posting table (the operator
    materializes it once — it feeds four branches), so column pruning is
    asserted on the fingerprint stage, where the corpus scan lives."""
    from tepsonic_database_sync_spark import registry as R
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import winnow_fingerprints

    plan = registry_plans["winnow_overlap"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    fp_plan = plan_of(winnow_fingerprints(load_table(spark, SF_UNIT, "documents")))
    m = re.search(r"ReadSchema: struct<([^>]*)>", fp_plan)
    assert m, fp_plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"doc_id", "text"}, read_cols


def test_pq_codebook_and_tables_broadcast(spark, registry_plans):
    """PQ's joins must all be broadcast-side-small: the codebook joins
    (training, encoding) and the per-query ADC distance tables are KBs
    at any corpus size — a sort-merge or nested-loop here would shuffle
    the corpus for no reason."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["ann_pq_topk"]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_active_users_contribution_explode_no_self_join(spark, registry_plans):
    """Rolling distinct actives must use the contribution-explode shape:
    a Generate (sequence explode) over the distinct (user, day) frame —
    never a day-range self-join of raw events, whose fan-out would be
    |events|·7 instead of |user-days|·7."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["active_users"]
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one events scan feeds both DAU and WAU branches... the scan may
    # print per branch; what must NOT appear is a join of events to
    # events — count the scans and cap them at the two aggregate branches
    assert plan.count("FileScan") <= 2


def test_growth_accounting_windows_over_user_weeks_only(spark, registry_plans):
    """The ledger's lag/lead windows must run over each user's DISTINCT
    week series (the aggregate), never over raw events — below every
    Window sit the distinct aggregation's exchanges."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["growth_accounting"]
    assert "Window" in plan
    below_window = plan[plan.index("Window") :]
    assert "HashAggregate" in below_window
    assert below_window.index("HashAggregate") < below_window.index("FileScan")
    assert "CartesianProduct" not in plan  # the max-week fan-in broadcasts


def test_time_resample_window_runs_over_grid_not_raw_events(spark, registry_plans):
    """The LOCF window must sort only the (key, bucket) grid frame — the
    Sort sits above the bucket aggregate (one row per non-empty bucket),
    never above raw events, and the grid explode keeps everything
    per-key (no SinglePartition, no Cartesian)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["time_resample"]
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Sort ") < plan.index("HashAggregate")
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_filter_join_probes_before_the_join(spark, registry_plans):
    """The Bloom reduction must run map-side UNDER the real join: k
    broadcast word-table probes and the bit-test filter sit in the fact
    branch, so the orders shuffle (if any) carries only survivors. No
    Cartesian, no nested loop, and the fact scan reads only the rollup's
    columns."""
    from tepsonic_database_sync_spark import registry as R
    from tepsonic_database_sync_spark.operators.dedup import BLOOM_K

    plan = registry_plans["runtime_filter_join"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= BLOOM_K  # the word probes
    assert "shiftleft" in plan  # the bit-test filter compiled JVM-side
    import re

    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ocols = next(
        (s for s in scans if "o_custkey" in s), None
    )
    assert ocols is not None
    assert {c.split(":")[0] for c in ocols.split(",")} == {
        "o_custkey",
        "o_totalprice",
    }


def test_token_pmi_topk_and_adaptive_lexicon(spark, registry_plans):
    """PMI scoring must join over the pair-count frame and compile the
    top-k to TakeOrderedAndProject; the only BNLs allowed are the two
    single-row total joins. The lexicon attach is deliberately UNHINTED
    (r12 — the vocabulary grows with the corpus; a forced broadcast of
    the same shape was measured super-linear in containment_pairs), so
    the strategy is stats/AQE-chosen: at unit scale the eagerly
    checkpointed lexicon has exact tiny stats and the planner must
    still pick broadcast on its own — proving factor-1 cost is
    unchanged without the 100 TB driver-side failure mode."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["token_pmi"]
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # stats-chosen, not hint-forced
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    # the count aggregations live behind eager checkpoints (the lexicon
    # feeds three consumers), so assert map-side combine on the lexicon
    # subplan itself
    from pyspark.sql import functions as FF

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import tokens

    toked = load_table(spark, SF_UNIT, "documents").select(
        FF.filter(tokens(FF.col("text")), lambda x: x != FF.lit("")).alias("t")
    )
    uni_plan = plan_of(
        toked.select(FF.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(FF.count("*").alias("c"))
    )
    assert "partial_count" in uni_plan


def test_pagerank_rounds_are_joins_plus_partial_aggregates(spark):
    """Each PageRank round must be an equi-join on src plus a map-side
    combined groupBy on dst — no Cartesian, no nested loop, and the
    edge frame is a reused checkpoint (one scan of lineitem total,
    not one per round)."""
    from tepsonic_database_sync_spark import registry as R

    df = R.q_pagerank(spark, SF_UNIT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan or "partial_count" in plan
    # the checkpointed edge list feeds every round: the lineitem file
    # scan must NOT appear once per iteration
    assert plan.count("FileScan") == 0, "edges must come from the checkpoint"


def test_weighted_sample_global_topk_is_take_ordered(spark):
    """The global weighted sample must compile to TakeOrderedAndProject
    — a full sort of the corpus to pick k rows is the plan that dies
    first at 100 TB."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.sampling import (
        weighted_sample,
    )

    df = weighted_sample(
        load_table(spark, SF_UNIT, "documents"),
        weight=F.col("n_chars"),
        key="doc_id",
        k=50,
    )
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_cdc_incremental_agg_never_scans_the_new_snapshot_twice(spark, registry_plans):
    """The refresh must cost O(changes): the plan joins OLD and NEW once
    (the diff), and the maintained rollup unions drift-sized deltas with
    the one-row-per-group state — no extra base-table aggregation over
    NEW (which is exactly what the operator exists to avoid)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["cdc_incremental_agg"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # orders feeds the OLD-state aggregate and the two diff sides — the
    # plan may scan it for those, but a 4th scan would mean the rollup
    # was recomputed from the NEW snapshot
    assert plan.count("FileScan") <= 3, plan.count("FileScan")
    assert "partial_sum" in plan


def test_match_fuzzy_blocks_via_equi_join_not_all_pairs(spark, registry_plans):
    """The deletion-neighborhood join must be a hash equi-join on the
    variant key — an all-pairs levenshtein theta-join is the quadratic
    plan the operator exists to avoid."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["match_fuzzy"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # the verify survives as a filter


def test_jaccard_prefix_filter_adaptive_dfreq_no_cartesian(spark, registry_plans):
    """The document-frequency attach is deliberately UNHINTED (r12):
    the shingle vocabulary grows with the corpus, and forcing the same
    frame to broadcast was measured super-linear in containment_pairs
    (44.5 s hinted vs 13.3 s adaptive at sf0.1x8). The strategy is
    stats/AQE-chosen; candidates must still arrive by equi-join, never
    a Cartesian product or nested loop."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["dedup_prefix_filter"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # dfreq flows from the checkpointed shingle frame, so the static
    # planner sees exact sizes: tiny at unit scale -> broadcast on its
    # own; corpus-scaled at 100 TB -> shuffle without driver collapse
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_psi_drift_is_bucket_frame_joins_only(spark, registry_plans):
    """PSI must aggregate each side straight to the ≤ |qs|+1 bucket ids
    (map-side combined) and join only bucket frames and single-row
    totals — the only BNLs allowed are the boundary-array and totals
    broadcasts, and nothing may sort raw rows."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["psi_drift"]
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    # exactly the two boundary-array broadcasts (one per side); the
    # checkpointed single-row array prevents subtree duplication
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_compaction_plan_windows_partition_by_dir(spark, registry_plans):
    """Both planning windows must partition by the dataset partition key
    — a global (SinglePartition) sort of the file listing would
    serialize planning for the whole table."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["compaction_plan"]
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_interval_concurrency_windows_over_boundary_aggregate(spark, registry_plans):
    """The sweep-line running sum must sort one row per distinct
    boundary instant — Sort above the (key, t) aggregate, never above
    raw intervals; per-key, never global."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["interval_concurrency"]
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Sort ") < plan.index("HashAggregate")
    assert "SinglePartition" not in plan


def test_ewma_is_generator_fanout_no_self_join_no_window(spark, registry_plans):
    """The EWMA must come from the contribution explode + one groupBy —
    no window at all (a distance-weighted RANGE frame is inexpressible),
    and the join back to real buckets is an equi-join."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["ewma"]
    assert "Generate" in plan  # the explode
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan


def test_tfidf_doc_sim_pairs_come_from_the_posting_join(spark, registry_plans):
    """tfidf_doc_sim's candidate pairs must be an equi-join on the
    shingle (posting lists), never a Cartesian over documents; the only
    BNL allowed is the single-row corpus-size stat join. The weighted
    posting frame is checkpointed, so the dots/norms branches re-read it
    instead of re-tokenizing the corpus."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["tfidf_doc_sim"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0  # checkpoint absorbed it
    assert plan.count("FileScan") == 0, "weighted postings come from the checkpoint"
    assert "partial_sum" in plan


def test_item_cooccur_pairs_are_basket_equijoin(spark, registry_plans):
    """Pair generation must be an equi-join on the basket key (fan-out
    bounded by the basket cap), counts broadcast back — no Cartesian,
    and the one BNL is the single-row n_baskets stat."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["item_cooccur"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BroadcastHashJoin" in plan  # the item-count probes
    assert "partial_count" in plan


def test_negative_sample_cross_is_bounded_broadcast(spark, registry_plans):
    """users × top-N candidates is the ONE legitimate nested-loop (one
    side is a constant-size broadcast list); the positives removal must
    be a hash anti join, not a second nested loop."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["negative_sample"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "LeftAnti" in plan


def test_chi_square_single_fact_pass(spark, registry_plans):
    """The contingency census must aggregate the fact join ONCE —
    marginals, total, and the dense grid all derive from the tiny cells
    frame (orders file-scanned exactly once)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["chi_square"]
    assert "CartesianProduct" not in plan
    # the fact join ran ONCE, inside the eager cells checkpoint — the
    # compiled plan reads only that materialized frame (zero re-scans;
    # before the checkpoint this plan showed FOUR orders scans)
    assert plan.count("FileScan") == 0, plan


def test_bfs_rounds_reuse_the_checkpointed_edges(spark, registry_plans):
    """Every BFS round joins the frontier against the SAME materialized
    edge frame: zero FileScans in the compiled plan (lineitem was read
    once at checkpoint time), no Cartesian."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["bfs_hops"]
    assert plan.count("FileScan") == 0, "edges must come from the checkpoint"
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan  # min-hop reduction map-side combines


def test_resample_linear_windows_run_over_grid_rows(spark, registry_plans):
    """The interpolation windows must sort the bounded (key, bucket)
    grid, never raw events: the window's child aggregates first
    (partial_count/partial_max visible below the Window node)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["linear_interp"]
    assert "Window" in plan
    assert "partial_max" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_is_bucketed_equijoin(spark, registry_plans):
    """The interval-overlap candidates must meet on the bucket key —
    no Cartesian/nested-loop theta join anywhere (the quadratic form is
    confined to the ORACLE, which is the point)."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["interval_join"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan  # the bucket fan-out generator


def test_rrf_fusion_topk_is_take_ordered(spark, registry_plans):
    """The fused consensus top-k AND each input ranking's top-200 must
    compile to TakeOrderedAndProject — a global row_number window over
    the full part catalog would single-partition it (the WindowExec
    warning caught in the r8 bench run); the only unpartitioned window
    allowed is the rank numbering over the already-limited 200 rows."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["rrf_fusion"]
    assert plan.count("TakeOrderedAndProject") >= 3  # 2 rankings + fusion
    assert "CartesianProduct" not in plan


def test_window_funnel_joins_shuffle_on_user_only(spark, registry_plans):
    """Every stage join is a user-keyed equi-join with a range residual
    — no Cartesian, no nested loop; anchors aggregate map-side."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["window_funnel"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan


def test_embed_outliers_vector_sums_are_generated_not_joined(spark, registry_plans):
    """Centroid math must be the posexplode generator + one map-side
    combined (label, pos) aggregate — no Cartesian over vectors."""
    from tepsonic_database_sync_spark import registry as R

    plan = registry_plans["embed_outliers"]
    assert "CartesianProduct" not in plan
    assert "Generate posexplode" in plan
    assert "partial_sum" in plan


def test_dsir_select_is_broadcast_only_take_ordered(spark, registry_plans):
    """DSIR selection's 100 TB shape: gram→bucket counts partial-agg
    onto the fixed 512-bucket key space, the λ table and 1-row totals
    broadcast back, final top-k a TakeOrderedAndProject — never a
    SortMergeJoin (a shuffle join on grams would move the whole corpus)
    and never a full sort."""
    plan = registry_plans["dsir_select"]
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # λ table + doc metadata
    assert "partial_sum" in plan or "partial_count" in plan


def test_mg_summary_offset_is_take_ordered_and_broadcast(spark, registry_plans):
    """The MG offset must come from a TakeOrderedAndProject over
    capacity+1 rows (never a global sort of the term dictionary) and
    re-attach as a broadcast single-row frame; the term counts aggregate
    with map-side combine."""
    plan = registry_plans["mg_summary"]
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_dup_substring_rate_aggregates_map_side(spark, registry_plans):
    """The exact duplication metric's one wide aggregation (gram counts)
    must partial-combine map-side, and the coverage join must be a
    gram-keyed equi-join — no Cartesian, no nested loop over docs."""
    plan = registry_plans["dup_substring_rate"]
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_product_in_any_registry_query(registry_plans):
    """Blanket invariant over the ENTIRE registry: no query may compile
    to a CartesianProduct — the non-broadcast cross join that dies
    first at scale. Deliberate bounded nested loops (1-row stat
    broadcasts, the brute-force ANN baseline, negative_sample's
    candidate cross) appear as BroadcastNestedLoopJoin, which this
    blanket check intentionally does NOT forbid — per-operator tests
    pin those counts individually. Catching a Cartesian here means a
    join condition was dropped or a blocking key was lost."""
    from tepsonic_database_sync_spark import registry as R

    offenders = []
    for name in R.REGISTRY:
        plan = registry_plans.get_or_error(name)
        if "CartesianProduct" in plan or "PLAN BUILD FAILED" in plan:
            offenders.append(f"{name}: {plan[:80]}" if "FAILED" in plan
                             else name)
    assert not offenders, offenders


def test_no_row_python_eval_in_any_registry_query(registry_plans):
    """Blanket invariant over the ENTIRE registry: no query may compile
    a BatchEvalPython node — the row-at-a-time Python boundary. The
    sanctioned Python boundaries (MapInPandas /
    FlatMapGroupsInPandas / ArrowEvalPython) are Arrow-batched and
    pinned per-operator where they are deliberate; BatchEvalPython
    anywhere means a plain Python UDF crept into a plan."""
    from tepsonic_database_sync_spark import registry as R

    offenders = [
        name
        for name in R.REGISTRY
        if "BatchEvalPython" in registry_plans.get_or_error(name)
    ]
    assert not offenders, offenders


def test_substring_dedup_aggregates_map_side(spark, registry_plans):
    """ExactSubstr removal must pick the canonical occurrence inside the
    ONE gram-count aggregation (min(struct) + count are both algebraic
    → partial-combined map-side, no per-gram window over the corpus),
    and the removal join must stay a gram-keyed equi-join."""
    plan = registry_plans["substring_dedup"]
    assert "partial_count" in plan
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_substring_dedup_spans_islands_are_row_local(spark, registry_plans):
    """The maximal-span variant must add NOTHING distributed on top of
    substring_dedup: same map-side-combined gram aggregate (partial
    min/count), gram-keyed equi-join, and the gaps-and-islands
    coalescing as row-local array math — NO Window over corpus rows
    (the oracle twin uses row_number, the engine must not), no
    nested-loop join."""
    plan = registry_plans["substring_dedup_spans"]
    assert "partial_count" in plan
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_keep_best_argmax_is_map_side_no_cartesian(
    spark, registry_plans
):
    """The fuzzy keeper's per-cluster argmax must be the algebraic
    min(struct(-quality, doc_id)) — partial-combined map-side, never a
    per-cluster window over the joined frame — and nothing in the
    visible plan (the LSH/star subtree sits behind a localCheckpoint)
    may be a nested-loop join."""
    plan = registry_plans["dedup_fuzzy_keep_best"]
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the keeper agg itself must not be window-ranked: the only purpose
    # of min-struct is to avoid exactly that shape on skewed clusters
    assert "row_number" not in plan


def test_decontaminate_fuzzy_broadcasts_bench_side(spark, registry_plans):
    """Fuzzy decontamination must probe the SMALL benchmark side as a
    broadcast (both the banded frame and the shingle arrays — the
    train corpus streams and never shuffles on its own size), verify
    on an equi-join, and pick the best match with the algebraic
    min-struct, never a per-doc window."""
    plan = registry_plans["decontaminate_fuzzy"]
    # THREE broadcast joins, counted (ADVICE r16 item 2 — "in plan" let
    # a train-sized shuffle hide behind any single broadcast): the
    # banded bench probe, the candidate frame into the train-shingle
    # verify (bounded by band collisions against the small bench side),
    # and the bench shingle arrays. The only sort-merge join allowed is
    # the final train-left-join-best attach (both sides train-sized).
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan
    assert "row_number" not in plan


def test_boilerplate_report_argmax_is_map_side(spark, registry_plans):
    """The per-source top-line choice must be the algebraic
    min(struct(-in_docs, line)) — map-side partial-combined, no
    window rank — and nothing may nested-loop (every join is on
    (source, line) or source)."""
    plan = registry_plans["boilerplate_report"]
    assert "partial_min" in plan
    assert "row_number" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_cluster_census_no_nested_loop_broadcast_total(
    spark, registry_plans
):
    """The census must add only map-side aggregates on top of the CC
    substrate: the corpus total attaches as a broadcast 1-row frame
    (the only acceptable cross join — singleRow build side), and
    nothing may nested-loop over data."""
    plan = registry_plans["dedup_cluster_census"]
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    # the broadcast 1-row corpus-total attach is the ONLY acceptable
    # nested-loop in this plan (single-row build side); a second one
    # would mean a data-sized product crept in
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # ... and the ONE allowed instance must actually BE the corpus-total
    # attach (ADVICE r16 item 4: <=1 alone would let a data-sized
    # nested-loop replace the intended one): its broadcast build side is
    # the global keys=[] count producing n_total, nothing else.
    seg = plan[plan.index("BroadcastNestedLoopJoin"):]
    j = seg.find("IdentityBroadcastMode")
    assert j != -1, "BNLJ build side is not an identity broadcast"
    build = seg[j : j + 400]
    assert "HashAggregate(keys=[]" in build and "n_total" in build, (
        "the BNLJ build side must be the 1-row corpus-total aggregate"
    )


def test_semdedup_pairs_are_cluster_equijoin(spark, registry_plans):
    """SemDeDup's whole point is cluster-blocked comparison: the pair
    step must be a cent_id-keyed equi-join over the (checkpointed)
    assignment — never a corpus×corpus product — and the final flag
    re-attach joins on vec_id. The assignment subtree sits behind a
    lazy localCheckpoint (it is consumed three times), so the visible
    plan must contain NO nested-loop join at all."""
    import re

    plan = registry_plans["semdedup"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    keys = [
        m.group(1)
        for m in re.finditer(
            r"(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan
        )
    ]
    assert keys, "expected equi-joins in the removal step"
    for k in keys:
        assert k.startswith("cent_id#") or k.startswith("vec_id#"), k


def test_semdedup_two_level_pairs_are_combined_cell_equijoin(
    spark, registry_plans
):
    """The two-level form must keep the single-level invariants: the
    pair step is an equi-join on the COMBINED (coarse_id, fine_id) cell
    over the lazily-checkpointed fine assignment, the flag re-attach
    joins on vec_id, and no nested-loop join is visible (the coarse
    codebook's keyless BNL attach lives behind the assignment
    checkpoint; the fine codebook attaches are coarse_id-keyed
    equi-joins left UNHINTED — the r12 broadcast-audit class)."""
    import re

    plan = registry_plans["semdedup_two_level"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    keys = [
        m.group(1)
        for m in re.finditer(
            r"(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan
        )
    ]
    assert keys, "expected equi-joins in the removal step"
    for k in keys:
        assert k.startswith("coarse_id#") or k.startswith("vec_id#"), k


def test_gopher_rules_is_row_local_plus_one_gram_shuffle(
    spark, registry_plans
):
    """The Gopher filter's seven direct signals are ONE codegen'd
    row-local projection; the only aggregation work is the repetition
    trio's map-side-combined gram rollup (inherited from
    repetition_stats). No Cartesian, no nested loop, and the exchange
    count stays at the repetition substrate's shape (gram agg +
    per-doc rollup + the two doc_id joins) — a per-signal self-join
    would blow this bound immediately."""
    plan = registry_plans["gopher_rules"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan
    assert (
        plan.count("Exchange") - plan.count("RoundRobinPartitioning") <= 5
    ), plan.count("Exchange")


def test_kmv_tournament_has_no_per_set_sort_shuffle(spark, registry_plans):
    """The KMV build must be the two-level tournament: distinct on the
    wide (set, hash) key with partial aggregation, bounded per-bucket
    collect_lists — never a global or per-set sort of the hash stream
    (no SortMergeJoin, no per-set window). The only join is the 1-row
    summary-vs-summary broadcast (one BNLJ)."""
    plan = registry_plans["kmv_distinct"]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "partial_" in plan


def test_mmr_rerank_stage_shapes(spark, registry_plans):
    """MMR's cost contract: the CORPUS appears only in the candidate
    tier (the one sanctioned exact-KNN BroadcastNestedLoopJoin —
    brute_force_topk's docstring), the pairwise-sim stage is a
    q_id-keyed equi-join over candidates (bounded n_cand² per query,
    never corpus²), and the greedy rounds run over eagerly-materialized
    frames — the registry plan (post-checkpoint) must show no
    nested-loop join at all."""
    from conftest import SF_UNIT

    from tepsonic_database_sync_spark.operators.similarity import (
        _mmr_candidates,
        _mmr_pairsims,
    )

    plan = registry_plans["mmr_rerank"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    emb = spark.read.parquet(SF_UNIT + "/embeddings.parquet")
    cand = _mmr_candidates(emb, 8, 20)
    cplan = cand._jdf.queryExecution().executedPlan().toString()
    assert cplan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in cplan
    pplan = _mmr_pairsims(cand)._jdf.queryExecution().executedPlan().toString()
    # exactly the two candidate subtrees' BNLs — the pair join itself
    # must be a q_id-keyed HASH join, adding none
    assert pplan.count("BroadcastNestedLoopJoin") == 2
    assert "CartesianProduct" not in pplan
    assert "BroadcastHashJoin" in pplan or "SortMergeJoin" in pplan


def test_phash_dedup_is_banded_never_all_pairs(spark, registry_plans):
    """The binary pHash near-dup must follow the dedup-ladder shape:
    signature votes collapse in ONE map-side-combined aggregation
    (partial_sum over the 48 conditional vote sums — no per-bit row
    explosion), candidates come from the (band, key) equi-join, and
    nothing compiles to a nested loop or Cartesian over assets."""
    plan = registry_plans["multimodal_phash_dedup"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan


def test_label_propagation_rounds_are_mode_aggregations(spark, registry_plans):
    """Each LPA round must be: edges (checkpointed once) joined to the
    small label frame, then the mode as a map-side-combined
    (node, label) count + max(struct) argmax — never a per-node
    neighborhood sort, never a nested loop. Since r12 the rounds carry
    NO per-round checkpoint (lineage is linear — one consumer per
    round — so the whole trajectory pipelines as one job; a lazy cut
    fires only every _LPA_CKPT_EVERY rounds), so the visible plan is
    the full uncut chain of all rounds' join + aggregation pairs."""
    plan = registry_plans["label_propagation"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_pairs_prefix_blocking_shapes(spark, registry_plans):
    """The one-sided prefix filter must keep its scale contract:
    candidates arrive by gram equi-join and nothing compiles to a
    nested loop or Cartesian over documents. The df attach is
    deliberately UNHINTED (forced broadcast measured super-linear at
    sf0.1×8 — the vocabulary grows with the corpus; AQE picks the
    strategy at runtime), so no broadcast assertion here."""
    plan = registry_plans["containment_pairs"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rm3_feedback_two_pass_shapes(spark, registry_plans):
    """RM3's scale contract: the corpus never shuffles on a term key —
    pass-2 candidates come from the broadcast expansion-term probe
    (hash joins), doc-keyed corpus joins may sort-merge (co-partition
    at scale), the only visible BNL is the single-row corpus-stats
    crossJoin (r18: pass 1 and the expansion terms sit behind
    localCheckpoints, so bm25's internal stat crossJoins and the w_tot
    attach no longer appear in the final plan — before that the pin
    was 4), the final top-n is TakeOrderedAndProject, and nothing
    drops to Python."""
    plan = registry_plans["rm3_feedback"]
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_l_diversity_is_two_phase_aggregation(spark, registry_plans):
    """The privacy census must stay rollup-shaped: (quasi, sensitive)
    counts partial-aggregate map-side, the global distribution and the
    1-row total broadcast back (single-row BNL allowed), and nothing
    compiles to a Cartesian or a per-class fan-out over the global
    value set (the closed-form absent-value correction exists precisely
    to avoid that join)."""
    plan = registry_plans["l_diversity"]
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row total


def test_fineweb_filters_is_row_local_plus_one_line_shuffle(
    spark, registry_plans
):
    """The FineWeb/C4 gate's direct signals are ONE codegen'd row-local
    projection; the only aggregation work is the duplicated-line-char
    share's (doc_id, line) rollup (key contains doc_id → skew-free).
    No Cartesian, no nested loop, map-side combine on, and the exchange
    count stays at the two-aggregate + doc_id-join shape."""
    plan = registry_plans["fineweb_filters"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert (
        plan.count("Exchange") - plan.count("RoundRobinPartitioning") <= 4
    ), plan.count("Exchange")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_rebalance_single_corpus_aggregate(spark, registry_plans):
    """The water-filling mixture's corpus-scale work must be exactly ONE
    map-side-combined token-count aggregate; the iteration runs on the
    post-aggregate per-domain frame (localCheckpoint'd, |domains| rows)
    with per-round stats as whole-frame window sums, so each round
    consumes its predecessor exactly ONCE — linear lineage. The only
    BroadcastNestedLoopJoin allowed is the single-row budget attach
    (the agg+crossJoin per-round form SQUARED the subtree: 510 BNLs at
    8 rounds), and nothing may compile to a Cartesian."""
    plan = registry_plans["mixture_rebalance"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, (
        plan.count("BroadcastNestedLoopJoin")
    )
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_stack_composes_without_cartesian(spark, registry_plans):
    """r14 consolidation pin: the stack scans the corpus ONCE — the
    signal projection and the unified gram counts are eagerly
    localCheckpoint'd (the parquet scan lives inside the first
    checkpoint's build job), so the FINAL plan must read only
    ExistingRDD, never parquet. It may add single-row broadcast
    attaches (V, mean) — never a Cartesian, never Python."""
    plan = registry_plans["quality_stack"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3, (
        plan.count("BroadcastNestedLoopJoin")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the one-scan claim: everything downstream reads the checkpoints
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan


def test_snapshot_dedup_is_two_aggregates_no_window(spark, registry_plans):
    """Cross-snapshot dedup must be two map-side-combined aggregates
    (capture rollup + max(struct) argmax) — never a per-url window
    sort, nested loop, or Cartesian; both shuffle keys contain url."""
    plan = registry_plans["snapshot_dedup"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "WindowExec" not in plan and "RunningWindowFunction" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_dedup_incremental_is_one_merge_join(
    spark, registry_plans
):
    """The incremental form must be: batch rollup aggregate + ONE
    co-keyed (url, fp) full-outer MERGE join + the shared argmax —
    never a Cartesian/BNL, never a window, and the merge join is the
    only join in the plan."""
    plan = registry_plans["snapshot_dedup_incremental"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowExec" not in plan
    assert (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
        <= 1
    ), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_edit_verified_candidates_are_banded(spark, registry_plans):
    """The edit verifier must get its pairs from the banded equi-join
    (never all-pairs): no Cartesian, no BNL, and the Levenshtein is
    guarded by the short-circuiting length-gap CaseWhen so the DP
    cannot be reordered ahead of the cheap reject."""
    plan = registry_plans["dedup_edit_verified"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan and "CASE WHEN" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_train_rounds_are_argmax_not_global_sort(spark, registry_plans):
    """Each BPE round's winner must compile to TakeOrderedAndProject
    (per-partition top-1 then merge), the pair counts must map-side
    combine, and the only per-round join is the broadcast single-row
    winner attach — no Cartesian, no Python. The registry plan only
    shows the checkpointed union (the per-round work executes inside
    the eager cuts), so the per-round shape is pinned on ONE uncut
    round via checkpoint=False."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.text import bpe_train

    plan = registry_plans["bpe_train"]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    one = bpe_train(
        load_table(spark, SF_UNIT, "documents"), n_merges=1, checkpoint=False
    )
    rplan = one._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan
    assert "TakeOrderedAndProject" in rplan
    assert "partial_sum" in rplan
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan


def test_bpe_encode_vocab_join_unhinted_no_python(spark, registry_plans):
    """bpe_encode's only BNL is the single-row merge-rule attach (the
    legitimate broadcast class: n_merges rows by construction); the
    vocabulary join must stay UNHINTED (the lm_score doctrine — a web
    corpus's word vocabulary can be huge, AQE decides), and the fold is
    pure JVM expression work — no Python, no Cartesian."""
    plan = registry_plans["bpe_encode"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, (
        plan.count("BroadcastNestedLoopJoin")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_rebalance_bpe_plan(spark, registry_plans):
    """The BPE-token mixture composes bpe_encode + waterfill: allowed
    single-row attaches are the merge-rule array and the budget row
    (≤ 2 BNLs); the water-filling window runs on the per-domain frame
    only; no Cartesian, no Python."""
    plan = registry_plans["mixture_rebalance_bpe"]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, (
        plan.count("BroadcastNestedLoopJoin")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kcore_rounds_are_anti_joins_no_cartesian(spark, registry_plans):
    """Each peel round must be one map-side-combined degree count plus
    two LEFT ANTI joins against the REMOVED node set (r17 — the
    complement of the pre-r17 left-semi-vs-survivors form: identical
    output on the operator's symmetric non-null contract, but the
    broadcast side is the shrinking drop frame, empty at the fixed
    point, instead of the whole surviving graph) — no Cartesian, no
    BNL-as-data-join, no Python. The registry plan shows the
    checkpointed final round; the uncut per-round shape is pinned via
    checkpoint=False at one round."""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.operators.graph import kcore

    plan = registry_plans["kcore"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    one = kcore(edges, k=2, rounds=1, checkpoint=False)
    rplan = one._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan
    assert "LeftAnti" in rplan
    assert "LeftSemi" not in rplan
    assert "partial_count" in rplan


def test_line_dedup_keeper_is_map_side_min_no_nested_loop(
    spark, registry_plans
):
    """line_dedup's keeper pick must live inside the ONE line-key
    aggregation (min(struct) is algebraic → partial-combined map-side,
    so a million-copy boilerplate line ships one row per map task),
    and the keeper attach must stay a key equi-join — no nested loop,
    no Cartesian, no window over raw occurrences."""
    plan = registry_plans["line_dedup"]
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_ngram_novelty_keeper_is_map_side_min_no_nested_loop(
    spark, registry_plans
):
    """Same contract as line_dedup at gram granularity (the shared
    keeper rule): map-side partial min on the gram key, equi-join
    attach, no window over raw gram occurrences."""
    plan = registry_plans["ngram_novelty"]
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_fuzzy_canonicalize_keeper_is_map_side_rejoin_only(
    spark, registry_plans
):
    """The corpus-out fuzzy tier must stay on fuzzy_keep_best's plan:
    algebraic min-struct keeper (partial_min, no window rank, no
    window at all — unlike min-id canonicalize, which windows over
    labels), no nested-loop anywhere, and the only addition is the
    doc_id equi-join that re-attaches wide columns for survivors."""
    plan = registry_plans["dedup_fuzzy_canonicalize"]
    assert "partial_min" in plan
    assert "row_number" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_fuzzy_report_stays_on_decon_plan(
    spark, registry_plans
):
    """The per-source rollup must inherit decontaminate_fuzzy's plan
    (three counted broadcast joins — banded bench probe, candidate
    frame, bench shingles; the train corpus never shuffles on its own
    size) and add only the source attach plus ONE map-side-combined
    aggregate; the worst-match choice is the algebraic min-struct,
    never a per-source window."""
    plan = registry_plans["contamination_fuzzy_report"]
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan
    assert "row_number" not in plan
    assert "Window" not in plan


def test_substring_spans_verified_no_window_no_nested_loop(
    spark, registry_plans
):
    """The verified spans operator must keep the whole verify chain in
    equi-joins and aggregates: run detection and span coalescing are
    row-local array math over materialized sorted arrays (the DuckDB
    twin uses row_number islands — the engine must NOT), and nothing
    may nested-loop. Five sort-merge joins are the chain's budget
    (non-canonical positions, islands→token arrays, island
    grams→occurrences, and the reconstruction attach; the canonical
    frame sits behind a localCheckpoint)."""
    plan = registry_plans["substring_dedup_spans_verified"]
    assert "Window" not in plan
    assert "row_number" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 5


def test_source_neardup_matrix_broadcast_attach_no_window(
    spark, registry_plans
):
    """The matrix must attach sources by broadcasting the bounded
    verified-pair frame against the streaming (doc_id, source)
    projection (two explicit hints — the corpus never shuffles on its
    own size for the attach), pick the strongest match per cell with
    the algebraic min-struct, and never window or nested-loop."""
    plan = registry_plans["source_neardup_matrix"]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan
    assert "row_number" not in plan
    assert "Window" not in plan

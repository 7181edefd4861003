"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_warm_sec, "unit": "sec",
"queries": {name: warm_sec}, "queries_cold": {name: first_run_sec},
"value_cold": ..., "sf": ...}.

Timing protocol (BENCH_r02 onward):
- Each query is forced end-to-end with the no-op sink (full compute, no
  driver-side row transfer).
- COLD = the first timed run (includes first-touch costs such as the
  fixture build for the first fixture-using query). WARM = min over all
  runs — on this shared VM with 2-3x CPU-steal variance the min is the
  engine's cost, the rest is hypervisor noise. Both are reported;
  round-over-round comparisons should use WARM.
- The match cascade is its OWN headline entry: each run invalidates the
  session match cache and rebuilds it, so the sync queries that follow
  measure their own work against a warm cascade instead of silently
  absorbing (or silently skipping) the cascade cost.
- The only pre-timing warm-up is JIT/codegen warming on sf0.001
  (different data, same code paths); warm-up failures are LOGGED, never
  swallowed.
- BENCH_r07 onward the headline set includes the round-6 additions
  (window_range_frame, skew_salted_join, stream_stream_join,
  decontaminate_bloom, model_score_hist) and the round-7 operators
  (text_lm_score, prepare_corpus, dedup_incremental, snapshot_diff,
  grouped_quantiles, event_anomaly, cdc_roundtrip, embed_dedup_clusters,
  text_hash_embed, winnow_overlap, profile_table, join_size_estimate,
  ann_pq_topk, ann_ivf_pq_topk, group_entropy, grouped_mode,
  active_users, quantile_bucketize, dedup_keep_best,
  growth_accounting) plus the late-r7 block (time_resample,
  runtime_filter_join, token_pmi, pagerank, zorder_stats,
  weighted_sample, cdc_incremental_agg, match_fuzzy,
  dedup_prefix_filter, psi_drift, compaction_plan, interval_concurrency,
  ewma, group_moments, ohlc_bars, hll_registers, tvd_drift,
  attribution_models, k_anonymity, leaderboard, outliers_mad,
  triangle_stats), so r7 totals are comparable to earlier rounds
  only on the common-query subset, as with every prior headline
  extension. BENCH_r08 adds the 12 r8 operators (item_cooccur …
  layout_prune) — same common-subset comparison rule.
- Output protocol (r8 onward): full 3-decimal warm+cold detail is
  written to BENCH_DETAIL.json; the single stdout JSON line carries
  2-decimal warm timings and is kept under a fixed byte budget
  because the driver's tail capture truncated the r7 line (BENCH_r07
  parsed: null). r16 onward (VERDICT r15 item 2) the line carries the
  COMPLETE per-query map as a positional array "q" in HEADLINE-as-run
  order ("q_names" in BENCH_DETAIL.json; "qh" fingerprints the name
  list) instead of a named dict that elided 48/126 entries at r15 —
  "queries_elided" is now structurally 0.
- Contention index (r14 onward, VERDICT r13 item 3): a fixed
  xxhash64-fold calibration probe runs min-of-3 before AND after the
  headline loop; "calib" in the stdout line (min of the two) and
  calib_pre/calib_post in the detail. Round-over-round, a family-wide
  timing shift that MOVES WITH calib is ambient CPU-steal, not a code
  regression. Official runs must also be QUIET: never concurrent with
  a driver_sim sweep or test session.
- Scaling sentinel (r18, VERDICT r17 item 2): a fixed SHUFFLE-bound
  probe ("sent" in the stdout line, "scale_sentinel" in the detail)
  runs min-of-2 after the headline loop. At sf0.1 every headliner is
  overhead-bound (the r17 driver pair measured c8 BEATING c32 on the
  headline total), so parallelism wins are invisible in "value"; the
  sentinel's c8/c32 ratio is the scaling check. Like calib it is
  synthetic (spark.range), deterministic, and never part of "value".
- Round-over-round alignment (r18, VERDICT r17 item 7): per-query
  comparison across rounds must JOIN BY NAME via "q_names" in the
  committed BENCH_DETAIL.json (aligned 1:1 with the stdout "q" array;
  "qh" fingerprints the name list so the alignment is verifiable).
  Positional comparison of "q" arrays breaks whenever HEADLINE grows —
  r17's PERF matched 0 queries that way. r18 adds NO headline entries,
  so qh is unchanged from r17 (4083e6d0) and even the positional rule
  works this round.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry

# ordered cheap → heavy; covers the reference spine + every extension family
HEADLINE = [
    "j2_match_partial",
    "p6_resolve_variant",
    "stream_sessions",
    "stream_enrich",
    "text_stats",
    "text_bm25",
    "text_top_terms",
    # r7: bigram-LM scoring — new double-self-join shape, tracked from birth
    "text_lm_score",
    "events_json",
    "tpch_q1_pricing",
    # r5 TPC-H completions: q9 (widest broadcast-join profit rollup) and
    # q21 (the EXISTS/NOT-EXISTS pair collapsed to one fact shuffle)
    "tpch_q9_profit",
    "tpch_q21_waiting",
    # r6: the last expressible classic — revenue view + broadcast max
    "tpch_q15_top_supplier",
    "sessionize_batch",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    # training-pipeline + warehouse additions (r2): cheap per-query, keeps
    # every extension family visible in the headline
    "pack_sequences",
    "mixture_sample",
    "scd2_history",
    # r7: the r6 additions were the heaviest untracked code (VERDICT r6
    # item 2) — RANGE-frame window, salted join, micro-batched
    # stream-stream join, bloom decontamination, and the model-scoring
    # forward pass + histogram rank (the scalable rank path)
    "window_range_frame",
    "skew_salted_join",
    "stream_stream_join",
    "decontaminate_bloom",
    "model_score_hist",
    # r7: the end-to-end corpus-prepare pipeline and the store-backed
    # incremental dedup — the two flagship training-data paths
    "prepare_corpus",
    "dedup_incremental",
    # r7: CDC snapshot diff (full-outer join over orders — the heaviest
    # new join shape) and the exact-histogram grouped quantiles + hourly
    # spike detection (window-over-aggregate shapes)
    "snapshot_diff",
    "grouped_quantiles",
    "event_anomaly",
    # r7: CDC round-trip (diff + apply), semantic dedup end-to-end
    # (near-dup pairs → star contraction), and the hashing-trick
    # embedder (token-explode shuffle shape)
    "cdc_roundtrip",
    "embed_dedup_clusters",
    "text_hash_embed",
    "winnow_overlap",
    "profile_table",
    "join_size_estimate",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "group_entropy",
    "grouped_mode",
    "active_users",
    "quantile_bucketize",
    "dedup_keep_best",
    "growth_accounting",
    # late-r7: time-grid LOCF resample (grid explode + window), Bloom
    # runtime-filter join (map-side probe before the shuffle), PMI
    # collocations (pair-count shuffle), 5-round integer PageRank (the
    # iterative shape), and the Z-order clustering census
    "time_resample",
    "runtime_filter_join",
    "token_pmi",
    "pagerank",
    "zorder_stats",
    "weighted_sample",
    "cdc_incremental_agg",
    "match_fuzzy",
    "dedup_prefix_filter",
    "psi_drift",
    "compaction_plan",
    "interval_concurrency",
    "ewma",
    "group_moments",
    "ohlc_bars",
    "hll_registers",
    "tvd_drift",
    "attribution_models",
    "k_anonymity",
    "leaderboard",
    "outliers_mad",
    "triangle_stats",
    # r8: co-purchase item-item similarity (basket self-join), bounded
    # BFS (iterative frontier joins), sparse tf-idf cosine join (posting
    # self-join), chunk-level exact dedup with reassembly, the sampling
    # pair, the stats pair, interpolation, seasonal drift, the inverted
    # index build, and the layout advisor
    "item_cooccur",
    "bfs_hops",
    "tfidf_doc_sim",
    "chunk_dedup",
    "class_balance",
    "negative_sample",
    "grouped_regression",
    "chi_square",
    "linear_interp",
    "seasonal_profile",
    "inverted_index",
    "layout_prune",
    # r8 batch 2: generic star-contraction components, bucketed interval
    # join, rank fusion, anchored-window funnel, embedding label-QA
    "graph_components",
    "interval_join",
    "rrf_fusion",
    "window_funnel",
    "embed_outliers",
    # r8 batch 3: per-domain curation cap and the blocking audit
    # (prefix-filter ground truth × LSH candidates — two dedup tiers in
    # one measurement query)
    "domain_cap",
    "lsh_quality",
    # r9: the sampled-ground-truth audit — the form that runs at 100 TB;
    # its gap vs lsh_quality's inline-exact truth is the measured payoff
    "blocking_quality_sampled",
    # r8 batch 5: the between-epoch dataloader shuffle as an operator
    "epoch_order",
    # r10: DSIR importance selection + the deterministic MG heavy-hitters
    # summary — tracked from birth
    "dsir_select",
    "mg_summary",
    "dup_substring_rate",
    # r11: ExactSubstr removal, cluster-blocked semantic dedup, and the
    # KMV bottom-k sketch — tracked from birth
    "substring_dedup",
    "semdedup",
    "kmv_distinct",
    # r11 cont.: MMR diversified re-ranking over the exact-KNN tier
    "mmr_rerank",
    # r11 cont.: binary pHash near-dup (byte-gram SimHash, banded hamming)
    "multimodal_phash_dedup",
    # r11 cont.: synchronous LPA communities over the co-purchase graph
    "label_propagation",
    # r11 cont.: one-sided prefix-filter containment (the subset detector)
    "containment_pairs",
    # r11 cont.: RM3 feedback (two-pass BM25, data-dependent expansion)
    "rm3_feedback",
    # r11 cont.: l-diversity/t-closeness privacy census
    "l_diversity",
    # r12: SemDeDup behind the two-level coarse→fine quantizer — tracked
    # from birth (same effective k=16 as the semdedup entry)
    "semdedup_two_level",
    # r12: the published Gopher quality filter (row-local signals + the
    # repetition gram shuffle)
    "gopher_rules",
    # r13: the FineWeb/C4 line-quality gate (row-local + one
    # (doc_id, line) aggregate) and the temperature/cap mixture
    # water-filling (one corpus aggregate + domain-frame iteration) —
    # tracked from birth
    "fineweb_filters",
    "mixture_rebalance",
    # r13: the composed C4/FineWeb + Gopher + CCNet-bucket stack — the
    # heaviest text headliner by construction (three sub-operators over
    # the injected corpus); tracked from birth
    "quality_stack",
    # r13: cross-snapshot URL dedup (two map-side-combined aggregates)
    # and its incremental store-merge form (one full-outer MERGE)
    "snapshot_dedup",
    "snapshot_dedup_incremental",
    # r13: LSH candidates + banded-prefix Levenshtein verification
    "dedup_edit_verified",
    # r13: BPE tokenizer training (8 argmax/merge rounds over the
    # word vocabulary) and 2-core peeling (8 semi-join peel rounds)
    "bpe_train",
    "kcore",
    # r14: distributed BPE application (ordered-rule vocabulary fold +
    # positional join) and the true-tokenizer-token mixture rebalance —
    # tracked from birth
    "bpe_encode",
    "mixture_rebalance_bpe",
    # r15: exact per-language CCNet percentile buckets (lm_score + the
    # distinct-value histogram rank), corpus-wide duplicate-line
    # removal (one line-hash aggregate + keeper join + reassembly),
    # the vocabulary coverage/OOV curve (histogram-of-counts, no token
    # sort) and per-chunk language-mix auditing — tracked from birth
    "ccnet_buckets_pct",
    "line_dedup",
    "vocab_coverage",
    "lang_mix_audit",
    # r15 cont.: per-doc novel-8-gram rate (positional gram keeper join
    # — the heaviest of the six by construction) and the packing-layout
    # audit (one rollup over the pack coordinates)
    "ngram_novelty",
    "packing_efficiency",
    # r15 cont.: per-source contamination rates (broadcast gram probe
    # + one source rollup) and per-doc unigram entropy (one token
    # aggregate + doc rollup on the portable integer log)
    "contamination_report",
    "token_entropy",
    # r16: the published maximal-span ExactSubstr removal (substring
    # dedup's gram aggregate + row-local islands) and the quality-aware
    # fuzzy cluster keeper (LSH + star CC + min-struct argmax) — tracked
    # from birth
    "substring_dedup_spans",
    "dedup_fuzzy_keep_best",
    # r16 cont.: MinHash-LSH fuzzy eval decontamination (broadcast bench
    # band probe + exact-Jaccard verify) and the per-source boilerplate
    # census (distinct line pass + min-struct argmax) — tracked from birth
    "decontaminate_fuzzy",
    "boilerplate_report",
    # r16 cont.: duplicate-cluster size distribution (lsh+star + two
    # map-side aggregates) — tracked from birth. NOTE (ADVICE r16):
    # dedup_fuzzy_keep_best, dedup_cluster_census, and (r17)
    # dedup_fuzzy_canonicalize each rebuild the shared
    # MinHash+LSH+star-contraction substrate from scratch (they are
    # independent oracle entries by design), so the headline total
    # multi-counts that ~5-6 s substrate; read their deltas, not their
    # sum, when adjudicating movers in this family.
    "dedup_cluster_census",
    # r17: the fuzzy tier's corpus-out form (keep_best + survivors
    # rejoin) and the per-source fuzzy-contamination rollup
    # (decontaminate_fuzzy + source attach + |sources|-row aggregate)
    # — tracked from birth
    "dedup_fuzzy_canonicalize",
    "contamination_fuzzy_report",
    # r17 cont.: paper-exact ExactSubstr span verification (the family
    # gram aggregate + the island-gram occurrence join) and the
    # cross-source near-dup matrix (banded-verify pairs + broadcast
    # source attaches) — tracked from birth
    "substring_dedup_spans_verified",
    "source_neardup_matrix",
    # r8 batch 6: the second-order path census
    "event_paths",
    "match_cascade",
    "s8_upsert",
    "sync_summary",
    "sync_pipeline",
    "sync_merge_resync",
]


CALIB_ROWS = 2_000_000_000  # ~2 s quiet on 32 cores — long enough to
# average over scheduling noise, short enough to not bill the bench

# Scaling sentinel (r18, VERDICT r17 item 2). A PURE-SHUFFLE probe:
# every row crosses one hash exchange (no giant aggregation hash maps —
# a high-cardinality groupBy form was tried first and spill-stormed),
# then a two-phase xor fold reduces each side to one row. Constants are
# part of the round-over-round contract — never change them.
SENTINEL_ROWS = 100_000_000  # ~4-5 s quiet at 32 cores, ~4x that at 8 —
# large enough that the exchange dominates scheduling, small enough not
# to materially lengthen the driver's low-core bench pass
SENTINEL_PARTS = 64


def _scale_sentinel(spark, runs: int = 2) -> float:
    """Shuffle-bound scaling probe — the parallelism complement of the
    compute-bound ``_calibration`` fold (VERDICT r17 item 2: at sf0.1
    every headliner is scheduling/overhead-bound — the r17 driver pair
    measured the 8-core bench BEATING the 32-core one — so the headline
    total cannot see parallelism wins at all). Every row crosses one
    hash exchange (map-side serialize+compress+write, reduce-side fetch
    +decompress are the dominant, fully parallel costs), so comparing
    "sent" across the driver's c32 and c8 runs yields a ratio near the
    core ratio when the engine scales and near 1 when something
    serializes. Synthetic by design (spark.range, exactly like calib):
    fully deterministic, reads no tables, persists nothing, and is NOT
    included in "value" — it measures the box + engine, not a query.
    The partition keys are deterministic (pmod of xxhash64 — never
    rand(), the §2.5 retry hazard).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        spark.range(SENTINEL_ROWS).repartition(
            SENTINEL_PARTS, F.expr("pmod(xxhash64(id), 1000000)")
        ).selectExpr("bit_xor(xxhash64(id))").collect()
        best = min(best, time.time() - t0)
    return best


def _calibration(spark, runs: int = 3) -> float:
    """Contention index (BENCH_r14 onward, VERDICT r13 item 3): a FIXED
    compute-bound probe — xxhash64 fold over a 2B-row range, pure
    whole-stage codegen, no shuffle, no IO, independent of every
    operator — timed with the same min-of-runs rule. Its round-over-
    round ratio separates ambient CPU-steal from code regressions: if
    calib moved with a family of md5/regex-bound queries, the artifact
    is reading the hypervisor, not the engine."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        # bit_xor, not sum: CALIB_ROWS (2B) full-range hashes overflow
        # a BIGINT sum under ANSI; xor is overflow-free and still
        # forces every hash to be computed. CALIB_ROWS is part of the
        # round-over-round contract — never change it.
        spark.range(CALIB_ROWS).selectExpr(
            "bit_xor(xxhash64(id))"
        ).collect()
        best = min(best, time.time() - t0)
    return best


def _run_once(spark, name: str, qs, sf_dir: str) -> None:
    if name == "match_cascade":
        # timed honestly: drop the memoized table and rebuild it from the
        # current catalog, forcing the persist with a count
        from tepsonic_database_sync_spark.fixtures import build_fixtures
        from tepsonic_database_sync_spark.plans.sync import (
            cached_matched,
            invalidate_match_cache,
        )

        invalidate_match_cache(spark)
        fx = build_fixtures(spark, sf_dir)
        cached_matched(spark, sf_dir, fx["vendor_items"], fx["admin_products"]).count()
        return
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # generous heap: the collect_list-heavy sync queries otherwise leave
    # GC pressure that skews timings of later headline queries
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(app_name="bench", cpus=cpus)
    spark.range(1).count()
    # JIT/codegen warm-up on the tiny sf — same code, different data; the
    # bench-sf inputs and caches are deliberately NOT primed here
    try:
        from tepsonic_database_sync_spark.plans.sync import (
            invalidate_match_cache,
            run_flagship,
        )

        run_flagship(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        invalidate_match_cache(spark)
    except Exception as ex:  # noqa: BLE001
        print(f"WARM-UP FAILED ({type(ex).__name__}: {ex}) — timings are colder",
              file=sys.stderr)

    qs = registry.queries()
    # min-of-3: this VM shows multi-x CPU-steal spikes (observed 4.6s /
    # 42s / 8.0s for byte-identical plans); two samples aren't enough to
    # reliably catch a steal-free window
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # the ITERATIVE-GRAPH entries get two extra samples (min-of-5):
    # their many short scheduling-bound stages amplify steal — pagerank
    # measured a 3.3× same-plan spread inside one quiet session
    # (SCALE.md r12), which made the official min-of-3 read (8.35 s vs
    # the isolated 5.8-s class) uninterpretable round-over-round
    # (VERDICT r12 item 3)
    extra = {
        "pagerank": 2,
        "bfs_hops": 2,
        "graph_components": 2,
        "label_propagation": 2,
        "triangle_stats": 2,
    }
    calib_pre = _calibration(spark)
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        if name != "match_cascade" and name not in qs:
            continue
        best = float("inf")
        for i in range(runs + extra.get(name, 0)):
            t0 = time.time()
            _run_once(spark, name, qs, sf_dir)
            dt = time.time() - t0
            if i == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
            # stabilize: don't let one query's GC debt bill the next one.
            # r17: collect PYTHON garbage first — dead DataFrame wrappers
            # hold py4j references to JVM plans and checkpointed RDD
            # blocks; without the Python pass the JVM gc below cannot
            # release them and checkpoint storage accumulates across the
            # 135-query session (measured: multi-GB by mid-bench)
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        warm[name] = round(best, 3)

    # Full detail (3-decimal warm + cold) goes to BENCH_DETAIL.json in
    # the repo; the FINAL stdout line must stay compact — BENCH_r07's
    # artifact was truncated mid-line by the driver's bounded tail
    # capture (parsed: null), so warm+cold in one line is too long.
    calib_post = _calibration(spark)
    sentinel = _scale_sentinel(spark)
    ran = list(warm)  # HEADLINE order, filtered to what actually ran
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(warm.values()), 3),
        "value_cold": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        # the stdout line's positional array is aligned with this list
        # (and with bench.py's HEADLINE constant at the recorded commit)
        "q_names": ran,
        "sf": sf,
        "runs": runs,
        # contention index: min-of-3 fixed xxhash64 fold, taken before
        # and after the headline loop — compare across rounds; queries
        # are NOT included in "value"
        "calib_pre": round(calib_pre, 3),
        "calib_post": round(calib_post, 3),
        # shuffle-bound scaling sentinel (r18): compare across the
        # driver's c32/c8 runs — NOT included in "value"
        "scale_sentinel": {
            "rows": SENTINEL_ROWS,
            "parts": SENTINEL_PARTS,
            "sec": round(sentinel, 3),
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    # Output scheme (r16 onward, VERDICT r15 item 2): the driver records
    # only the last 2000 bytes of stdout, and the old named per-query
    # dict (~25 bytes/entry) stopped fitting once HEADLINE passed ~75
    # queries — BENCH_r15 elided 48 of 126 entries, degrading the
    # round-over-round per-query comparability the adjudication
    # discipline depends on. The line now carries the FULL map as a
    # positional 2-decimal array "q" aligned with the HEADLINE order as
    # run (recorded verbatim as "q_names" in BENCH_DETAIL.json and
    # fingerprinted here as "qh" = first 8 hex of sha256 of the
    # comma-joined names, so the judge can verify alignment against the
    # committed bench.py). ~6 bytes/entry → 126 queries ≈ 850 bytes,
    # inside the tail with room for growth. Key order still matters:
    # headline totals sit at the END of the object so a truncated head
    # can never lose "value"/"value_cold" (VERDICT r8 item 3).
    import hashlib

    qh = hashlib.sha256(",".join(ran).encode()).hexdigest()[:8]
    out = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "qn": len(ran),
        "qh": qh,
        "q": [round(warm[k], 2) for k in ran],
        "queries_elided": 0,
        "sf": sf,
        "detail": "BENCH_DETAIL.json",
        "calib": round(min(calib_pre, calib_post), 2),
        # r18: shuffle-bound scaling sentinel (min-of-2, sec) — its
        # c8/c32 ratio is the parallelism check the headline total
        # cannot provide at sf0.1; never part of "value"
        "sent": round(sentinel, 2),
        "value_cold": round(sum(cold.values()), 3),
        "value": round(sum(warm.values()), 3),
    }
    # safety valve: if the array form ever outgrows the tail (it would
    # take ~300 headliners), drop to 1-decimal before eliding anything;
    # if THAT still overflows (~450 headliners), elide from the FRONT of
    # the array with an honest count — the driver's 2000-byte tail keeps
    # the END of the line, so front-elision preserves qn/qh/totals and
    # the kept entries stay aligned with the TAIL of q_names
    # (ADVICE r16 item 1: the old single re-encode could still overflow
    # and let the tail capture truncate the head silently).
    budget = 1900
    encoded = json.dumps(out, separators=(",", ":"))
    if len(encoded) > budget:
        out["q"] = [round(warm[k], 1) for k in ran]
        encoded = json.dumps(out, separators=(",", ":"))
    while len(encoded) > budget and out["q"]:
        drop = max(1, (len(encoded) - budget) // 6)
        out["q"] = out["q"][drop:]
        out["queries_elided"] = len(ran) - len(out["q"])
        encoded = json.dumps(out, separators=(",", ":"))
    print(encoded)


if __name__ == "__main__":
    main()

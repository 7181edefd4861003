"""Scale-stress smoke: run the flagship pipeline on synthetically
amplified fact data (lineitem × N with shifted keys) and report how wall
time grows. The point is shape, not absolute numbers: the sync pipeline
must scale ~linearly in fact rows (catalog-bounded join sides, one
aggregation pass) — a quadratic regression (e.g. an accidental cross
join) shows up immediately as super-linear growth.

Writes nothing outside /tmp; testdata stays read-only.

Usage: python scripts/scale_smoke.py [factors...]   (default: 1 2 4 8)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark.fixtures import admin_products, vendor_items
from tepsonic_database_sync_spark.io import load_table
from tepsonic_database_sync_spark.plans.sync import sync_options

SF = "/root/testdata/sf0.1"


def amplified(spark, factor: int):
    """lineitem × factor with order keys shifted per copy (distinct item
    ids, same join/grouping distribution — amplifies rows, not skew)."""
    li = load_table(spark, SF, "lineitem")
    p = load_table(spark, SF, "part")
    shift = 10_000_000
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return vendor_items(out, p), admin_products(p)


def amplified_docs(spark, factor: int):
    """documents × factor with doc_id shift and a per-copy suffix on
    EVERY token, so no shingle is shared across copies — copies of the
    same doc must not be near-dups of each other, or LSH candidate pairs
    grow quadratically in the factor BY CONSTRUCTION (every copy
    collides with every other) and the smoke measures the synthetic
    data, not the algorithm. Within-copy near-dup structure (the real
    corpus's) is preserved, so pair counts scale linearly."""
    d = load_table(spark, SF, "documents")
    shift = 10_000_000
    copies = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift)).withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{i}")
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _doc_ops(docs, factor: int = 1):
    """The doc-side operators whose scale shape matters most: repetition
    rules (gram shuffle), MinHash-LSH pairs (banded equi-join),
    star-contraction clustering (O(log²) rounds over the pair graph),
    and the sampled blocking audit at CONSTANT TARGET SAMPLE SIZE
    (sample_permille ∝ 1/factor — how a deployment actually picks it:
    hold n_true in the hundreds as the corpus grows; the audit's wall
    time should then be ~FLAT, because its quadratic term runs on the
    fixed-size sample and only the hash-filter scan grows with the
    corpus)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        PREFIX_TAU_PERMILLE,
        blocking_quality_sampled,
        connected_components_star,
        jaccard_pairs_prefix,
        lsh_candidate_pairs,
        minhash_sig_array,
        substring_dedup,
    )
    from tepsonic_database_sync_spark.operators.text import repetition_stats

    def run_repetition():
        repetition_stats(docs).write.format("noop").mode("overwrite").save()

    def run_substring_dedup():
        # the exact ExactSubstr removal: gram aggregation is the cost;
        # per-copy token suffixes keep duplication within-copy, so work
        # should scale ~linearly (no cross-copy gram collisions)
        substring_dedup(docs, n=8).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_substring_dedup_spans():
        # the published maximal-span rule: same gram aggregation as
        # substring_dedup plus row-local islands — the curve should sit
        # ON substring_dedup's (the islands pass adds no shuffle)
        from tepsonic_database_sync_spark.operators.dedup import (
            substring_dedup_spans,
        )

        substring_dedup_spans(docs, n=8, min_span=50).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_substring_spans_verified():
        # r17: paper-exact per-span verbatim verification — the family's
        # shared gram aggregate (canon localCheckpointed, consumed by
        # both the removal chain and the occurrence index) plus the
        # island-gram occurrence join; the curve should track
        # substring_dedup's shape with a roughly constant factor for
        # the second gram-keyed join
        from tepsonic_database_sync_spark.operators.dedup import (
            substring_dedup_spans_verified,
        )

        substring_dedup_spans_verified(docs, n=8, min_span=50).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_lsh_clusters():
        pairs = lsh_candidate_pairs(minhash_sig_array(docs)).localCheckpoint(
            eager=True
        )
        nodes = docs.select(F.col("doc_id").alias("node"))
        connected_components_star(pairs, nodes).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_fuzzy_keep_best():
        # quality-aware fuzzy keeper: dominated by the lsh+star cost
        # above; the added quality join + min-struct argmax should be
        # curve-invisible
        from tepsonic_database_sync_spark.operators.dedup import (
            fuzzy_keep_best,
        )

        fuzzy_keep_best(docs).write.format("noop").mode("overwrite").save()

    def run_decontaminate_fuzzy():
        # fuzzy eval decontamination: bench = perturbed 5% slice (grows
        # with the corpus here, worst case — production bench sides are
        # fixed-size); the train side streams through one broadcast
        # band probe + verify
        from tepsonic_database_sync_spark.functions.hashing import h60
        from tepsonic_database_sync_spark.operators.dedup import (
            decontaminate_fuzzy,
        )

        bench = docs.filter(
            h60(F.concat(F.lit("fz:"), F.col("doc_id").cast("string")))
            % 100
            < 5
        ).select(
            (F.col("doc_id") + 20000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzeval")).alias("text"),
        )
        decontaminate_fuzzy(docs, bench, tau_permille=950).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_boilerplate_report():
        # per-source boilerplate census over the footer-injected corpus
        # (the registry's injection, scaled): 40% of docs in half the
        # sources get a source footer line
        from tepsonic_database_sync_spark.functions.hashing import h60
        from tepsonic_database_sync_spark.operators.dedup import (
            boilerplate_report,
        )

        inj = (
            h60(F.concat(F.lit("bp:"), F.col("doc_id").cast("string")))
            % 100
            < 40
        ) & (h60(F.concat(F.lit("bps:"), F.col("source"))) % 2 == 0)
        corpus = docs.withColumn(
            "text",
            F.when(
                inj,
                F.concat(
                    F.col("text"),
                    F.lit(chr(10) + "standard footer for "),
                    F.col("source"),
                ),
            ).otherwise(F.col("text")),
        )
        boilerplate_report(corpus).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_cluster_census():
        # cluster-size census: the lsh+star substrate plus two map-side
        # aggregates and a broadcast 1-row total — should sit on the
        # lsh+star curve
        from tepsonic_database_sync_spark.operators.dedup import (
            dedup_cluster_census,
        )

        dedup_cluster_census(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_source_neardup_matrix():
        # r17: cross-source near-dup matrix — the banded-verify pair
        # substrate plus two broadcast source attaches and one
        # |sources|²-bounded rollup; the curve should track the
        # banded-pairs family
        from tepsonic_database_sync_spark.operators.dedup import (
            source_neardup_matrix,
        )

        source_neardup_matrix(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_fuzzy_canonicalize():
        # r17: corpus-out fuzzy tier — fuzzy_keep_best's substrate plus
        # ONE survivors equi-join on doc_id; the curve should sit a
        # near-constant sliver above fuzzy_keep_best's at both factors
        from tepsonic_database_sync_spark.operators.dedup import (
            fuzzy_canonicalize,
        )

        fuzzy_canonicalize(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_contamination_fuzzy_report():
        # r17: per-source fuzzy-contamination rollup — decontaminate_
        # fuzzy's plan (same worst-case corpus-growing bench side) plus
        # the source attach and one |sources|-row aggregate; the curve
        # should sit ON decontaminate_fuzzy's
        from tepsonic_database_sync_spark.functions.hashing import h60
        from tepsonic_database_sync_spark.operators.dedup import (
            contamination_fuzzy_report,
        )

        bench = docs.filter(
            h60(F.concat(F.lit("fz:"), F.col("doc_id").cast("string")))
            % 100
            < 5
        ).select(
            (F.col("doc_id") + 20000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzeval")).alias("text"),
        )
        contamination_fuzzy_report(
            docs, bench, tau_permille=950
        ).write.format("noop").mode("overwrite").save()

    def run_blocking_audit():
        # PREFIX_TAU_PERMILLE is the shared constant from operators.dedup
        # (the registry re-exports it) — one source of truth, and this
        # script never compiles the 183-entry registry
        blocking_quality_sampled(
            docs,
            lambda d: jaccard_pairs_prefix(d, tau_permille=PREFIX_TAU_PERMILLE),
            lambda d: lsh_candidate_pairs(minhash_sig_array(d)),
            sample_permille=max(1, 250 // factor),
        ).write.format("noop").mode("overwrite").save()

    def run_containment():
        # one-sided prefix filter: per-copy token suffixes mean zero
        # cross-copy gram collisions, so candidates (and wall) should
        # scale ~linearly; super-linear growth = the uncapped b-side
        # posting join binding (the documented trade)
        from tepsonic_database_sync_spark.operators.dedup import (
            containment_pairs,
        )

        containment_pairs(docs).write.format("noop").mode("overwrite").save()

    def run_prefix_full():
        # FULL-corpus AllPairs prefix filter — the r12 unhinting probe:
        # the df attach lost its vocabulary-scaled broadcast hint (the
        # measured containment failure class), so this curve certifies
        # no factor-1 regression and no super-linear term at 8× under
        # AQE-chosen strategy. Per-copy token suffixes keep similarity
        # within-copy → candidates scale linearly by construction.
        jaccard_pairs_prefix(
            docs, tau_permille=PREFIX_TAU_PERMILLE
        ).write.format("noop").mode("overwrite").save()

    def run_token_pmi():
        # same unhinting probe for the PMI unigram lexicon attaches
        # (two post-aggregate joins, previously hint-forced broadcasts)
        from tepsonic_database_sync_spark.operators.text import token_pmi

        token_pmi(docs).write.format("noop").mode("overwrite").save()

    def run_lm_score():
        # the r13 A/B probe for the LAST vocabulary-scaled broadcast
        # hint (VERDICT r12 item 1): the unigram-lexicon attach onto
        # the bigram stream. Per-copy token suffixes make each copy's
        # vocabulary disjoint, so the lexicon grows ∝ factor — exactly
        # the regime where a forced broadcast went super-linear in
        # containment_pairs.
        from tepsonic_database_sync_spark.operators.text import lm_score

        lm_score(docs).write.format("noop").mode("overwrite").save()

    def run_fineweb():
        # r13: row-local signals + ONE (doc_id, line) aggregate — the
        # curve should track repetition's linear shape with a smaller
        # constant (one gram kind instead of three)
        from tepsonic_database_sync_spark.operators.text import (
            fineweb_filters,
        )

        fineweb_filters(docs).write.format("noop").mode("overwrite").save()

    def run_quality_stack():
        # r13: the composed gate — three sub-operator branches over one
        # corpus; cost ≈ gopher(=repetition) + fineweb + lm_score
        from tepsonic_database_sync_spark.operators.text import quality_stack

        quality_stack(docs).write.format("noop").mode("overwrite").save()

    def run_mixture_rebalance():
        # r13: one corpus token-count aggregate + domain-frame
        # water-filling — should be the flattest curve here
        from tepsonic_database_sync_spark.operators.sampling import (
            mixture_rebalance,
        )

        mixture_rebalance(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_edit_verified():
        # r13: LSH candidates + bounded-prefix Levenshtein — per-copy
        # token suffixes keep candidates within-copy, so pair count
        # (and the DP work riding on it) scales linearly
        from tepsonic_database_sync_spark.operators.dedup import (
            edit_verified_pairs,
        )

        edit_verified_pairs(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_bpe_train():
        # r13: per-copy token suffixes multiply the WORD VOCABULARY by
        # the factor — exactly the state this op iterates on — while
        # the corpus word-count scan grows linearly; both terms should
        # stay comfortably sub-linear
        from tepsonic_database_sync_spark.operators.text import bpe_train

        bpe_train(docs).write.format("noop").mode("overwrite").save()

    def run_snapshot_dedup():
        # r13: two snapshots synthesized from the amplified corpus
        # (second revises every 4th url) — two map-side-combined
        # aggregates, linear by construction
        from tepsonic_database_sync_spark.operators.dedup import (
            snapshot_dedup,
        )

        d = docs.select("doc_id", "text")
        caps = d.select(
            F.col("doc_id").alias("url"),
            F.lit(0).cast("long").alias("snapshot_id"),
            "text",
        ).unionByName(
            d.select(
                F.col("doc_id").alias("url"),
                F.lit(1).cast("long").alias("snapshot_id"),
                F.when(
                    F.col("doc_id") % 4 == 0,
                    F.concat(F.col("text"), F.lit(" rev one")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
        )
        snapshot_dedup(caps).write.format("noop").mode("overwrite").save()

    def run_phash():
        # byte-gram SimHash + banded hamming over assets derived from
        # the amplified docs: per-copy suffixes perturb payload bytes,
        # so band collisions stay within-copy and pairs scale linearly
        from tepsonic_database_sync_spark.operators.multimodal import (
            phash_neardup_pairs,
            synth_assets,
        )

        phash_neardup_pairs(synth_assets(docs)).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_bpe_encode():
        # r14: per-copy token suffixes multiply the distinct-word
        # vocabulary (the fold substrate) by the factor while the
        # positional occurrence join grows linearly — both terms
        # should stay sub-linear; super-linear growth = the vocabulary
        # join degenerating (the unhinted-attach probe, lm_score's
        # regime)
        from tepsonic_database_sync_spark.operators.text import (
            bpe_encode,
            bpe_train,
        )

        bpe_encode(docs, bpe_train(docs)).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_mixture_bpe():
        # r14: bpe_encode counts → domain sum → waterfill; the curve
        # should track bpe_encode's (the waterfill tail is domain-frame
        # arithmetic)
        from tepsonic_database_sync_spark.operators.sampling import (
            mixture_waterfill,
        )
        from tepsonic_database_sync_spark.operators.text import (
            bpe_encode,
            bpe_train,
        )

        enc = bpe_encode(docs, bpe_train(docs))
        counts = (
            docs.select("doc_id", (F.col("doc_id") % 7).alias("domain"))
            .join(enc.select("doc_id", "n_bpe_tokens"), "doc_id")
            .groupBy("domain")
            .agg(F.sum("n_bpe_tokens").cast("long").alias("n_tokens"))
        )
        mixture_waterfill(counts).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_ccnet_pct():
        # r15: lm_score + the (lang, avg_nll) histogram + a window over
        # DISTINCT per-language values + the value-key join back —
        # per-copy token suffixes grow the lexicon ∝ factor (lm_score's
        # stress regime) while the distinct (lang, nll) histogram stays
        # bounded by the score space; the curve should track lm_score
        from tepsonic_database_sync_spark.operators.text import (
            ccnet_buckets_pct,
        )

        d = docs.withColumn("lang", (F.col("doc_id") % 5).cast("string"))
        ccnet_buckets_pct(d).write.format("noop").mode("overwrite").save()

    def run_line_dedup():
        # r15: per-copy token suffixes make every line unique across
        # copies, so the line-key aggregate and the keeper join grow
        # linearly with zero cross-copy collisions (the honest regime:
        # a real corpus's boilerplate CONCENTRATES keys, which the
        # map-side min-struct combine absorbs by construction)
        from tepsonic_database_sync_spark.operators.dedup import line_dedup

        line_dedup(docs).write.format("noop").mode("overwrite").save()

    def run_vocab_coverage():
        # r15: the unigram aggregate grows ∝ factor (suffixes multiply
        # the type space) while the histogram-of-counts window input
        # stays tiny — the flattest possible tail after the count scan
        from tepsonic_database_sync_spark.operators.text import (
            vocab_coverage,
        )

        vocab_coverage(docs).write.format("noop").mode("overwrite").save()

    def run_ngram_novelty():
        # r15: positional 8-gram keeper join — per-copy token suffixes
        # keep gram reuse within-copy, so the gram aggregate and the
        # keeper join grow linearly (the substring_dedup regime; this
        # op shares its gram generator)
        from tepsonic_database_sync_spark.operators.dedup import (
            ngram_novelty,
        )

        ngram_novelty(docs).write.format("noop").mode("overwrite").save()

    def run_packing_efficiency():
        # r15: per-shard cumsum + ONE shard rollup — should be among
        # the flattest curves (pack_sequences' shape plus an aggregate)
        from tepsonic_database_sync_spark.operators.packing import (
            pack_sequences,
            packing_efficiency,
        )

        packing_efficiency(pack_sequences(docs)).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_contamination_report():
        # r15: the decontaminate broadcast-probe shape + one source
        # rollup; per-copy suffixes keep bench-gram hits within-copy,
        # so the probe scan grows linearly and the rollup stays
        # |sources|-row
        from tepsonic_database_sync_spark.operators.dedup import (
            contamination_report,
        )

        d = docs.withColumn("source", (F.col("doc_id") % 7).cast("string"))
        contamination_report(d).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_token_entropy():
        # r15: one (doc_id, token) aggregate + doc rollup — linear by
        # construction; the probe certifies no hidden join/window crept in
        from tepsonic_database_sync_spark.operators.text import (
            token_entropy,
        )

        token_entropy(docs).write.format("noop").mode("overwrite").save()

    def run_lang_mix():
        # r15: chunk generator + row-local lang-ID + two map-side
        # combined aggregates — should track fineweb's linear shape
        from tepsonic_database_sync_spark.operators.text import (
            lang_mix_audit,
        )

        lang_mix_audit(docs).write.format("noop").mode("overwrite").save()

    return {
        "text_repetition": run_repetition,
        "substring_dedup": run_substring_dedup,
        "substring_spans": run_substring_dedup_spans,
        "spans_verified": run_substring_spans_verified,
        "ccnet_buckets_pct": run_ccnet_pct,
        "line_dedup": run_line_dedup,
        "vocab_coverage": run_vocab_coverage,
        "lang_mix_audit": run_lang_mix,
        "ngram_novelty": run_ngram_novelty,
        "packing_efficiency": run_packing_efficiency,
        "contamination_report": run_contamination_report,
        "token_entropy": run_token_entropy,
        "lsh+star_clusters": run_lsh_clusters,
        "fuzzy_keep_best": run_fuzzy_keep_best,
        "decontaminate_fuzzy": run_decontaminate_fuzzy,
        "boilerplate_report": run_boilerplate_report,
        "cluster_census": run_cluster_census,
        "fuzzy_canonicalize": run_fuzzy_canonicalize,
        "contam_fuzzy_report": run_contamination_fuzzy_report,
        "src_neardup_matrix": run_source_neardup_matrix,
        "blocking_audit(n≈const)": run_blocking_audit,
        "containment_pairs": run_containment,
        "prefix_pairs_full": run_prefix_full,
        "token_pmi": run_token_pmi,
        "lm_score": run_lm_score,
        "fineweb_filters": run_fineweb,
        "quality_stack": run_quality_stack,
        "mixture_rebalance": run_mixture_rebalance,
        "snapshot_dedup": run_snapshot_dedup,
        "bpe_train": run_bpe_train,
        "bpe_encode": run_bpe_encode,
        "mixture_bpe": run_mixture_bpe,
        "dedup_edit_verified": run_edit_verified,
        "phash_neardup": run_phash,
    }


def write_amplified_olap(spark, factor: int, dest: str) -> None:
    """Materialize an amplified sf-dir in /tmp: lineitem+orders × factor
    with consistently shifted order keys (joins stay 1:1 with the
    original distribution), events × factor with shifted user/event ids
    (user count scales, per-user stream shape preserved), dims copied
    as-is. Registry queries then run unmodified against the directory."""
    import os

    shift_o, shift_e, shift_u = 10_000_000, 10_000_000, 1_000_000

    def amplify(df, cols_shifts):
        copies = []
        for i in range(factor):
            c = df
            for col, s in cols_shifts:
                c = c.withColumn(col, F.col(col) + F.lit(i * s))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    li = load_table(spark, SF, "lineitem", fan_out=False)
    o = load_table(spark, SF, "orders", fan_out=False)
    ev = load_table(spark, SF, "events", fan_out=False)
    # file count scales with the factor (as on a real deployment, where
    # data volume brings input splits with it) so scan parallelism is an
    # honest function of data size, not an artifact of the 1-file source
    n_files = 8 * factor
    amplify(li, [("l_orderkey", shift_o)]).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "lineitem.parquet"))
    amplify(o, [("o_orderkey", shift_o)]).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "orders.parquet"))
    amplify(ev, [("event_id", shift_e), ("user_id", shift_u)]).repartition(
        n_files
    ).write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))
    # documents × factor with per-copy token suffixes (see amplified_docs:
    # copies must NOT be near-dups of each other or pair counts grow
    # quadratically by construction) — feeds the text/fingerprint ops
    amplified_docs(spark, factor).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest, "documents.parquet"))
    for t in ("part", "supplier", "nation", "region", "customer"):
        load_table(spark, SF, t, fan_out=False).write.mode("overwrite").parquet(
            os.path.join(dest, f"{t}.parquet")
        )


def _olap_ops():
    from tepsonic_database_sync_spark.registry import (
        q_chunk_dedup,
        q_class_balance,
        q_dedup_prefix_filter,
        q_event_anomaly,
        q_grouped_quantiles,
        q_interval_join,
        q_item_cooccur,
        q_match_fuzzy,
        q_pagerank,
        q_runtime_filter_join,
        q_sessionize_batch,
        q_snapshot_diff,
        q_stream_stream_join,
        q_tfidf_doc_sim,
        q_tpch_q9_profit,
        q_tpch_q21_waiting,
        q_window_funnel,
        q_winnow_overlap,
    )

    # NOT measured here, deliberately: q_pagerank / q_bfs_hops /
    # q_graph_components run on the DISTINCT part↔supplier or
    # co-purchase pair sets (copies collapse — or densify — under the
    # amplifier's orderkey-only shift), q_match_fuzzy /
    # q_runtime_filter_join are driven by the customer dim the amplifier
    # keeps fixed, and q_embed_outliers reads the unamplified embeddings
    # table — their curves would measure the harness, not the operator.
    _ = (q_pagerank, q_match_fuzzy, q_runtime_filter_join)
    return {
        # late-r7: the prefix-filtered similarity self-join — candidate
        # fan-out under the rare-first prefix is THE thing to watch
        "dedup_prefix_filter": q_dedup_prefix_filter,
        "tpch_q9_profit": q_tpch_q9_profit,
        "tpch_q21_waiting": q_tpch_q21_waiting,
        "sessionize_batch": q_sessionize_batch,
        # r6: the attribution join's batch analog — user_id equi-join with
        # a time-range residual; scales with events × per-user view density
        "stream_stream_join": q_stream_stream_join,
        # r7: the full-outer CDC diff (orders-sized both sides), the
        # histogram quantiles (distinct-value window), hourly spike
        # detection (window over buckets), and the capped fingerprint
        # self-join — the four new shapes whose scale curve matters
        "snapshot_diff": q_snapshot_diff,
        "grouped_quantiles": q_grouped_quantiles,
        "event_anomaly": q_event_anomaly,
        "winnow_overlap": q_winnow_overlap,
        # r8: basket self-join (pair count fixed, support scales — work
        # linear in rows), df-capped posting self-join (suffixed copies
        # keep dfs constant → linear), fingerprint-window chunk dedup,
        # bucketed interval join (activities fixed, incidents scale),
        # anchored funnel (users scale, per-user activity fixed), and
        # the per-class hash-order sort (classes fixed, rows scale)
        "item_cooccur": q_item_cooccur,
        "tfidf_doc_sim": q_tfidf_doc_sim,
        "chunk_dedup": q_chunk_dedup,
        "interval_join": q_interval_join,
        "window_funnel": q_window_funnel,
        "class_balance": q_class_balance,
    }


def _graph_ops(spark, factor: int):
    """Iterative graph ops over the ×factor-amplified part↔supplier
    graph (key-shifted disjoint copies: edges and nodes grow linearly,
    structure and DIAMETER stay constant — so round COUNT is fixed and
    the curve isolates per-round cost growth, which SCALE.md's r9
    profile showed is scheduling-bound locally; expect strongly
    sub-linear wall until per-round shuffles dominate)."""
    from tepsonic_database_sync_spark.operators.graph import bfs_hops, pagerank

    pairs = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    shift = 10_000_000
    copies = [
        pairs.select(
            (F.col("l_partkey") + F.lit(i * shift)).alias("pk"),
            (F.col("l_suppkey") + F.lit(i * shift)).alias("sk"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    p = F.concat(F.lit("p"), F.col("pk").cast("string"))
    s = F.concat(F.lit("s"), F.col("sk").cast("string"))
    edges = out.select(p.alias("src"), s.alias("dst")).unionAll(
        out.select(s.alias("src"), p.alias("dst"))
    ).localCheckpoint(eager=True)
    seeds = (
        out.filter(F.col("pk") % 97 == 0)
        .select(F.concat(F.lit("p"), F.col("pk").cast("string")).alias("node"))
        .distinct()
    )

    def run_pagerank():
        pagerank(edges).write.format("noop").mode("overwrite").save()

    def run_bfs():
        bfs_hops(edges, seeds).write.format("noop").mode("overwrite").save()

    return {"pagerank": run_pagerank, "bfs_hops": run_bfs}


def _skew_graph_ops(spark, factor: int):
    """HUB-SKEW graph amplification (VERDICT r9 item 7): ×factor
    key-shifted copies of the part↔supplier graph, but 10% of every
    copy's edges are REDIRECTED to one global hub node (id 0). Hub
    degree therefore grows linearly with the factor while every other
    node's degree stays constant — the disjoint-copy curve (SCALE.md
    r9) holds per-node load flat, so this is the complementary probe:
    what does one monster key cost the iterative ops?

    What each op does with the hub:
    - ``connected_components_star`` (the r10 window-star form): the
      window over partitionBy(u) co-locates the hub's whole
      neighborhood in ONE task — exactly the data the r9 join form
      also moved to one task, so the curve measures the engine's skew
      tax, not a regression introduced by the window rewrite. The hub
      also fuses all copies into one giant component, so round count
      can GROW with factor here (log of component size) — expected,
      part of the probe.
    - ``pagerank``: contributions aggregate per dst with partial
      aggregation (map-side combine), the skew-resilient shape — its
      curve should stay near the disjoint-copy one.
    """
    from tepsonic_database_sync_spark.operators.dedup import (
        connected_components_star,
    )
    from tepsonic_database_sync_spark.operators.graph import pagerank

    pairs = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    shift = 10_000_000
    supp_base = 5_000_000_000  # disjoint long ranges for the two sides
    copies = [
        pairs.select(
            (F.col("l_partkey") + F.lit(i * shift)).alias("pk"),
            (F.col("l_suppkey") + F.lit(supp_base + i * shift)).alias("sk"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    edges = out.select(
        F.col("pk").alias("a_id"),
        # 10% of edges from every copy land on the one global hub
        F.when(F.col("pk") % 10 == 0, F.lit(0))
        .otherwise(F.col("sk"))
        .alias("b_id"),
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("a_id").alias("node"))
        .unionByName(edges.select(F.col("b_id").alias("node")))
        .distinct()
    )
    hub_deg = edges.filter(F.col("b_id") == 0).count()
    print(f"  [skew factor {factor}] edges={edges.count()} hub_degree={hub_deg}")

    pr_edges = edges.select(
        F.col("a_id").cast("string").alias("src"),
        F.col("b_id").cast("string").alias("dst"),
    )

    def run_star():
        connected_components_star(edges, nodes).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_pagerank():
        pagerank(
            pr_edges.unionAll(
                pr_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        ).write.format("noop").mode("overwrite").save()

    def run_lpa():
        # synchronous LPA on the hub graph: the hub's (node, label)
        # mode count is one partial-aggregated group per label — round
        # count fixed, so wall should track edge count ~linearly even
        # at 473k hub degree
        from tepsonic_database_sync_spark.operators.graph import (
            label_propagation,
        )

        label_propagation(
            edges.select(
                F.col("a_id").alias("src"), F.col("b_id").alias("dst")
            ).unionAll(
                edges.select(
                    F.col("b_id").alias("src"), F.col("a_id").alias("dst")
                )
            )
        ).write.format("noop").mode("overwrite").save()

    return {
        "star_components": run_star,
        "pagerank_hub": run_pagerank,
        "lpa_hub": run_lpa,
    }


def _skew_join_ops(spark, factor: int):
    """The salted-family probe on HUB-SKEW relational data (the second
    half of VERDICT r9 item 7): events × factor with 30% of every
    copy's rows redirected to ONE hub user — the hot key grows linearly
    (30k → 30k·factor rows) while the dim side stays fixed. Measures
    the PLAIN shapes (AQE skew handling on) against the repo's salted
    operators on identical inputs; the salted outputs equal the plain
    ones by construction (that equality is the registry oracle), so
    this probe is pure wall-clock — where is the crossover where manual
    salting beats AQE, if anywhere at this scale?"""
    from tepsonic_database_sync_spark.operators.skew import (
        salted_join,
        salted_two_phase_agg,
    )

    ev = load_table(spark, SF, "events").select(
        "event_id",
        "user_id",
        (F.col("value") * 100).cast("long").alias("value_cents"),
    )
    shift = 50_000_000
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * shift)).alias("event_id"),
            F.when(F.col("event_id") % 10 < 3, F.lit(1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "value_cents",
        )
        for i in range(factor)
    ]
    fact = copies[0]
    for c in copies[1:]:
        fact = fact.unionByName(c)
    fact = fact.localCheckpoint(eager=True)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    hot = fact.filter(F.col("user_id") == 1).count()
    print(f"  [skewjoin factor {factor}] rows={fact.count()} hot_key_rows={hot}")

    def run_plain_join():
        fact.join(dim, "user_id").write.format("noop").mode("overwrite").save()

    def run_salted_join():
        salted_join(fact, dim, "user_id", n_salts=32).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_plain_agg():
        fact.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value_cents").alias("s")
        ).write.format("noop").mode("overwrite").save()

    def run_salted_agg():
        salted_two_phase_agg(
            fact, "user_id", n_salts=32, sum_cols=("value_cents",)
        ).write.format("noop").mode("overwrite").save()

    return {
        "join_plain(AQE)": run_plain_join,
        "join_salted(32)": run_salted_join,
        "agg_plain": run_plain_agg,
        "agg_salted(32)": run_salted_agg,
    }



def amplified_embeddings(spark, factor: int):
    """embeddings × factor for the SemDeDup scale smoke: vec_ids are
    INTERLEAVED (orig·factor + copy) so the kmeans lowest-id seed rule
    draws seeds from every copy, and each copy's vectors get a per-copy
    CYCLIC DIMENSION ROTATION — cosine is invariant under a permutation
    applied to both sides, so within-copy geometry (and its near-dup
    structure) is EXACTLY preserved, while cross-copy pairs compare
    differently-rotated vectors and land far below the 0.99 threshold.
    Same construction idea as amplified_docs' per-copy token suffixes:
    amplify rows, not near-dup structure."""
    e = load_table(spark, SF, "embeddings")
    copies = []
    for i in range(factor):
        c = e.select(
            (F.col("vec_id") * factor + F.lit(i)).alias("vec_id"),
            "label",
            "embedding",
        )
        r = i % 64
        if r:
            c = c.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {r + 1}, {64 - r}),"
                    f" slice(embedding, 1, {r}))"
                ),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _embed_ops(spark, emb, factor: int):
    """SemDeDup at scale, both cell policies: k ∝ corpus (the documented
    design rule — cluster population constant, pair cost Σ|cluster|²
    linear in the corpus) vs k FIXED (the trap — cluster population ∝
    corpus, pair cost quadratic). The gap between the two curves IS the
    rule's measured value."""
    from tepsonic_database_sync_spark.operators.similarity import semdedup

    def run_k_scaled():
        semdedup(emb, n_cells=16 * factor, iters=2).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_k_fixed():
        semdedup(emb, n_cells=16, iters=2).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_two_level():
        # the r12 escalation at the SAME effective k as semdedup_k∝N
        # (n_coarse·n_fine = 16·factor): assignment cost is
        # N·(n_coarse + n_fine) instead of N·k, so the gap between this
        # curve and semdedup_k∝N IS the two-level quantizer's value —
        # it should widen as the factor (and with it k) grows
        from tepsonic_database_sync_spark.operators.similarity import (
            semdedup_two_level,
        )

        semdedup_two_level(
            emb, n_coarse=4 * factor, n_fine=4, iters=2
        ).write.format("noop").mode("overwrite").save()

    return {
        "semdedup_k∝N": run_k_scaled,
        "semdedup_k16": run_k_fixed,
        "semdedup_2lvl_k∝N": run_two_level,
    }


def main() -> None:
    args = [
        a
        for a in sys.argv[1:]
        if a not in ("--docs", "--olap", "--graph", "--skew", "--embed")
    ]
    docs_mode = "--docs" in sys.argv[1:]
    embed_mode = "--embed" in sys.argv[1:]
    olap_mode = "--olap" in sys.argv[1:]
    graph_mode = "--graph" in sys.argv[1:]
    skew_mode = "--skew" in sys.argv[1:]
    if embed_mode:
        factors = [int(a) for a in args] or [1, 2, 4]
        spark = build_session(app_name="scale_smoke")
        spark.range(1).count()
        results: dict[str, list] = {}
        for f in factors:
            # hardened protocol (see docs mode): partitions sized to the
            # amplified corpus, WARM = min-of-2 with a GC nudge
            spark.conf.set("spark.sql.shuffle.partitions", str(32 * f))
            emb = amplified_embeddings(spark, f).localCheckpoint(eager=True)
            for name, run in _embed_ops(spark, emb, f).items():
                dt = float("inf")
                for _ in range(2):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    run()
                    dt = min(dt, time.time() - t0)
                results.setdefault(name, []).append((f, dt))
                f0, base = results[name][0]
                print(
                    f"{name:18s} factor {f:2d}: {dt:6.2f}s  "
                    f"vs linear×{f}: {dt/(base*f/f0):.2f}"
                )
        return
    if skew_mode:
        factors = [int(a) for a in args] or [1, 2, 4, 8]
        spark = build_session(app_name="scale_smoke")
        spark.range(1).count()
        results: dict[str, list] = {}
        for f in factors:
            for name, run in {
                **_skew_graph_ops(spark, f),
                **_skew_join_ops(spark, f),
            }.items():
                t0 = time.time()
                run()
                dt = time.time() - t0
                results.setdefault(name, []).append((f, dt))
                f0, base = results[name][0]
                print(
                    f"{name:18s} factor {f:2d}: {dt:6.2f}s  "
                    f"vs linear×{f}: {dt/(base*f/f0):.2f}"
                )
        return
    if graph_mode:
        factors = [int(a) for a in args] or [1, 2, 4, 8]
        spark = build_session(app_name="scale_smoke")
        spark.range(1).count()
        results: dict[str, list] = {}
        for f in factors:
            # same hardened protocol as docs mode: partitions sized to
            # the amplified edge list, WARM = min-of-2 with a GC nudge
            spark.conf.set("spark.sql.shuffle.partitions", str(32 * f))
            for name, run in _graph_ops(spark, f).items():
                dt = float("inf")
                for _ in range(2):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    run()
                    dt = min(dt, time.time() - t0)
                results.setdefault(name, []).append((f, dt))
                f0, base = results[name][0]
                print(
                    f"{name:18s} factor {f:2d}: {dt:6.2f}s  "
                    f"vs linear×{f}: {dt/(base*f/f0):.2f}"
                )
        return
    if olap_mode:
        import tempfile

        factors = [int(a) for a in args] or [1, 2, 4]
        spark = build_session(app_name="scale_smoke")
        spark.range(1).count()
        results: dict[str, list] = {}
        with tempfile.TemporaryDirectory() as root:
            for f in factors:
                dest = f"{root}/f{f}"
                write_amplified_olap(spark, f, dest)
                for name, q in _olap_ops().items():
                    best = float("inf")
                    for _ in range(2):  # min-of-2: first run absorbs JIT
                        t0 = time.time()
                        q(spark, dest).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        best = min(best, time.time() - t0)
                    results.setdefault(name, []).append((f, best))
                    f0, base = results[name][0]
                    # normalize by the FIRST MEASURED factor so the ratio is
                    # right even when factors don't start at 1 (ADVICE r5)
                    print(
                        f"{name:18s} factor {f:2d}: {best:6.2f}s  "
                        f"vs linear×{f}: {best/(base*f/f0):.2f}"
                    )
        return
    factors = [int(a) for a in args] or [1, 2, 4, 8]
    spark = build_session(app_name="scale_smoke")
    spark.range(1).count()
    if docs_mode:
        results: dict[str, list] = {}
        for f in factors:
            # size shuffle partitions to the data (the deployment
            # practice the operators document): at fixed 32 partitions
            # the 8×-amplified gram joins exceed per-partition memory
            # and SPILL — measured 75 s warm vs 8.8 s at 128 partitions
            # for containment_pairs. Runtime conf, so the same session
            # re-sizes per factor exactly as AQE's initialPartitionNum
            # would on a cluster.
            spark.conf.set("spark.sql.shuffle.partitions", str(32 * f))
            docs = amplified_docs(spark, f).localCheckpoint(eager=True)
            # SMOKE_ONLY=name1,name2 runs a subset (iterating on one
            # operator's curve without paying the whole family)
            only = os.environ.get("SMOKE_ONLY")
            ops = _doc_ops(docs, f)
            if only:
                ops = {k: v for k, v in ops.items() if k in only.split(",")}
            for name, run in ops.items():
                # bench protocol: GC nudge (checkpoint-block debt must
                # not bill the next op) and WARM = min of 2 — this VM's
                # hypervisor steal was measured at 3-9× on identical
                # configs (containment factor 8: 8.1-75 s across runs of
                # the same plan), so single-shot curves are noise
                dt = float("inf")
                for _ in range(2):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.time()
                    run()
                    dt = min(dt, time.time() - t0)
                results.setdefault(name, []).append((f, dt))
                f0, base = results[name][0]
                print(
                    f"{name:18s} factor {f:2d}: {dt:6.2f}s  "
                    f"vs linear×{f}: {dt/(base*f/f0):.2f}"
                )
        return
    results_l = []
    for f in factors:
        vi, ap = amplified(spark, f)
        t0 = time.time()
        sync_options(vi, ap).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results_l.append((f, dt))
        f0, base = results_l[0]
        print(
            f"factor {f:2d}: {dt:6.2f}s  rows≈{600_000*f:>9,}  "
            f"vs linear×{f}: {dt/(base*f/f0):.2f}"
        )


if __name__ == "__main__":
    main()

"""Physical-plan assertions — the "would this survive 100×?" gate.

These tests pin the *plan shape*, not results: filters reach the parquet
scan, small dimensions broadcast, the flagship contains zero Python
evaluation, and hot aggregations do map-side partial aggregation. A
regression here is a scale bug even while results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_UNIT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    from tepsonic_database_sync_spark.io import load_table

    li = load_table(spark, SF_UNIT, "lineitem")
    q = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "EqualTo(l_returnflag,R)" in plan, plan
    # column pruning: the scan must not read all 11 columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema, read_schema


def test_flagship_broadcasts_catalog_and_stays_jvm_side(spark):
    from tepsonic_database_sync_spark.fixtures import build_fixtures
    from tepsonic_database_sync_spark.plans.sync import sync_options

    fx = build_fixtures(spark, SF_UNIT)
    plan = _plan(sync_options(fx["vendor_items"], fx["admin_products"]))
    assert "BroadcastHashJoin" in plan
    # the whole reference pipeline must run without Python evaluation
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # substring fallback may be a nested-loop join, but only broadcast-side
    assert "CartesianProduct" not in plan


def test_aggregations_do_partial_aggregation(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import simhash

    docs = load_table(spark, SF_UNIT, "documents")
    plan = _plan(simhash(docs))
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2, plan
    # keyed exchanges only — the documents loader's round-robin fan-out
    # (io._fan_out, a no-op at scale) sits below the aggregate (r18)
    assert plan.count("Exchange") - plan.count("RoundRobinPartitioning") == 1, plan


def test_lsh_candidates_join_on_equi_keys(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, SF_UNIT, "documents")
    plan = _plan(lsh_candidate_pairs(minhash_signatures(docs)))
    # candidate generation must be a hash-joinable equi-join, never a
    # cross/nested-loop product over documents
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_is_equi_join(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.asof import range_join_pairs

    e = load_table(spark, SF_UNIT, "events")
    a = e.filter(F.col("event_type") == "error")
    b = e.filter(F.col("event_type") == "click")
    plan = _plan(range_join_pairs(a, b))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_streaming_stateful_user_totals(spark):
    import tempfile

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.stateful import (
        streaming_user_totals,
    )

    events = load_table(spark, SF_UNIT, "events")
    expected = (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    exp = {r["user_id"]: r["n_events"] for r in expected}

    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(d)
        stream = streaming_user_totals(spark, d, events.schema)
        q = (
            stream.writeStream.outputMode("update")
            .format("memory")
            .queryName("user_totals")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql(
            "SELECT user_id, max(n_events) AS n FROM user_totals GROUP BY user_id"
        ).collect()
    assert {r["user_id"]: r["n"] for r in got} == exp


def test_lsh_array_banding_matches_long_format(spark):
    """Array-sliced banding must produce exactly the candidate pairs of
    the long-format groupBy banding and never add exchanges. (Spark
    already reuses the doc_id hash partitioning for the (doc_id, band)
    re-group, so the long form costs an extra aggregation pass, not an
    extra shuffle.)"""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_sig_array,
        minhash_signatures,
    )

    docs = load_table(spark, SF_UNIT, "documents")
    fast = lsh_candidate_pairs(minhash_sig_array(docs))
    slow = lsh_candidate_pairs(minhash_signatures(docs))
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
    assert _plan(fast).count("Exchange") <= _plan(slow).count("Exchange")


def test_prepare_corpus_gate_dedup_and_screen_semantics(spark):
    """The corpus-prepare pipeline end to end on a hand-built corpus:
    low-quality and unknown-language docs are gated out, exact
    duplicates collapse to the min doc_id, the benchmark slice is held
    out, and a training doc sharing a shingle with a bench doc is
    screened. (Quality gating is checked against quality_score itself so
    the single-projection expression can't drift from the operator.)"""
    from pyspark.sql import functions as F

    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.sampling import split_bucket
    from tepsonic_database_sync_spark.operators.text import quality_score
    from tepsonic_database_sync_spark.plans.corpus import prepare_corpus

    docs = load_table(spark, SF_UNIT, "documents")
    out = prepare_corpus(docs)
    rows = out.collect()
    assert rows, "pipeline admitted nothing — gate too strict for testdata"
    by_id = {r["doc_id"]: r for r in rows}

    # admitted docs pass the quality gate, with the REAL operator's score
    q = {
        r["doc_id"]: r["quality"]
        for r in quality_score(docs).collect()
    }
    assert all(q[d] >= 50 for d in by_id)
    assert all(r["quality"] == q[r["doc_id"]] for r in rows)
    assert all(r["lang"] in ("en", "es", "de", "fr", "zh") for r in rows)

    # fingerprints are unique (dedup) and each admitted doc_id is the
    # minimum among the gate-passing docs sharing its fingerprint
    fps = [r["fp_md5"] for r in rows]
    assert len(fps) == len(set(fps))

    # the benchmark slice is held out entirely
    bench = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", (split_bucket(F.col("doc_id"), "bench") < 5).alias("b")
        ).collect()
        if r["b"]
    }
    assert not bench & set(by_id)

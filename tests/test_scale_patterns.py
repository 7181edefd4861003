"""Scale-pattern tests: salting equivalence, bucketed-join co-location.

These pin the 100 TB toolbox: salted two-phase aggregation must be
result-identical to a plain groupBy, and bucketed tables must join
without a shuffle (the storage-partitioned co-location the state table
relies on at scale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_UNIT


def test_salted_agg_matches_plain_agg(spark):
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.skew import salted_two_phase_agg

    li = load_table(spark, SF_UNIT, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    salted = salted_two_phase_agg(li, "l_returnflag", sum_cols=("q",)).toPandas()
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.count("*").cast("long").alias("n"), F.sum("q").cast("long").alias("sum_q"))
        .toPandas()
    )
    s = salted.sort_values("l_returnflag").reset_index(drop=True)
    p = plain.sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(s[["l_returnflag", "n", "sum_q"]], p)


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    """The salted join must be row-identical to the plain equi-join even
    with broadcast disabled (forcing the shuffle join salting exists
    for), for inner AND left joins — and the hot key's rows must
    actually LAND on multiple salts (a key-derived salt would collapse
    them onto one task; the old salted_join_keys helper had that bug)."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.operators.skew import salted_join

    ev = load_table(spark, SF_UNIT, "events").select(
        "event_id", "user_id", F.col("event_type").alias("et")
    )
    dim = load_table(spark, SF_UNIT, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for how in ("inner", "left"):
            got = sorted(
                map(tuple, salted_join(ev, dim, "user_id", 8, how).collect())
            )
            want = sorted(map(tuple, ev.join(dim, "user_id", how).collect()))
            assert got == want, how
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # spread check: the hottest key's rows must cover several of 8 salts
    # (uses the implementation's salt so the test can't drift from it)
    from tepsonic_database_sync_spark.operators.skew import row_salt

    hot = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    n_salts_hit = (
        ev.filter(F.col("user_id") == hot["user_id"])
        .select(row_salt(8).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts_hit >= 4, n_salts_hit

    # right/full joins would emit one null-extended row per unmatched
    # small-side salt replica — they must be rejected, not silently wrong
    import pytest

    with pytest.raises(ValueError, match="salt replica"):
        salted_join(ev, dim, "user_id", 8, "right")
    with pytest.raises(ValueError, match="salt replica"):
        salted_join(ev, dim, "user_id", 8, "full")


def test_salted_join_spreads_byte_identical_duplicate_rows(spark):
    """ADVICE r6: a content-hash salt collapses byte-identical duplicate
    rows of a hot key onto ONE salt — the exact skew shape the operator
    claims to fix. The per-row salt must spread them, and the join must
    still return every duplicate (row multiplicity preserved)."""
    from tepsonic_database_sync_spark.operators.skew import row_salt, salted_join

    # 4000 byte-identical rows of one hot key + a handful of cold keys
    dup = spark.range(4000).select(
        F.lit(7).alias("k"), F.lit("same-payload").alias("v")
    )
    cold = spark.range(5).select(
        (F.col("id") + 100).alias("k"), F.lit("cold").alias("v")
    )
    large = dup.unionAll(cold).repartition(8)
    dim = spark.range(200).select(F.col("id").alias("k"), F.lit("d").alias("d"))

    n_salts_hit = (
        large.filter(F.col("k") == 7).select(row_salt(8).alias("s")).distinct().count()
    )
    assert n_salts_hit == 8, n_salts_hit

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(large, dim, "k", 8).groupBy("k").count().collect()
        want = large.join(dim, "k").groupBy("k").count().collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salting_rejects_preexisting_salt_column(spark):
    """ADVICE r6: withColumn would silently overwrite a user __salt
    column — both salted operators must refuse instead."""
    import pytest

    from tepsonic_database_sync_spark.operators.skew import (
        salted_join,
        salted_two_phase_agg,
    )

    clean = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    tainted = clean.withColumn("__salt", F.lit(0))
    with pytest.raises(ValueError, match="__salt"):
        salted_two_phase_agg(tainted, "k", sum_cols=("v",))
    with pytest.raises(ValueError, match="__salt"):
        salted_join(tainted, clean, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(clean, tainted, "k")


def test_bucketed_join_avoids_shuffle(spark):
    from tepsonic_database_sync_spark.io import load_table

    o = load_table(spark, SF_UNIT, "orders")
    li = load_table(spark, SF_UNIT, "lineitem")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    # force the non-broadcast path: at real scale both sides are too big
    # to broadcast, which is exactly when bucketing pays
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: sort-merge with NO shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

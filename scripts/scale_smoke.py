"""Scale-stress smoke: run the flagship pipeline on synthetically
amplified fact data (lineitem × N with shifted keys) and report how wall
time grows. The point is shape, not absolute numbers: the sync pipeline
must scale ~linearly in fact rows (catalog-bounded join sides, one
aggregation pass) — a quadratic regression (e.g. an accidental cross
join) shows up immediately as super-linear growth.

Writes nothing outside /tmp; testdata stays read-only.

Usage: python scripts/scale_smoke.py [factors...]   (default: 1 2 4 8)
"""

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


def _doc_ops(docs):
    """The doc-side operators whose scale shape matters most: repetition
    rules (gram shuffle), MinHash-LSH pairs (banded equi-join), and
    star-contraction clustering (O(log²) rounds over the pair graph)."""
    from tepsonic_database_sync_spark.operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
        minhash_sig_array,
    )
    from tepsonic_database_sync_spark.operators.text import repetition_stats

    def run_repetition():
        repetition_stats(docs).write.format("noop").mode("overwrite").save()

    def run_lsh_clusters():
        pairs = lsh_candidate_pairs(minhash_sig_array(docs)).localCheckpoint(
            eager=True
        )
        nodes = docs.select(F.col("doc_id").alias("node"))
        connected_components_star(pairs, nodes).write.format("noop").mode(
            "overwrite"
        ).save()

    return {"text_repetition": run_repetition, "lsh+star_clusters": run_lsh_clusters}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--docs"]
    docs_mode = "--docs" in sys.argv[1:]
    factors = [int(a) for a in args] or [1, 2, 4, 8]
    spark = build_session(app_name="scale_smoke")
    spark.range(1).count()
    if docs_mode:
        results: dict[str, list] = {}
        for f in factors:
            docs = amplified_docs(spark, f).localCheckpoint(eager=True)
            for name, run in _doc_ops(docs).items():
                t0 = time.time()
                run()
                dt = time.time() - t0
                results.setdefault(name, []).append((f, dt))
                base = results[name][0][1]
                print(
                    f"{name:18s} factor {f:2d}: {dt:6.2f}s  "
                    f"vs linear×{f}: {dt/(base*f):.2f}"
                )
        return
    results_l = []
    for f in factors:
        vi, ap = amplified(spark, f)
        t0 = time.time()
        sync_options(vi, ap).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results_l.append((f, dt))
        base = results_l[0][1]
        print(
            f"factor {f:2d}: {dt:6.2f}s  rows≈{600_000*f:>9,}  "
            f"vs linear×{f}: {dt/(base*f):.2f}"
        )


if __name__ == "__main__":
    main()

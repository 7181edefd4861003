"""LPA checkpoint-policy probe (VERDICT r11 item 5): does the eager
per-round localCheckpoint in graph.label_propagation buy plan-size
control, or does it just serialize four driver-blocking jobs?

Three policies over the SAME round body (copied inline so the shipped
operator stays untouched until the measurement decides — the r10
star-fusion discipline: ship or reject with numbers):

  eager : localCheckpoint(eager=True) after every round — the shipped
          r11 form; composition blocks per round, N+1 jobs total.
  lazy  : localCheckpoint(eager=False) after every round — the semdedup
          pattern; lineage still cut at each round, but materialization
          happens inside the ONE final action, so rounds pipeline with
          the consumer and AQE plans each stage with runtime stats.
  none  : no intermediate cut at all — the full 4-round lineage plans
          as one tree (linear in rounds: each round's frame is consumed
          exactly once, so no subtree squaring like the rejected r10
          star fusion), zero checkpoint copies.

Two substrates, both sf0.1: the registry's co-purchase part graph
(the official entry's input) and the hub-skew graph from
scale_smoke --graph (473k-degree hub at factor 8's shape, here factor
1). min-of-3 warm with a GC nudge between runs; policies interleaved
A/B/C per iteration so VM steal hits all three equally.

Usage: python scripts/lpa_checkpoint_probe.py [rounds]   (default 4)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tepsonic_database_sync_spark.io import load_table
from tepsonic_database_sync_spark.session import build_session

SF = "/root/testdata/sf0.1"


def lpa_variant(edges, rounds: int, policy: str):
    """graph.label_propagation's exact round body with a checkpoint
    policy switch. Keep in sync with operators/graph.py (the probe's
    conclusions are only valid for the shipped body)."""
    e = edges.repartition("dst").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for r in range(rounds):
        nb = e.join(labels, e["dst"] == labels["node"]).select(
            e["src"].alias("node"), "label"
        )
        counts = nb.groupBy("node", "label").agg(
            F.count("*").cast("long").alias("c")
        )
        labels = counts.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("c"), (-F.col("label")).alias("__neg"),
                    F.col("label"),
                )
            ).alias("m")
        ).select("node", F.col("m.label").alias("label"))
        last = r == rounds - 1
        if policy == "eager":
            labels = labels.localCheckpoint(eager=True)
        elif policy == "lazy" and not last:
            labels = labels.localCheckpoint(eager=False)
        # 'none': no intermediate cut; 'lazy' leaves the LAST round
        # uncut too (the consumer is the final action anyway)
    return labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


def copurchase_edges(spark):
    from tepsonic_database_sync_spark.operators.recommend import (
        capped_basket_items,
        cooccur_pairs,
    )

    capped = capped_basket_items(
        load_table(spark, SF, "lineitem"), "l_orderkey", "l_partkey"
    )
    return cooccur_pairs(capped, min_support=2, symmetric=True).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )


def hub_edges(spark):
    """The scale_smoke --graph substrate at factor 1: lineitem part
    pairs with a degree hub at node 0."""
    li = load_table(spark, SF, "lineitem").select(
        (F.col("l_partkey") % 20000).alias("a_id"),
        F.when(F.col("l_orderkey") % 7 < 2, F.lit(0))
        .otherwise((F.col("l_suppkey") % 20000))
        .alias("b_id"),
    ).filter(F.col("a_id") != F.col("b_id")).distinct()
    sym = li.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    return sym.unionAll(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session(app_name="lpa_ckpt_probe")
    spark.range(1).count()
    for sub_name, builder in (
        ("copurchase(sf0.1)", copurchase_edges),
        ("hub(sf0.1)", hub_edges),
    ):
        edges = builder(spark).localCheckpoint(eager=True)
        print(f"[{sub_name}] edges={edges.count()} rounds={rounds}")
        best: dict[str, float] = {}
        sums: dict[str, float] = {}
        for it in range(3):
            for policy in ("eager", "lazy", "none"):
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                lpa_variant(edges, rounds, policy).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.time() - t0
                best[policy] = min(best.get(policy, float("inf")), dt)
                sums[policy] = sums.get(policy, 0.0) + dt
                print(f"  iter{it} {policy:5s} {dt:6.2f}s")
        for policy in ("eager", "lazy", "none"):
            print(
                f"  [{sub_name}] {policy:5s} best={best[policy]:6.2f}s "
                f"mean={sums[policy] / 3:6.2f}s"
            )


if __name__ == "__main__":
    main()

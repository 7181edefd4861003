"""Iterative graph centrality (PageRank) in engine-exact integer math.

The reference ranks products by exact field matches only
(src/routes/products.js:23-63); a catalog/corpus engine additionally
needs a link-structure signal — which suppliers/parts sit at the center
of the procurement graph, which documents anchor a citation web.
PageRank is that operator, and it doubles as the engine's exemplar for
iterative algorithms beyond the fixpoint label propagation of
``dedup.connected_components``.

Definition (deterministic fixed-point variant):

    r₀(v)   = 1000  (milli-mass)
    rₜ₊₁(v) = 150 + (850 · Σ_{(u,v)∈E} (rₜ(u) DIV outdeg(u))) DIV 1000

for a fixed ``iters`` rounds — i.e. damping 0.85 in permille with
truncating integer division at both steps. The truncation loses a
bounded trickle of mass (< 1 milli per in-edge per round); accepting
that makes every step exact BIGINT arithmetic, so the DuckDB oracle (an
unrolled CTE chain, one per round) reproduces the ranks bit-for-bit —
the same trade the k-means trainer makes (similarity.kmeans_train).

Scale shape: the edge list with its out-degrees is materialized ONCE,
hash-partitioned on src (it feeds every round); each round is then one
equi-join on src — only the small (node, rank) frame reshuffles — plus
one map-side-combined groupBy on dst. Two bounded shuffles per round,
no driver-side graph structure, no collect. Fixed iteration count keeps
the oracle expressible; production convergence loops swap the constant
for a delta check without touching the round body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 5
PR_DAMPING_PERMILLE = 850
PR_BASE_MILLI = 150  # (1000 - damping) · 1000 / 1000


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer PageRank over a directed edge list (src, dst).

    Every node must appear as a source (no dangling nodes) — symmetrize
    the graph first if needed; raises otherwise is NOT checked here
    (a dangling dst simply keeps receiving mass but contributes none,
    and drops out of the returned frame, which covers exactly the nodes
    with in-edges after round 1 ∪ sources at round 0 — callers wanting
    the classic formulation pass a symmetrized edge set, as the registry
    query does).

    Returns (node, rank_milli).
    """
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    e = (
        edges.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    # seed ranks FROM the checkpoint (already partitioned on src, so the
    # distinct adds no exchange) — deriving them from `deg` would re-scan
    # the source once more, plan-asserted in tests/test_plan_quality.py
    ranks = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1000).cast("long").alias("rank_milli")
    )
    for _ in range(iters):
        contribs = e.join(
            ranks, e["src"] == ranks["node"]
        ).select(
            e["dst"].alias("node"),
            F.expr("rank_milli div d").cast("long").alias("c"),
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(PR_BASE_MILLI)
                + F.expr(f"({PR_DAMPING_PERMILLE} * sum(c)) div 1000")
            )
            .cast("long")
            .alias("rank_milli")
        )
    return ranks

"""Upsert / bulk-write — SURVEY.md §2.1 S8, S9.

The reference stages ``updateOne``/``insertOne`` ops and executes one
unordered ``bulkWrite`` (src/routes/products.js:309-326, 339-341).
Unordered ⇒ parallel-safe ⇒ maps directly onto Spark's unordered task
writes. Vanilla parquet has no MERGE, so the engine's upsert is the
full-outer-join + rewrite pattern; on a Delta/Iceberg-capable cluster the
same keys/merge expressions slot into ``MERGE INTO`` (capability-gated in
``sources.jdbc``).

Scale note: the join shuffles both sides on the merge key — at 100 TB
keep the state table bucketed/partitioned by the same key so the shuffle
on the state side disappears (storage-partitioned join), and only changed
partitions rewrite (classic rewrite-partition upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_flagged(
    state: DataFrame,
    new: DataFrame,
    keys: list[str],
    sum_cols: tuple[str, ...] = ("stock",),
    min_cols: tuple[str, ...] = ("price",),
    uid_cols: tuple[str, ...] = ("uids",),
) -> DataFrame:
    """Full-outer-join upsert of option rows with an ``op`` audit column:
    ``insert`` (new only), ``update`` (both sides → merge semantics of
    mergeSelectedOptions, products.js:194-223), ``keep`` (state only).

    Expects the flat option shape (uids = '|'-joined sorted string).
    """
    s = state.alias("s")
    n = new.alias("n")
    cond = None
    for k in keys:
        c = F.col(f"s.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else (cond & c)
    j = s.join(n, cond, "full_outer")

    in_state = F.col(f"s.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    op = (
        F.when(in_state & in_new, F.lit("update"))
        .when(in_new, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )

    cols = [F.coalesce(F.col(f"n.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    cols.append(op.alias("op"))
    for c in sum_cols:
        cols.append(
            (F.coalesce(F.col(f"s.{c}"), F.lit(0)) + F.coalesce(F.col(f"n.{c}"), F.lit(0)))
            .cast("long")
            .alias(c)
        )
    for c in min_cols:
        # explicit CASE (not `least`) — NULL handling of least() varies
        # across engines; the merge semantics are "min of present sides"
        sc, nc = F.col(f"s.{c}"), F.col(f"n.{c}")
        cols.append(
            F.when(sc.isNull(), nc)
            .when(nc.isNull(), sc)
            .otherwise(F.least(sc, nc))
            .cast("long")
            .alias(c)
        )
    for c in uid_cols:
        # concat_ws skips NULL sides in every engine; then resort the union
        merged = F.array_sort(
            F.split(F.concat_ws("|", F.col(f"s.{c}"), F.col(f"n.{c}")), "\\|")
        )
        cols.append(F.array_join(merged, "|").alias(c))
    return j.select(*cols)


def dispatch_vendors(apis_backfilled: DataFrame) -> DataFrame:
    """X1/F4 — per-vendor dispatch with fault isolation
    (products.js:383-395): wholecell vendors sync; anything else becomes an
    error summary row ("No sync function available for this database
    type")."""
    return apis_backfilled.select(
        F.col("vendorId"),
        F.col("database"),
        F.when(
            F.col("database") == "wholecell", F.lit(None).cast("string")
        )
        .otherwise(F.lit("No sync function available for this database type"))
        .alias("error"),
    )

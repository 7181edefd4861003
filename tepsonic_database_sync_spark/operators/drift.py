"""Distribution-drift detection between two dataset versions (PSI).

The reference re-syncs the vendor catalog on a schedule
(products.js:236) but has no notion of "did this feed silently change
shape?" — the production incident that motivates drift monitoring: a
vendor re-prices everything, a corpus release swaps a source, an
upstream bug zeroes a column. The Population Stability Index is the
standard scalar for it:

    PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)

over buckets drawn from the REFERENCE distribution's quantiles (so the
reference occupies ~equal mass per bucket and the statistic is scale
free). PSI < 0.1 is conventionally "no shift", > 0.25 "major shift".

Everything is engine-exact integer math: decile boundaries from the
exact distinct-value histogram (operators.quantiles), bucket assignment
by counting boundaries below the value against a broadcast boundary
array, proportions in floored permille clamped to ≥ 1 (the classic PSI
guard for empty buckets), and the log ratio through the shared portable
integer log — so the DuckDB oracle reproduces every contribution
bit-for-bit.

Scale shape: one (value) histogram shuffle over the reference for the
boundaries (map-side combined, one row per distinct value), then each
side is a narrow projection + ONE groupBy on the ≤ |qs|+1 bucket ids;
the boundary array and the two totals are single-row broadcasts. No
joins wider than the bucket frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.operators.quantiles import (
    grouped_quantiles_exact,
)
from tepsonic_database_sync_spark.operators.text import iln_milli

PSI_QS: tuple[int, ...] = tuple(range(100, 1000, 100))  # reference deciles


def _bucket_counts(
    side: DataFrame, value_col: str, barr: DataFrame, n_col: str
) -> DataFrame:
    bucket = F.size(
        F.filter(F.col("__bs"), lambda b: b < F.col(value_col))
    ).cast("long")
    return (
        side.select(value_col)
        .filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(barr))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias(n_col))
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    qs_permille: Sequence[int] = PSI_QS,
) -> DataFrame:
    """Per-bucket PSI decomposition of the drift of ``cur`` against
    ``ref`` on an integral column.

    Returns one row per occupied bucket (0 .. |qs|, bucket = number of
    DISTINCT reference boundaries strictly below the value):
    ``(bucket, n_ref, n_cur, ref_permille, cur_permille,
    psi_contrib_milli)`` — sum the last column for the scalar PSI in
    milli-nats. Proportions are floored permille clamped to ≥ 1 so
    empty buckets contribute a large-but-finite penalty (the standard
    PSI convention). NULL values are excluded on both sides.
    """
    from pyspark.sql import Window

    bounds = grouped_quantiles_exact(
        ref.select(F.lit(1).alias("__g"), value_col),
        "__g",
        value_col,
        qs_permille,
    )
    # single-row boundary array, materialized ONCE — it feeds both
    # sides' bucket assignment, and without the checkpoint the whole
    # quantile pipeline re-evaluates per consumer (plan-tree duplication)
    barr = bounds.agg(
        F.sort_array(F.collect_set("value")).alias("__bs")
    ).localCheckpoint(eager=True)
    r = _bucket_counts(ref, value_col, barr, "n_ref")
    c = _bucket_counts(cur, value_col, barr, "n_cur")
    # totals via a window over the joined BUCKET frame (≤ |qs|+1 rows —
    # the one place a partition-less window is the right tool); deriving
    # them from r/c directly would duplicate each side's whole subtree
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = (
        r.join(c, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
        .withColumn("__tr", F.sum("n_ref").over(w).cast("long"))
        .withColumn("__tc", F.sum("n_cur").over(w).cast("long"))
    )
    pm = F.greatest(F.expr("(1000 * n_ref) div greatest(__tr, 1)"), F.lit(1))
    qm = F.greatest(F.expr("(1000 * n_cur) div greatest(__tc, 1)"), F.lit(1))
    contrib = F.expr(
        "((ref_permille - cur_permille) * (__lp - __lq)) div 1000"
    )
    return (
        j.withColumn("ref_permille", pm.cast("long"))
        .withColumn("cur_permille", qm.cast("long"))
        .withColumn("__lp", iln_milli(F.col("ref_permille") * 1000))
        .withColumn("__lq", iln_milli(F.col("cur_permille") * 1000))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            "ref_permille",
            "cur_permille",
            contrib.cast("long").alias("psi_contrib_milli"),
        )
    )


def tvd_drift(ref: DataFrame, cur: DataFrame, cat_col: str) -> DataFrame:
    """Categorical drift between two dataset versions: per-category
    share shift, whose half-L1 sum is the total variation distance —
    the categorical complement of ``psi_drift`` (PSI's log ratio blows
    up on categories absent from one side; TVD stays bounded in [0, 1],
    which is what you want for churning label sets).

    Returns one row per category present in EITHER side:
    ``(category, n_ref, n_cur, ref_permille, cur_permille,
    abs_diff_permille)`` — ``sum(abs_diff_permille) / 2`` is the TVD in
    permille. Shares are floored permille (NOT clamped — a category
    with zero rows has a genuine zero share; clamping is a PSI-ism its
    log needs). NULL categories count as a real category.

    Scale shape: one map-side-combined groupBy per side on the category
    key, a full-outer join of two |categories|-sized frames, and the
    totals from a window over that tiny frame — nothing touches raw
    rows twice.
    """
    from pyspark.sql import Window

    r = (
        ref.select(F.col(cat_col).alias("category"))
        .groupBy("category")
        .agg(F.count("*").cast("long").alias("n_ref"))
    )
    c = (
        cur.select(F.col(cat_col).alias("category"))
        .groupBy("category")
        .agg(F.count("*").cast("long").alias("n_cur"))
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = (
        r.join(c, r["category"].eqNullSafe(c["category"]), "full_outer")
        .select(
            F.coalesce(r["category"], c["category"]).alias("category"),
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
        .withColumn("__tr", F.sum("n_ref").over(w).cast("long"))
        .withColumn("__tc", F.sum("n_cur").over(w).cast("long"))
    )
    pm = F.expr("(1000 * n_ref) div greatest(__tr, 1)")
    qm = F.expr("(1000 * n_cur) div greatest(__tc, 1)")
    return j.select(
        "category",
        "n_ref",
        "n_cur",
        pm.cast("long").alias("ref_permille"),
        qm.cast("long").alias("cur_permille"),
        F.abs(pm - qm).cast("long").alias("abs_diff_permille"),
    )

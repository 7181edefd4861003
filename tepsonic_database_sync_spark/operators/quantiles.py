"""Exact grouped quantiles via the distinct-value histogram.

``approx_percentile`` (operators/sketches.py, t-digest) is the sketch
path; this is the EXACT path that still scales: instead of sorting raw
rows per group (the naive ``percentile``/window approach — a per-group
sort of the full table), aggregate to one row per (group, value) first,
then run the cumulative window over that histogram.  With quantized
values (cents → whole dollars, permille scores, bucketed lengths) the
histogram is orders of magnitude smaller than the raw table, so the only
Sort runs over distinct values — the same "window over aggregates, never
over raw rows" shape as scoring.rank_normalize(method="histogram").

Quantile definition: inverse CDF (lower / "disc" quantile) — the value
at rank ceil(q·n) in ascending order, i.e. the smallest v whose
cumulative count satisfies 1000·cum ≥ q_permille·n.  Pure integer
comparisons; any SQL engine reproduces it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_permille: Sequence[int] = (250, 500, 750),
) -> DataFrame:
    """Exact per-group quantiles of an integral column.

    Returns (group_col, q_permille, n, value): for each group of size n
    and each requested q, the smallest value v with
    1000 · |{rows ≤ v}| ≥ q · n.  NULL values are excluded (they have no
    rank); empty groups therefore don't appear.

    Plan shape: groupBy (group, value) — map-side combined, one shuffle —
    then a cumulative-count window over the per-group distinct-value
    series, a broadcast-size join with the per-group totals, and a
    min-per-(group, q) rollup.  No per-group sort of raw rows anywhere.
    """
    if not qs_permille:
        raise ValueError("qs_permille must be non-empty")
    if any(q <= 0 or q > 1000 for q in qs_permille):
        raise ValueError(f"q_permille values must be in (0, 1000]: {qs_permille}")

    hist = (
        df.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w).cast("long"))
    tot = hist.groupBy(group_col).agg(F.sum("cnt").cast("long").alias("n"))
    qarr = F.array(*[F.lit(int(q)).cast("long") for q in qs_permille])
    return (
        cum.join(tot, group_col)
        .select(
            group_col,
            "n",
            F.col(value_col).alias("value"),
            "cum",
            F.explode(qarr).alias("q_permille"),
        )
        .filter(F.lit(1000) * F.col("cum") >= F.col("q_permille") * F.col("n"))
        .groupBy(group_col, "q_permille", "n")
        .agg(F.min("value").cast("long").alias("value"))
        .select(group_col, "q_permille", "n", "value")
    )


def grouped_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group mode (most frequent value, ties → smallest value)
    — the categorical companion of ``grouped_quantiles_exact``, same
    histogram shape: one map-side-combined shuffle to (group, value)
    counts, then ONE more map-side-combined aggregation that picks the
    mode (``min(struct(-cnt, value))`` == row_number ORDER BY cnt DESC,
    value — r17: replaces the window + the separate total + the rejoin;
    the histogram is scanned once and nothing is sorted). NULL values
    are excluded (a mode of "missing" is a data-quality signal better
    read from profile_table's null counts).

    Returns (group_col, n, mode_value, mode_cnt).
    """
    hist = (
        df.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    agg = hist.groupBy(group_col).agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("nc"),
                F.col(value_col).alias("v"),
                F.col("cnt").alias("c"),
            )
        ).alias("k"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return agg.select(
        group_col,
        "n",
        F.col("k.v").alias("mode_value"),
        F.col("k.c").alias("mode_cnt"),
    )


def quantile_bucketize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    qs_permille: Sequence[int] = (250, 500, 750),
) -> DataFrame:
    """Assign every row its per-group quantile bucket — the featurization
    loop closed: ``grouped_quantiles_exact`` computes the boundaries,
    this joins them back and bins each row (difficulty binning,
    length-stratified packing, score-tier routing).

    ``bucket`` = number of DISTINCT boundary values strictly below the
    row's value, so with the default q grid rows land in buckets 0..3, a
    row EQUAL to a boundary stays in that quantile's bucket (the
    boundary is the smallest value whose cumulative count reaches the
    quantile, so equals belong below it), and two quantiles collapsing
    onto the same value collapse their segments (skewed groups). The
    distinct-count form also makes the assignment immune to duplicate
    ``key_col`` rows — each (key, group, value) row sees each threshold
    once no matter how often the join fans out. NULL values are
    dropped — they have no rank (profile_table counts them).

    Scale shape: boundaries are |groups|·|qs| rows — broadcast onto the
    fact side; the bin assignment is one conditional count per row, no
    extra shuffle beyond the boundary computation itself.

    Returns (key_col, group_col, value_col, bucket).
    """
    bounds = grouped_quantiles_exact(df, group_col, value_col, qs_permille).select(
        group_col, F.col("value").alias("__b")
    )
    rows = df.select(key_col, group_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    return (
        rows.join(F.broadcast(bounds), group_col)
        .groupBy(key_col, group_col, value_col)
        .agg(
            F.count_distinct(
                F.when(F.col("__b") < F.col(value_col), F.col("__b"))
            )
            .cast("long")
            .alias("bucket")
        )
    )


def grouped_mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_milli: int = 3000,
) -> DataFrame:
    """Robust per-group outlier census via the median absolute deviation
    — the resistant complement of the percentile-threshold detector
    (outliers_p99): a few extreme rows move a mean/stddev fence but
    leave median and MAD untouched, so the classic
    ``|x − median| > k · MAD`` rule (k = 3 by default, in milli) keeps
    its power under contamination.

    Exact integer throughout: both the median and the MAD come from the
    distinct-value histogram (``grouped_quantiles_exact`` — inverse CDF,
    never a per-group sort of raw rows), deviations are absolute BIGINT
    differences, and the fence check cross-multiplies
    (``dev · 1000 > k_milli · mad``) instead of dividing. MAD = 0
    (more than half the group identical) makes every deviating row an
    outlier — the documented degenerate of the rule. NULL values are
    excluded (no rank).

    Returns per group: (group, n, median, mad, n_outliers).

    Scale shape (r17): two passes over raw rows — the value histogram
    for the median, then ONE deviation histogram (map-side-combined
    groupBy on (group, deviation)) that serves BOTH the MAD inverse-CDF
    and the final census: n is the sum of histogram counts and
    n_outliers a conditional sum of counts, so the census reads
    distinct-deviation rows, never raw rows. (The pre-r17 form scanned
    and median-joined the raw rows a third time for the census — guide
    §2.2, shuffle/scan fewer bytes.) The per-group median/MAD frames
    broadcast back. Nothing sorts raw rows; the deviation histogram's
    identical aggregate subtrees are eligible for AQE exchange reuse at
    runtime (observed in the executed plan; not pinned by a test —
    ADVICE r17 — the two-pass structure above is what the plan tests
    assert).
    """
    rows = df.select(group_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    med = grouped_quantiles_exact(rows, group_col, value_col, (500,)).select(
        group_col, F.col("value").alias("__med")
    )
    devhist = (
        rows.join(F.broadcast(med), group_col)
        .select(
            group_col,
            F.col("__med"),
            F.abs(F.col(value_col) - F.col("__med"))
            .cast("long")
            .alias("__dev"),
        )
        .groupBy(group_col, "__med", "__dev")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = devhist.withColumn("cum", F.sum("cnt").over(w).cast("long"))
    tot = devhist.groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("__n")
    )
    mad = (
        cum.join(tot, group_col)
        .filter(F.lit(1000) * F.col("cum") >= F.lit(500) * F.col("__n"))
        .groupBy(group_col)
        .agg(F.min("__dev").cast("long").alias("__mad"))
    )
    return (
        devhist.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.min("__med").cast("long").alias("median"),
            F.min("__mad").cast("long").alias("mad"),
            F.sum(
                F.when(
                    F.col("__dev") * 1000 > k_milli * F.col("__mad"),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )

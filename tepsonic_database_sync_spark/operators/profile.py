"""One-pass table profiling — the data-quality snapshot a pipeline takes
before committing a big job: per column, null count, distinct count, and
min/max, in ONE aggregation pass over the table.

Complements ``registry.q_dq_checks`` (rule violations) and
``skew.skew_profile`` (key heat): this is the column-level census.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_null, n_distinct,
    min_value, max_value)`` — min/max rendered as strings so mixed-type
    tables profile into one frame.

    ``exact=True`` uses exact ``count(DISTINCT)`` — Catalyst plans the N
    distinct aggregates as ONE pass with an Expand (input duplicated ×N
    pre-shuffle, partial-aggregated); the honest cost statement is N×
    map-side work, one shuffle. At 100 TB set ``exact=False``: HLL++
    ``approx_count_distinct`` needs no Expand and moves fixed-size
    sketches instead (the ``sketch_distinct`` pairing documents the
    error bound) — same output schema, so the swap is a flag flip.

    The long-form output is built by aggregating once into a single row
    and exploding an array of per-column structs — no per-column jobs,
    no driver-side loop over the data.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table requires at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    n_distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count("*").cast("long").alias("__n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count_if(F.col(c).isNull()).cast("long").alias(f"__null_{i}"),
            n_distinct(c).cast("long").alias(f"__dist_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__null_{i}").alias("n_null"),
                F.col(f"__dist_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_value"),
                F.col(f"__max_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def group_entropy(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group Shannon entropy of a categorical column, in milli-nats
    of exact integer arithmetic — the distribution-shape census next to
    ``profile_table``'s counts: 0 = every row the same value (a bot
    user, a collapsed upstream feed), ln(k)·1000 = uniform over k
    values. The identity H = ln n − (Σ nᵢ·ln nᵢ)/n needs only the
    portable integer log (``text.iln_milli``), so Spark and the oracle
    agree bit-for-bit.

    Scale shape: the histogram shuffle on (group, value) — map-side
    combined — then one per-group rollup; identical cost profile to
    ``grouped_quantiles_exact``. NULL categories count as a value.

    Returns (group_col, n, n_distinct, entropy_milli).
    """
    from tepsonic_database_sync_spark.operators.text import iln_milli

    hist = df.groupBy(group_col, value_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    per = hist.groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("cnt") * iln_milli(F.lit(1000) * F.col("cnt")))
        .cast("long")
        .alias("__s"),
    )
    # integer DIV (not floor of a double quotient): bit-identical to the
    # oracle's `//` at any magnitude
    return per.select(
        group_col,
        "n",
        "n_distinct",
        (iln_milli(F.lit(1000) * F.col("n")) - F.expr("__s DIV n"))
        .cast("long")
        .alias("entropy_milli"),
    )


def group_moments(
    df: DataFrame, group: str, x: Column, y: Column
) -> DataFrame:
    """Exact per-group second-moment vector over two integral series —
    the sufficient statistics for mean / variance / covariance /
    correlation, kept as raw BIGINT sums so the statistics derive
    exactly downstream (a float mean loses the ability to merge two
    groups' stats; moment vectors are mergeable by addition, the same
    property the sketches exploit).

    Overflow contract: requires n·max(|x|)² < 2⁶³ (stated, like
    join_size_estimate's bound) — rescale the inputs (e.g. dollars, not
    cents) or move to DECIMAL beyond that.

    One map-side-combined groupBy; no second pass, no window.
    """
    xs = x.cast("long")
    ys = y.cast("long")
    return df.select(
        F.col(group).alias("g"), xs.alias("x"), ys.alias("y")
    ).groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.min("x").cast("long").alias("min_x"),
        F.max("x").cast("long").alias("max_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_yy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
    ).withColumnRenamed("g", group)


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns — the
    data-governance census next to dq_checks: every combination of
    quasi-identifier values (an "equivalence class") with its row count
    and whether it puts individuals at re-identification risk
    (class size < k). Suppressing or generalizing exactly the flagged
    classes is the standard remediation; their row counts size that
    work.

    NULLs are legitimate quasi-identifier values (a missing birthday is
    itself identifying) and group as their own class — Spark and SQL
    GROUP BY agree on that.

    One map-side-combined groupBy on the quasi columns; at 100 TB this
    is the same shape as any rollup — the classes frame is bounded by
    the quasi-space cardinality, not by rows.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity requires at least one quasi column")
    if k < 2:
        raise ValueError("k must be ≥ 2 (k=1 flags nothing)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < k)
    )

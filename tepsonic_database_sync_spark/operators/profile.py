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


def _milli_scale(num: str, den: str) -> F.Column:
    """Exact ``(1000·num) div den`` without the 1000× overflow on the
    NUMERATOR: split into quotient and remainder first — ``(n div
    d)·1000 + ((n % d)·1000) div d``. Both ``div`` and ``%`` truncate
    toward zero with dividend-signed remainders in Spark AND DuckDB, so
    the split is engine-exact for negative numerators too (den > 0).

    Contract (hypothesis-pinned): |num div den| < 2⁶³/1000 ≈ 9.2·10¹⁵
    and den·1000 < 2⁶³ — the split buys 1000× headroom on the
    numerator, not on the QUOTIENT. Both callers state input bounds
    that keep the quotient orders of magnitude inside (regression
    slopes in milli-y-units per x; χ² contributions ≤ 1000·N)."""
    return F.expr(
        f"(({num}) div ({den})) * 1000"
        f" + ((({num}) % ({den})) * 1000) div ({den})"
    ).cast("long")


def grouped_regression(
    df: DataFrame, group: str, x: F.Column, y: F.Column
) -> DataFrame:
    """Per-group ordinary-least-squares line y ≈ a + b·(x − x0) in exact
    integer milli — trend extraction as ONE aggregation (the shape that
    survives 100 TB: sufficient statistics with map-side combine, never
    a per-group sort or a second pass).

    ``x``/``y`` must be integer-valued columns. The group's minimum x is
    used as the origin x0: sums are computed RAW in one pass, then
    re-centered algebraically (Σx′ = Σx − n·x0, Σx′² = Σx² − 2x0Σx +
    n·x0², Σx′y = Σxy − x0·Σy), which keeps every intermediate within
    BIGINT for |x′| ≤ ~2.4e3, |y| ≤ ~5e5, n ≤ ~4e4 (stated bound —
    the dollars/day feeds this serves; widen to decimal128 beyond).
    The final milli scaling uses the quotient/remainder split
    (``_milli_scale``) so the 1000× never overflows.

    Returns (group, n, x0, slope_milli, intercept_milli) where
    intercept is the fitted value AT x0, in milli-y units; degenerate
    groups (zero x-variance) report slope 0 and the mean as intercept.
    """
    agg = df.groupBy(group).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.min(x).cast("long").alias("x0"),
    )
    c = (
        agg.withColumn("sxc", F.expr("sx - n * x0"))
        .withColumn("sxxc", F.expr("sxx - 2 * x0 * sx + n * x0 * x0"))
        .withColumn("sxyc", F.expr("sxy - x0 * sy"))
        .withColumn("num", F.expr("n * sxyc - sxc * sy"))
        .withColumn("den", F.expr("n * sxxc - sxc * sxc"))
    )
    slope = F.when(F.col("den") > 0, _milli_scale("num", "den")).otherwise(
        F.lit(0)
    )
    return (
        c.withColumn("slope_milli", slope.cast("long"))
        .withColumn(
            "intercept_milli",
            F.expr("(1000 * sy - slope_milli * sxc) div n").cast("long"),
        )
        .select("n", "x0", "slope_milli", "intercept_milli", group)
        .select(group, "n", "x0", "slope_milli", "intercept_milli")
    )


CHI_QUANT = 64  # deviation quantum: d is floored to CHI_QUANT counts


def chi_square_cells(
    df: DataFrame, row_col: str, col_col: str, quant: int = CHI_QUANT
) -> DataFrame:
    """χ² independence census for two categorical columns: one
    contingency-table aggregation plus per-cell expected counts and χ²
    contributions in exact integer milli.

    The textbook contribution (O−E)²/E = (N·O − R·C)²/(N·R·C) squares a
    number as large as N·O — overflow at warehouse scale — so the
    deviation d = N·O − R·C is first floored to ``quant``-count units:
    contrib_milli = (1000·(d div q)²) div ((N·R·C) div q²), with the
    1000× applied through the quotient/remainder split
    (``_milli_scale``). With q=16 that is exact χ² up to a ≤q-count
    quantization of each deviation (≪ any significance threshold).
    BIGINT bound: requires |d| div q ≤ 3·10⁹ — pick
    q ≥ N·O_max / 3·10⁹ for bigger tables (q=64 covers N ≈ 1.4·10⁶
    rows worst-case, far more in practice since d ≪ N·O on real data).
    Both engines share every step, so the result is hash-identical.

    Scale shape: ONE map-side-combined groupBy of the fact table to the
    (row × col) cell frame; marginals, the grand total, and the DENSE
    cell grid (every observed row value × every observed col value —
    χ² is wrong without the ZERO cells, whose deviations are exactly
    the dependence signal a groupBy alone would drop) all derive from
    that tiny frame, never a second fact pass.

    Returns (row value, col value, observed, expected_milli,
    contrib_milli) for the FULL grid, zero cells included.
    """
    # the tiny cell frame is materialized ONCE (localCheckpoint): the
    # marginals, the grand total, and the dense-grid left join all read
    # it back instead of re-running the fact aggregation — plan-asserted
    # (exactly one fact scan) in tests/test_plan_quality.py
    cells = (
        df.groupBy(row_col, col_col)
        .agg(F.count("*").cast("long").alias("observed"))
        .localCheckpoint(eager=True)
    )
    rv = cells.groupBy(row_col).agg(
        F.sum("observed").cast("long").alias("rt")
    )
    cv = cells.groupBy(col_col).agg(
        F.sum("observed").cast("long").alias("ct")
    )
    nn = rv.agg(F.sum("rt").cast("long").alias("nn"))
    q = int(quant)
    return (
        rv.crossJoin(F.broadcast(cv))
        .join(cells, [row_col, col_col], "left")
        .withColumn(
            "observed", F.coalesce("observed", F.lit(0)).cast("long")
        )
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "expected_milli",
            F.expr("(1000 * rt * ct) div nn").cast("long"),
        )
        .withColumn("d", F.expr("nn * observed - rt * ct"))
        .withColumn(
            "contrib_milli",
            # greatest(…, 1): on tables smaller than ~q³ rows the
            # quantized denominator floors to 0 — an ANSI divide-by-zero
            # — so it is clamped; both engines share the clamp, and for
            # any table large enough that quantization makes sense the
            # clamp never fires
            _milli_scale(
                f"(d div {q}) * (d div {q})",
                f"greatest((nn * rt * ct) div {q * q}, 1)",
            ),
        )
        .select(
            row_col, col_col, "observed", "expected_milli", "contrib_milli"
        )
    )


LDIV_L = 3
LDIV_T_PERMILLE = 300


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = LDIV_L,
    t_max_permille: int = LDIV_T_PERMILLE,
) -> DataFrame:
    """l-diversity + t-closeness census — the two refinements of
    ``k_anonymity`` (Machanavajjhala et al. 2007; Li, Li &
    Venkatasubramanian 2007): a class can be k-large yet still leak if
    its SENSITIVE values are homogeneous (l-diversity counts them) or
    skewed far from the corpus (t-closeness bounds the distribution
    distance). Per equivalence class:

    - ``class_size``   — k-anonymity's count;
    - ``l_distinct``   — distinct sensitive values in the class;
    - ``tvd_permille`` — total variation distance between the class's
      sensitive distribution and the global one, floored permille,
      EXACT integers: tvd = (500·Σ_v |c_v·N − g_v·k|) div (k·N), where
      the sum needs only the class's OWN values — values absent from
      the class contribute (N − Σ_{v∈class} g_v)·k in one closed-form
      correction, so no class ever fans out over the global value set;
    - ``l_at_risk`` / ``t_at_risk`` — the two audit flags.

    Overflow: the cross products (c_v·N, g_v·k, (N−Σg)·k) are computed
    in decimal(38,0) — auto-escalated, not documented-and-hoped
    (ADVICE r11): int64 silently wraps past N ≈ 3·10⁹ rows, well
    inside 100 TB territory. Only the post-aggregate scoring frame
    (bounded by the quasi×sensitive space, not rows) pays decimal
    arithmetic; the row-scale groupBys stay long. Values are identical
    where int64 sufficed — exact integer math, wider carrier — so the
    hash oracle is unchanged.

    Scale shape: ONE map-side-combined groupBy on (quasi, sensitive) —
    bounded by the quasi×sensitive space, not rows — then class sizes
    and the TVD terms aggregate from that frame; the global sensitive
    distribution is vocabulary-sized and broadcasts. NULL is a
    legitimate quasi AND sensitive value (groups as its own class /
    value), exactly as in ``k_anonymity``.
    """
    if not quasi_cols:
        raise ValueError("l_diversity requires at least one quasi column")
    if l_min < 2:
        raise ValueError("l_min must be ≥ 2 (l=1 flags nothing)")
    cs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("c_v")
    )
    g = df.groupBy(sensitive_col).agg(
        F.count("*").cast("long").alias("g_v")
    )
    n = df.agg(F.count("*").cast("long").alias("n_total"))
    # the |c_v·N − g_v·k| term needs k (the class size) which is itself
    # an aggregate — attach it with a WINDOW over the quasi columns,
    # not a groupBy+rejoin: window partitioning groups NULL quasi
    # values as their own class (the documented contract), where an
    # equi-join back on the quasi keys would silently DROP them
    from pyspark.sql import Window

    wq = Window.partitionBy(*quasi_cols)
    csk = cs.withColumn("k_c", F.sum("c_v").over(wq).cast("long")).withColumn(
        "l_distinct", F.count("*").over(wq).cast("long")
    )
    # the global-distribution attach must be null-safe for the same
    # reason: NULL is a legitimate sensitive value
    gg = g.select(
        F.col(sensitive_col).alias("__gs"), "g_v"
    )
    terms = (
        csk.join(
            F.broadcast(gg), F.col(sensitive_col).eqNullSafe(F.col("__gs"))
        )
        .crossJoin(F.broadcast(n))
        .groupBy(*quasi_cols, "k_c", "l_distinct", "n_total")
        .agg(
            # decimal(38,0) carriers: c_v·N and g_v·k wrap int64 past
            # N ~ 3e9 rows — silent wrong TVD, the worst failure mode
            # for a privacy audit (ADVICE r11)
            F.sum(
                F.abs(
                    F.col("c_v").cast("decimal(38,0)") * F.col("n_total")
                    - F.col("g_v").cast("decimal(38,0)") * F.col("k_c")
                )
            ).alias("present_num"),
            F.sum("g_v").cast("long").alias("g_present"),
        )
    )
    # MUST be `div` (IntegralDivide — exact divideToIntegralValue on
    # decimals, returns bigint), NOT floor(a / b): decimal DIVISION
    # rounds to scale 6, so floor() goes off by one whenever the true
    # quotient sits within 5e-7 below an integer — reachable as soon as
    # k_c·N > ~2e6, i.e. exactly the large-N regime this escalation
    # exists for (verified: floor(decimal(4e7-1)/decimal(1e7)) = 4,
    # div = 3). The quotient is ≤ 1000, so bigint is always exact.
    tvd = F.expr(
        "(CAST(500 AS DECIMAL(38,0))"
        " * (present_num"
        "    + CAST(n_total - g_present AS DECIMAL(38,0)) * k_c))"
        " div (CAST(k_c AS DECIMAL(38,0)) * n_total)"
    ).cast("long")
    return terms.select(
        *quasi_cols,
        F.col("k_c").alias("class_size"),
        "l_distinct",
        tvd.alias("tvd_permille"),
        (F.col("l_distinct") < l_min).alias("l_at_risk"),
        (tvd > t_max_permille).alias("t_at_risk"),
    )

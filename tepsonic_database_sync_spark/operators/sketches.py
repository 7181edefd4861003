"""Approximate sketch aggregates, PAIRED with exact checks.

At 100 TB, exact ``count(DISTINCT …)`` and exact ``percentile`` are the
expensive aggregations: distinct needs a full shuffle of the distinct
keys, percentile needs a sort (or a full value multiset) per group. The
scale substitutes are sketches — HyperLogLog++ (``approx_count_distinct``)
and t-digest (``approx_percentile``) — which are one-pass, fixed-memory,
and mergeable (partial aggregation works, so the shuffle moves a few KB
per group instead of the value set).

Sketch outputs are engine-specific (HLL register layouts and digest
compressions differ), so they can never be hash-compared against DuckDB.
The contract here is the strongest cross-engine check that exists for
them: emit the EXACT value (oracle-comparable) next to a boolean
``within_*`` flag asserting the sketch landed inside its documented error
bound. The oracle pins the exact columns and expects the flag to be TRUE
— a sketch drifting out of bounds flips the flag and fails the
correctness gate, exactly like a wrong value would.

No reference counterpart (the reference has no aggregates beyond
count/sum/min — SURVEY.md §2.5); this is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_with_sketch_check(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.05,
    bound_permille: int = 150,
) -> DataFrame:
    """Per group: exact distinct count + a flag that HLL++ (relative
    standard deviation ``rsd``) landed within ``bound_permille``/1000 of
    it. 150‰ = 3σ at the default rsd — a sketch outside that is broken,
    not unlucky."""
    exact = F.count_distinct(F.col(value_col)).cast("long")
    approx = F.approx_count_distinct(F.col(value_col), rsd).cast("long")
    agg = df.groupBy(*group_cols).agg(
        exact.alias("exact_distinct"),
        approx.alias("__approx"),
        F.count("*").cast("long").alias("n_rows"),
    )
    within = (
        F.abs(F.col("__approx") - F.col("exact_distinct")) * 1000
        <= F.col("exact_distinct") * bound_permille
    )
    return agg.select(
        *group_cols, "exact_distinct", "n_rows", within.alias("within_bound")
    )


def topk_with_cms_check(
    terms: DataFrame,
    term_col: str = "term",
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Heavy hitters via a count-min sketch, PAIRED with the exact top-k
    (same contract as the other sketches: exact values oracle-hashed, the
    sketch keeps itself honest through a hard ``within_bound`` flag).

    ``terms`` carries one row per token occurrence. The CMS is linear, so
    its counters are built from the per-term aggregate (identical result,
    one shuffle over distinct terms instead of hashing every occurrence —
    at 100 TB the d×width counter grid is a few KB regardless of corpus
    size, which is the whole point: heavy-hitter queries without keeping
    the term dictionary). Estimates are biased UP only; the classic bound
    est − true ≤ e·N/width (N = total occurrences) is loosened to 3N/width
    in exact integer math. A sketch outside it flips the flag and fails
    the correctness gate.
    """
    counts = terms.groupBy(term_col).agg(
        F.count("*").cast("long").alias("exact_count")
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("__row")
    bucket = F.pmod(F.xxhash64(F.col(term_col), F.col("__row")), F.lit(width)).cast(
        "int"
    )
    cms = (
        counts.select(term_col, "exact_count", rows)
        .withColumn("__bucket", bucket)
        .groupBy("__row", "__bucket")
        .agg(F.sum("exact_count").alias("__counter"))
    )
    total = counts.agg(F.sum("exact_count").cast("long").alias("__n_total"))
    top = counts.orderBy(F.col("exact_count").desc(), F.col(term_col)).limit(k)
    est = (
        top.select(term_col, "exact_count", rows)
        .withColumn("__bucket", bucket)
        .join(F.broadcast(cms), ["__row", "__bucket"])
        .groupBy(term_col, "exact_count")
        .agg(F.min("__counter").cast("long").alias("__est"))
    )
    within = (F.col("__est") >= F.col("exact_count")) & (
        (F.col("__est") - F.col("exact_count")) * width <= 3 * F.col("__n_total")
    )
    return est.crossJoin(F.broadcast(total)).select(
        term_col, "exact_count", within.alias("within_bound")
    )


def percentile_with_sketch_check(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    pcts: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10000,
    bound_permille: int = 50,
    bound_abs: int = 500,
) -> DataFrame:
    """Per group: exact (interpolating) percentiles + flags that the
    t-digest ``approx_percentile`` landed within
    max(exact·bound_permille/1000, bound_abs) of each. approx_percentile
    returns a member value whose rank error is ≤ n/accuracy, so the value
    gap is bounded by the local quantile density — the generous default
    bounds hold at any scale factor while still catching a broken digest."""
    v = value.alias("__v")
    base = df.select(*group_cols, v)
    aggs = []
    for p in pcts:
        tag = str(int(p * 100))
        aggs.append(F.percentile(F.col("__v"), p).alias(f"p{tag}_exact"))
        aggs.append(
            F.percentile_approx(F.col("__v"), F.lit(p), F.lit(accuracy)).alias(
                f"__p{tag}_approx"
            )
        )
    aggs.append(F.count("*").cast("long").alias("n_rows"))
    agg = base.groupBy(*group_cols).agg(*aggs)
    out_cols: list[Column | str] = [*group_cols, "n_rows"]
    for p in pcts:
        tag = str(int(p * 100))
        exact, approx = F.col(f"p{tag}_exact"), F.col(f"__p{tag}_approx")
        tol = F.greatest(F.abs(exact) * bound_permille / 1000, F.lit(float(bound_abs)))
        out_cols.append(exact)
        out_cols.append((F.abs(approx - exact) <= tol).alias(f"p{tag}_within"))
    return agg.select(*out_cols)


def join_size_with_cms_check(
    a: DataFrame,
    b: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Join-cardinality estimation via the count-min INNER PRODUCT —
    the planning primitive behind "should this join be salted /
    broadcast / pre-aggregated?", next to ``skew.skew_profile``:
    |A ⋈ B| on ``key`` equals the dot product of the two per-key count
    vectors, and the CMS estimates it as min_d Σ_j A_d[j]·B_d[j] —
    d×width counters per side instead of a key dictionary, mergeable
    across partitions and time (CMS linearity), so at 100 TB each side's
    sketch is maintained incrementally and the estimate costs KBs.

    Same honesty contract as every sketch here: the EXACT cardinality is
    the hash-checked value (computed from the per-key count vectors —
    one groupBy per side + one key join of the count tables, never a
    materialized row join), and the sketch keeps itself honest through a
    hard ``within_bound`` flag: the inner-product estimate never
    underestimates, and the classic overestimate bound e·Na·Nb/width is
    loosened to integer ``3·Na·Nb/width``. A sketch outside it flips the
    flag and fails the correctness gate.

    Integer bound, stated: exact_n and the estimate are BIGINT sums of
    per-key count products — if the true join cardinality approaches
    2^63 the arithmetic overflows, but a join that size is precisely
    what this check exists to veto long before anyone runs it.

    Returns ONE row: (exact_n, n_a, n_b, within_bound).
    """
    ca = a.groupBy(F.col(key).alias("k")).agg(
        F.count("*").cast("long").alias("ca")
    )
    cb = b.groupBy(F.col(key).alias("k")).agg(
        F.count("*").cast("long").alias("cb")
    )
    exact = (
        ca.join(cb, "k")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).cast("long"))
        .toDF("exact_n")
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("__row")
    bucket = F.pmod(F.xxhash64(F.col("k"), F.col("__row")), F.lit(width)).cast(
        "int"
    )
    grid_a = (
        ca.select("k", "ca", rows)
        .withColumn("__bucket", bucket)
        .groupBy("__row", "__bucket")
        .agg(F.sum("ca").alias("wa"))
    )
    grid_b = (
        cb.select("k", "cb", rows)
        .withColumn("__bucket", bucket)
        .groupBy("__row", "__bucket")
        .agg(F.sum("cb").alias("wb"))
    )
    # a (row, bucket) pair absent from either grid contributes 0 to that
    # row's inner product — so a row with NO overlapping buckets has
    # ip = 0 and must drive the min to 0, even though the inner join
    # emits nothing for it
    est = (
        grid_a.join(grid_b, ["__row", "__bucket"])
        .groupBy("__row")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("ip"))
        .agg(
            F.when(F.count("*") < depth, F.lit(0))
            .otherwise(F.min("ip"))
            .cast("long")
        )
        .toDF("est_n")
    )
    na = a.agg(F.count("*").cast("long")).toDF("n_a")
    nb = b.agg(F.count("*").cast("long")).toDF("n_b")
    one = (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    within = (F.col("est_n") >= F.col("exact_n")) & (
        (F.col("est_n") - F.col("exact_n")) * width
        <= 3 * F.col("n_a") * F.col("n_b")
    )
    return one.select("exact_n", "n_a", "n_b", within.alias("within_bound"))


# Portable HLL geometry: 1024 registers over the 31-bit base hash — the
# remaining 21-bit field keeps floor(log2(w)) provably float-exact
# (< 2^34, the iln_milli bound), so registers are engine-identical.
HLL_M = 1024
HLL_FIELD_BITS = 21


def hll_register_table(
    df: DataFrame, value_col: str, salt: str = "hll"
) -> DataFrame:
    """ENGINE-PORTABLE HyperLogLog register table — unlike
    ``approx_count_distinct`` (whose register layout is Spark-internal
    and can never be hash-compared), these registers are pure integer
    functions of the portable content hash, so the DuckDB oracle
    reproduces the whole sketch bit-for-bit and the correctness gate
    covers the sketch itself, not just a bound flag.

    bucket = h31 mod m; w = h31 div m (21-bit field);
    rho = (field leading zeros) + 1 = FIELD_BITS − floor(log2(w)) for
    w > 0, FIELD_BITS + 1 for w = 0. Returns (bucket, max_rho) for
    OCCUPIED buckets only (missing bucket ≡ register 0 — keeps the
    frame mergeable by plain max without densifying).

    The register table is a state CRDT: merge = groupBy(bucket).max —
    commutative, associative, IDEMPOTENT — which is what makes the
    streaming maintenance below replay-safe with no commit protocol.
    Max estimable cardinality ~ m·2^FIELD_BITS ≈ 4·10⁹ at this
    geometry; widen the field (and re-prove the log2 bound) beyond that.
    """
    from tepsonic_database_sync_spark.functions.hashing import h31

    h = h31(F.concat(F.lit(salt + ":"), F.col(value_col).cast("string")))
    rho = F.when(F.col("w") == 0, F.lit(HLL_FIELD_BITS + 1)).otherwise(
        F.lit(HLL_FIELD_BITS) - F.floor(F.log2("w")).cast("long")
    )
    return (
        df.select(h.alias("h"))
        .select(
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select("bucket", rho.cast("long").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers, m: int = HLL_M) -> float:
    """Driver-side HLL++-style estimate from a (bucket, max_rho) table —
    diagnostic only (floats; the hash-checked surface is the register
    table). Uses linear counting below the standard threshold."""
    import math

    rows = {r["bucket"]: r["max_rho"] for r in registers.collect()}
    zeros = m - len(rows)
    s = zeros * 1.0 + sum(2.0 ** -rho for rho in rows.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def _mg_compress(counts: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """The Misra-Gries decrement step over an exact (key, cnt) frame:
    subtract the (capacity+1)-th largest count from every key and keep
    the strictly-positive survivors — at most ``capacity`` rows by
    construction (only keys ABOVE the offset survive). The offset is a
    VALUE (min over the top capacity+1), so ties at the boundary drop
    deterministically and the result is hash-exact regardless of row
    order — what makes the summary oracle-checkable where a
    counter-eviction formulation would not be."""
    top = counts.select("cnt").orderBy(F.col("cnt").desc()).limit(capacity + 1)
    off = top.agg(
        F.when(F.count("*") > capacity, F.min("cnt"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("off")
    )
    return (
        counts.crossJoin(F.broadcast(off))
        .select(
            key_col,
            (F.col("cnt") - F.col("off")).cast("long").alias("est_cnt"),
        )
        .filter(F.col("est_cnt") > 0)
    )


def mg_summary(
    items: DataFrame, key_col: str, capacity: int = 32
) -> DataFrame:
    """Misra-Gries frequency summary (the deterministic heavy-hitters
    sketch; Misra & Gries 1982, merge form per Agarwal et al.,
    "Mergeable Summaries", PODS 2012) — at most ``capacity`` (key,
    est_cnt) rows with the one-sided guarantee

        est ≤ true   and   true − est ≤ (N − S) / (capacity + 1)

    (N = total occurrences, S = sum of retained estimates), so every key
    with true count above that bound is RETAINED. The deterministic
    counterpart of ``topk_with_cms_check``'s randomized CMS: no hash
    collisions, under-estimates instead of over-estimates, and a summary
    whose exact content is reproducible — hence a full DuckDB oracle
    rather than a within-bound flag.

    Scale shape: one map-side-combined count aggregation over the keys,
    a TakeOrdered over capacity+1 rows for the offset, and a broadcast
    of the 1-row offset — the summary never exceeds ``capacity`` rows,
    which is the point: heavy hitters at 100 TB with KB-sized state.
    ``streaming/ops.mg_topk_stream`` maintains the same summary
    incrementally (sum-merge then the same compress step — the error
    bound is preserved under arbitrary merges, the PODS'12 result).
    """
    counts = items.groupBy(key_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return _mg_compress(counts, key_col, capacity)


def mg_merge(
    state: DataFrame, batch: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Merge two MG summaries (or a summary and an exact batch count
    frame — exact counts ARE a valid summary): sum per key, then one
    compress step. Deterministic, error-bound-preserving; NOT idempotent
    (sums double-count a replayed batch), which is why the streaming
    applier needs the atomic-commit protocol where the HLL applier needs
    none."""
    u = (
        state.unionByName(batch)
        .groupBy(key_col)
        .agg(F.sum("est_cnt").cast("long").alias("cnt"))
    )
    return _mg_compress(u, key_col, capacity)


KMV_K = 64
KMV_SPACE = float(1 << 60)  # h60 hash space as an exact double (2^60)


def kmv_summary(items: DataFrame, set_col: str, value_col: str, k: int = KMV_K) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count summary per set
    — Bar-Yossef et al. (RANDOM 2002); the mergeable bottom-k form and
    the multi-set estimators follow Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations" (SIGMOD 2007)
    — the deterministic-given-h60 member of the cardinality family next
    to the register-based HLL (`hll_register_table`): the summary
    CONTENT is the k smallest distinct h60 hash values, so it is
    hash-exact and fully oracle-checkable, and two summaries merge by
    "union then keep k smallest" (the theta-sketch mechanic).

    Estimator, integer-deterministic in both engines: if the set holds
    fewer than k distinct values the summary IS the set (est = size,
    exact); otherwise est = ROUND((k-1) / h_(k) · 2^60) through the
    shared correctly-rounded double pipeline (h_(k) = k-th smallest
    hash; both engines evaluate the identical expression tree, so the
    bits match even though h_(k) exceeds 2^53).

    100 TB shape — the two-level tournament, never a per-set global
    sort: after the distinct on (set, hash) (wide keys, map-side
    partial), each of 64 hash-derived sub-buckets keeps its own k
    smallest (collect_list is bounded by the bucket's distinct count;
    the SORT is per-bucket), then the per-set merge sorts ≤ 64·k
    values. The set key alone is never a shuffle key for the raw
    stream, so two sets ≠ two reducers.

    Returns (``set_col``, kmv array<long>, n_kept, kth_hash, est).
    """
    from tepsonic_database_sync_spark.functions.hashing import h60

    d = items.select(
        F.col(set_col), h60(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    lvl1 = (
        d.groupBy(set_col, (F.col("h") % 64).alias("__b"))
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs"))
    )
    lvl2 = (
        lvl1.select(set_col, F.explode("hs").alias("h"))
        .groupBy(set_col)
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("kmv"))
    )
    return lvl2.select(
        set_col,
        "kmv",
        F.size("kmv").cast("long").alias("n_kept"),
        F.element_at("kmv", F.size("kmv")).cast("long").alias("kth_hash"),
        kmv_estimate(F.col("kmv"), k).alias("est"),
    )


def kmv_estimate(kmv: Column, k: int = KMV_K) -> Column:
    """The KMV cardinality estimate from a bottom-k array (see
    ``kmv_summary`` for the exact integer/double contract)."""
    return (
        F.when(F.size(kmv) < k, F.size(kmv).cast("long"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                / F.element_at(kmv, k).cast("double")
                * F.lit(KMV_SPACE),
                0,
            ).cast("long")
        )
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count set algebra over two KMV summaries (Beyer et al.
    2007): merge = k smallest of the union of the two bottom-k arrays;
    intersection via the ρ/k fraction of the merged summary present in
    BOTH inputs, scaled by the union estimate ((ρ · est_union) DIV k —
    exact ρ itself when the merged summary holds the whole union).
    Everything happens on two single-row frames (array ops on ≤ 2k
    longs) — the corpus is never touched again.

    Returns 4 rows: (set_key ∈ {a, b, union, intersect}, n_kept,
    kth_hash, est).
    """
    ja = a.select(
        F.col("kmv").alias("kmv_a"),
        F.col("n_kept").alias("n_a"),
        F.col("kth_hash").alias("kth_a"),
        F.col("est").alias("est_a"),
    )
    jb = b.select(
        F.col("kmv").alias("kmv_b"),
        F.col("n_kept").alias("n_b"),
        F.col("kth_hash").alias("kth_b"),
        F.col("est").alias("est_b"),
    )
    j = ja.join(F.broadcast(jb))  # 1 row × 1 row
    u = F.slice(F.array_sort(F.array_union(F.col("kmv_a"), F.col("kmv_b"))), 1, k)
    j = j.withColumn("kmv_u", u).withColumn(
        "rho",
        F.size(
            F.filter(
                F.col("kmv_u"),
                lambda x: F.array_contains(F.col("kmv_a"), x)
                & F.array_contains(F.col("kmv_b"), x),
            )
        ).cast("long"),
    ).withColumn("est_u", kmv_estimate(F.col("kmv_u"), k))
    rows = F.array(
        F.struct(
            F.lit("a").alias("set_key"),
            F.col("n_a").alias("n_kept"),
            F.col("kth_a").alias("kth_hash"),
            F.col("est_a").alias("est"),
        ),
        F.struct(
            F.lit("b").alias("set_key"),
            F.col("n_b").alias("n_kept"),
            F.col("kth_b").alias("kth_hash"),
            F.col("est_b").alias("est"),
        ),
        F.struct(
            F.lit("union").alias("set_key"),
            F.size("kmv_u").cast("long").alias("n_kept"),
            F.element_at("kmv_u", F.size("kmv_u")).cast("long").alias("kth_hash"),
            F.col("est_u").alias("est"),
        ),
        F.struct(
            F.lit("intersect").alias("set_key"),
            F.col("rho").alias("n_kept"),
            F.element_at("kmv_u", F.size("kmv_u")).cast("long").alias("kth_hash"),
            F.when(F.size("kmv_u") < k, F.col("rho"))
            .otherwise(F.expr(f"(rho * est_u) DIV {k}"))
            .cast("long")
            .alias("est"),
        ),
    )
    return j.select(F.explode(rows).alias("r")).select(
        "r.set_key", "r.n_kept", "r.kth_hash", "r.est"
    )

"""Deterministic sampling — reproducible splits for training data.

``df.sample()`` is seed-and-partitioning dependent: the same row can land
in different splits after a repartition or an engine upgrade — poison for
train/test hygiene. Everything here derives membership from a *portable
content hash* of the row key (the md5-based ``h60``, reproducible in any
SQL engine), so a row's split is a pure function of its key: stable
across runs, engines, partitionings, and cluster sizes, and exactly
oracle-checkable.

At 100 TB both operators are narrow projections (hash + compare) with no
shuffle; the stratified sampler adds one window per stratum, partitioned
on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.functions.hashing import h60


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable 0-99 bucket from a key: h60('{salt}:' || key) % 100."""
    return h60(F.concat(F.lit(salt + ":"), key.cast("string"))) % 100


def dataset_split(
    df: DataFrame,
    key: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket (train_pct/val_pct/rest).
    Adds ``split`` and keeps the input columns."""
    b = split_bucket(F.col(key), salt)
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def mixture_sample(
    df: DataFrame,
    group: str,
    key: str,
    pcts: dict[str, int],
    salt: str = "mix",
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic domain-mixture resampling: keep ``pcts[group]`` percent
    of each group's rows (0-100), selected by the portable content hash of
    the row key — the "re-weight the corpus to a target language/source
    mixture" step of a pretraining-data pipeline.

    Unlike fraction-based ``sampleBy``, membership is a pure function of
    the key: stable across runs, engines, partitionings, and incremental
    corpus growth (a doc already selected stays selected when new docs
    arrive — essential for reproducible dataset releases).

    At 100 TB this is a narrow projection + filter (hash, map lookup,
    compare): no shuffle, no driver-side state; the weight map ships as a
    literal in the plan."""
    mapping = F.create_map(
        *[F.lit(x) for kv in pcts.items() for x in kv]
    )
    pct = F.coalesce(mapping[F.col(group)], F.lit(default_pct))
    return df.filter(split_bucket(F.col(key), salt) < pct)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, k: int, salt: str = "sample"
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by (hash, key) and keep the first k. Hash order is uniform →
    an unbiased without-replacement sample, yet fully reproducible; the
    (hash, key) tie-break makes it total even on hash collisions."""
    h = h60(F.concat(F.lit(salt + ":"), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(h, F.col(key))
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key: str,
    k: int,
    stratum: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES), engine-exact: each row draws an
    exponential "arrival time" e_i = -ln(u_i)/w_i from its content-hash
    uniform u_i and the k SMALLEST arrivals win — inclusion probability
    rises with weight, yet membership is a pure function of (salt, key),
    so the sample is stable across runs, engines, and partitionings
    (the property mixture_sample already provides for unweighted rates).

    Integer fixed point throughout: u as micro-units from the portable
    hash, -ln(u) in milli-nats via the shared integer log, and the
    division by the weight in micro-precision (truncating DIV, identical
    both engines). Ties (hash collisions) break on the key, so the top-k
    is total. Weights must be ≥ 1 (integer); rows with weight < 1 are
    dropped — a zero weight means "never sample".

    Scale shape: the global form compiles to TakeOrderedAndProject (no
    full sort); the per-stratum form is one window over rows
    hash-partitioned by stratum — the same shape as stratified_sample,
    with the arrival time replacing the raw hash as the order key.
    """
    from tepsonic_database_sync_spark.operators.text import iln_milli

    u_micro = (
        h60(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))) % 1000000
    ) + 1
    helper = {"__w", "__negln", "__arr", "__rn"}
    if helper & set(df.columns):
        raise ValueError(
            f"columns collide with sampling helpers: {helper & set(df.columns)}"
        )
    out = (
        df.withColumn("__w", weight.cast("long"))
        .filter(F.col("__w") >= 1)
        .withColumn(
            "__negln", (F.lit(6908) - iln_milli(u_micro)).cast("long")
        )
        .withColumn("__arr", F.expr("(__negln * 1000000) div __w"))
    )
    if stratum is None:
        return (
            out.orderBy(F.col("__arr"), F.col(key))
            .limit(k)
            .drop("__w", "__negln", "__arr")
        )
    win = Window.partitionBy(stratum).orderBy(F.col("__arr"), F.col(key))
    return (
        out.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__w", "__negln", "__arr", "__rn")
    )


def class_balance(df: DataFrame, label: str, key: str) -> DataFrame:
    """Exact class-balanced downsample: every label class is cut to the
    size of the SMALLEST class, keeping each class's rows with the
    lowest content hash — deterministic across runs, engines, and
    partitionings, like every sampler here (no ``df.sample`` seeds).

    The two-sided shape: class sizes are one tiny map-side-combined
    aggregate (min over it broadcast back as a 1-row cross join); the
    per-class selection is ONE row_number window partitioned by label,
    ordered by (h60, key). That per-class hash order is a real
    distributed sort of the fact table — the honest cost of an EXACT
    quota; when a ±ε miss is acceptable at 100 TB, the cheaper cousin
    is a pure hash-threshold filter (``h60 % N < quota·N/class_n``,
    no sort), same as ``mixture_sample``.

    Returns the kept rows: (key, label).
    """
    from pyspark.sql import Window

    counts = df.groupBy(label).agg(F.count("*").alias("class_n"))
    m = counts.agg(F.min("class_n").alias("m"))
    h = h60(F.concat(F.lit("bal:"), F.col(key).cast("string")))
    w = Window.partitionBy(label).orderBy(h.asc(), F.col(key).asc())
    return (
        df.select(key, label)
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("m"))
        .select(key, label)
    )


def domain_cap(
    df: DataFrame,
    group: str,
    key: str,
    priority: Column,
    n: int,
) -> DataFrame:
    """Per-domain cap with quality-ranked survivors — the standard
    pretraining curation step ("at most N documents per source, keep the
    best"): caps over-represented domains where a global fraction
    sampler (``mixture_sample``) would still admit their long tail.

    Order within a domain is (priority DESC, content hash, key) — the
    hash makes the tie region (priority scores are coarse) a fair
    deterministic lottery instead of an id-order bias, and keeps the
    selection a pure function of the data like every sampler here.

    One window per domain over (key, priority) projections — the honest
    exact-quota sort, same trade as ``class_balance`` (its docstring
    names the sort-free approximate cousin).

    Returns (key, group, priority) for the kept rows.
    """
    from pyspark.sql import Window

    h = h60(F.concat(F.lit("cap:"), F.col(key).cast("string")))
    w = Window.partitionBy(group).orderBy(
        F.col("priority").desc(), h.asc(), F.col(key).asc()
    )
    return (
        df.select(key, group, priority.alias("priority"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(key, group, "priority")
    )


EPOCHS_DEFAULT = 3


def epoch_order(
    df: DataFrame, key: str, epochs: int = EPOCHS_DEFAULT
) -> DataFrame:
    """Deterministic multi-epoch shuffle for training dataloaders: for
    each epoch e, every row gets a position in an epoch-specific
    pseudorandom permutation — ordered by h60("epoch:e:" || key) — so
    (a) every epoch visits the data in a different order, (b) the order
    is a pure function of (epoch, key): reproducible across engines,
    repartitionings, and restarts mid-epoch, with no RNG state to
    checkpoint (the property ``df.sample``-style seeded shuffles lose
    the moment partitioning changes).

    One generator explode (×epochs) + one rank per epoch. The rank is a
    window ordered by the hash — a full distributed sort per epoch,
    which IS the honest cost of a global permutation (it is exactly the
    between-epoch shuffle pass training pipelines schedule); at 100 TB
    each epoch's sort is an independent range-partitioned sort on a
    uniform key, and pipelines that only need per-shard shuffling drop
    the global window for a (shard, hash) sort at scan speed.

    Returns (key, epoch, position), position 1-based within each epoch.
    """
    from pyspark.sql import Window

    e = df.select(key).select(
        F.col(key),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(epochs) - 1))
        ).alias("epoch"),
    )
    h = h60(
        F.concat(
            F.lit("epoch:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col(key).cast("string"),
        )
    )
    w = Window.partitionBy("epoch").orderBy(h.asc(), F.col(key).asc())
    return e.select(
        key,
        F.col("epoch").cast("long").alias("epoch"),
        F.row_number().over(w).cast("long").alias("position"),
    )


MIX_BUDGET_PERMILLE = 500       # target token budget = 50% of corpus
MIX_ALPHA_ISQRT = True          # temperature α = 0.5 (integer sqrt)
MIX_CAP_EPOCHS_PERMILLE = 2000  # per-domain cap = 2.0 epochs of its data
MIX_ROUNDS = 8                  # water-filling rounds (>= binding domains)


def _isqrt(n: Column) -> Column:
    """Engine-exact integer sqrt: double sqrt is within 1 ulp for
    n < 2^52, and the two integer corrections pin floor(sqrt(n))
    exactly — the same double-then-correct trick both engines can run
    bit-identically (token counts at 100 TB are ~2^44, inside the
    bound)."""
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("long")
    s1 = F.when(s0 * s0 > n, s0 - 1).otherwise(s0)
    return F.when((s1 + 1) * (s1 + 1) <= n, s1 + 1).otherwise(s1)


def mixture_rebalance(
    docs: DataFrame,
    group: str = "source",
    budget_permille: int = MIX_BUDGET_PERMILLE,
    cap_epochs_permille: int = MIX_CAP_EPOCHS_PERMILLE,
    rounds: int = MIX_ROUNDS,
) -> DataFrame:
    """Temperature-resampled domain mixture under repetition caps — the
    published data-mixing rule a multi-domain pre-training corpus is
    weighted by: α-temperature sampling (p_i ∝ n_i^α, α = 0.5 — the
    multilingual sampling rule of Arivazhagan et al. 2019 / Conneau &
    Lample 2019) with a max-epochs cap per domain (repeating a domain
    beyond a few epochs stops helping — Muennighoff et al. 2023), solved
    to a fixed point by iterative WATER-FILLING: allocate the budget
    ∝ isqrt(n_i) over uncapped domains, cap whoever overflows
    (alloc_i ≤ cap_epochs·n_i), redistribute the freed budget over the
    rest, repeat. Every quantity integer (isqrt is the double-corrected
    exact form), so the DuckDB oracle unrolls the same rounds
    bit-for-bit — the kmeans/LPA iterative-oracle shape.

    Each round caps at least one new domain or is the fixed point, so
    ``rounds`` >= the number of binding domains suffices; with the
    default budget (50% of corpus tokens) and cap (2 epochs) only
    far-undersized domains bind and convergence is 1-2 rounds. The
    round count is a plan-depth constant, not a convergence guess: the
    oracle runs the IDENTICAL count, so parity never depends on early
    convergence.

    Scale shape: ONE map-side-combined token-count aggregate over the
    corpus (the only corpus-scale work); the water-filling iterates on
    the post-aggregate per-domain frame (|domains| rows — single-digit
    KB even at thousands of domains), each round's cap_sum/w_sum as
    WHOLE-FRAME window sums so the round consumes its predecessor
    exactly once — linear lineage (the agg + crossJoin alternative
    consumes it twice per round and the plan subtree SQUARES: measured
    510 BroadcastNestedLoopJoins at 8 rounds). The unpartitioned
    window is deliberate: it only ever sees the per-domain frame,
    never corpus rows. At 100 TB: one scan + one narrow shuffle, then
    domain-count-scale arithmetic kept inside the one lazy plan.

    Returns (domain, n_tokens, weight, cap_tokens, alloc_tokens,
    epochs_permille, capped): alloc_tokens sums to ≤ the budget,
    epochs_permille = alloc·1000/n_tokens (how many epochs of the
    domain the mixture uses), capped = 1 where the cap bound.
    """
    from tepsonic_database_sync_spark.operators.text import tokens

    toked = docs.select(
        F.col(group).alias("domain"),
        F.size(
            F.filter(tokens(F.col("text")), lambda x: x != F.lit(""))
        ).cast("long").alias("n"),
    )
    counts = toked.groupBy("domain").agg(
        F.sum("n").cast("long").alias("n_tokens")
    )
    return mixture_waterfill(
        counts,
        budget_permille=budget_permille,
        cap_epochs_permille=cap_epochs_permille,
        rounds=rounds,
    )


def mixture_waterfill(
    dom_counts: DataFrame,
    budget_permille: int = MIX_BUDGET_PERMILLE,
    cap_epochs_permille: int = MIX_CAP_EPOCHS_PERMILLE,
    rounds: int = MIX_ROUNDS,
) -> DataFrame:
    """The water-filling core of ``mixture_rebalance``, taking a
    precomputed per-domain token-count frame (domain, n_tokens) — so
    the budget UNIT is the caller's: whitespace tokens (the default
    entry), true BPE tokenizer tokens (``bpe_encode`` counts — the
    published data-mixture unit), byte counts, anything mergeable.
    Identical algebra and plan from the per-domain frame on; see
    ``mixture_rebalance`` for the algorithm and scale notes."""
    dom = (
        dom_counts.select(
            "domain",
            "n_tokens",
            _isqrt(F.col("n_tokens")).alias("weight"),
            F.expr(f"n_tokens * {cap_epochs_permille} div 1000")
            .cast("long")
            .alias("cap_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    budget = dom.agg(
        F.expr(f"sum(n_tokens) * {budget_permille} div 1000")
        .cast("long")
        .alias("t_budget")
    )
    # per-round stats as WHOLE-FRAME WINDOW sums over the per-domain
    # frame: each round then consumes the previous round's frame exactly
    # ONCE, so lineage is LINEAR in rounds (the agg + crossJoin form
    # consumed it twice per round — the plan subtree SQUARED, 510 BNLs
    # at 8 rounds; the r10 star-fusion failure mode). The unpartitioned
    # window is deliberate and safe: it runs on the post-aggregate
    # per-domain frame (|domains| rows), never on corpus data.
    w_all = Window.partitionBy()
    state = dom.crossJoin(F.broadcast(budget)).select(
        "domain",
        "n_tokens",
        "weight",
        "cap_tokens",
        "t_budget",
        F.lit(0).cast("long").alias("capped"),
        F.lit(0).cast("long").alias("prov"),
    )
    for _ in range(rounds):
        cap_sum = F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap_tokens"))).over(
                w_all
            ),
            F.lit(0),
        ).cast("long")
        w_sum = F.coalesce(
            F.sum(F.when(F.col("capped") == 0, F.col("weight"))).over(w_all),
            F.lit(0),
        ).cast("long")
        # greatest(..., 0): the remaining budget is provably >= 0 (a
        # domain caps only when its provisional share exceeded its cap,
        # so the subtracted caps undercount the shares they replace),
        # but the clamp makes the div-vs-floor parity unconditional —
        # Spark `div` truncates toward zero, DuckDB `//` floors, and
        # they only agree on non-negative numerators
        share = F.when(
            F.col("__w_sum") > 0,
            F.expr(
                "greatest(t_budget - __cap_sum, 0L) * weight div __w_sum"
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        state = (
            state.withColumn("__cap_sum", cap_sum)
            .withColumn("__w_sum", w_sum)
            .select(
                "domain",
                "n_tokens",
                "weight",
                "cap_tokens",
                "t_budget",
                F.when(
                    (F.col("capped") == 1)
                    | (
                        F.when(
                            F.col("capped") == 1, F.col("cap_tokens")
                        ).otherwise(share)
                        > F.col("cap_tokens")
                    ),
                    1,
                )
                .otherwise(0)
                .cast("long")
                .alias("capped"),
                F.when(F.col("capped") == 1, F.col("cap_tokens"))
                .otherwise(share)
                .alias("prov"),
            )
        )
    alloc = F.when(
        F.col("capped") == 1, F.col("cap_tokens")
    ).otherwise(F.col("prov"))
    # epochs via INTEGER div, not the floor-of-double trick: alloc is a
    # corpus-scale aggregate (token counts ~2^44 ⇒ alloc·1000 ~2^54,
    # past the 2^52 double-exactness bound _permille relies on for its
    # per-doc operands). Both operands non-negative, so Spark `div` ==
    # DuckDB `//` (ADVICE r13).
    return state.select(
        "domain",
        "n_tokens",
        "weight",
        "cap_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        "capped",
    ).select(
        "domain",
        "n_tokens",
        "weight",
        "cap_tokens",
        "alloc_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("alloc_tokens * 1000 div n_tokens").cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("epochs_permille"),
        "capped",
    )

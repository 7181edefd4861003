"""Deduplication operators — exact, n-gram Jaccard, MinHash-LSH, SimHash.

Core of the training-data-pipeline extension (BASELINE.json north star).
The reference has nothing comparable (its "uniqueNumbers" never dedupes —
src/routes/products.js:185-187); these are the engine's own, designed
Spark-first for the 100 TB case:

- exact: hash-groupBy on a normalized fingerprint. One shuffle on a
  uniformly-distributed md5 key — the optimal plan at any scale.
- n-gram Jaccard: pairwise within *blocks* (never all-pairs): candidate
  generation is an equi-join on a blocking key, verification is an array
  intersect — O(sum of block²), not O(N²).
- MinHash-LSH: k salted 60-bit hashes → min per doc → band signatures →
  candidates = equi-join on (band, band_hash). The classic sub-quadratic
  near-dup pipeline; every step is a narrow projection or an equi-join
  shuffle on well-spread hash keys.
- SimHash: explode(token × bit) → groupBy sign-sum → bit pack. Pure
  relational form — distributes trivially.

Everything is built-in expressions (md5/conv/array ops) so the whole
suite stays JVM-side and oracle-checkable (see functions.hashing.h60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.functions.hashing import h60, h60_salted
from tepsonic_database_sync_spark.operators.text import normalize_text, tokens

MINHASH_K = 16
LSH_BAND_SIZE = 4


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one keeper (min
    doc_id) per distinct content, with the duplicate count."""
    fp = docs.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("fp"))
    return fp.groupBy("fp").agg(
        F.min("doc_id").cast("long").alias("keeper_doc_id"),
        F.count("*").cast("long").alias("n_copies"),
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (pure array expr).

    Built as a ``zip_with``/``slice`` chain — element-parallel, one lambda
    eval per element — NOT ``transform(sequence, get(t, i+j))``, whose
    per-index random access runs ~12× slower (measured at sf0.1).
    Guarded: size < n yields an empty array (Spark's ``sequence`` would
    descend, and slice lengths would go negative).
    """
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.size(toks)),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    windowed = F.slice(grams, 1, F.size(toks) - n + 1)
    return F.when(F.size(toks) >= n, F.array_distinct(windowed)).otherwise(
        F.array().cast("array<string>")
    )


def _with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    from tepsonic_database_sync_spark.io import fan_out_cpu

    # two-step select: tokens land as an attribute BEFORE shingling, so the
    # split() runs once per row — inlining the expression would re-split
    # per element access inside the transform lambda (observed 5× cost)
    # fan_out_cpu (r18): the tokenize+shingle+md5 chain downstream is
    # CPU-bound per row; a near-single-partition corpus would run it on
    # 1-2 cores (no-op when the input arrives well-split)
    toked = fan_out_cpu(docs).select(
        "doc_id", "n_chars", tokens(F.col("text")).alias("t")
    )
    return toked.select(
        "doc_id", "n_chars", word_shingles(F.col("t"), n).alias("shingles")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, block_chars: int = 100, min_inter: int = 2
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: candidate pairs share a length
    block (n_chars // block_chars); overlap reported as exact integers
    (inter/union sizes) — no float ratios.

    RECALL CAVEAT: length blocking misses near-dup pairs that straddle a
    block boundary (e.g. 99 vs 101 chars). Use this form only when the
    cheap candidate key matters more than recall;
    ``ngram_jaccard_pairs_banded`` (the default candidate generator —
    MinHash-LSH bands) has no length-boundary failure mode.
    """
    s = _with_shingles(docs, n)
    a = s.select(
        F.col("doc_id").alias("a_id"),
        F.col("shingles").alias("a_sh"),
        F.floor(F.col("n_chars") / block_chars).cast("long").alias("blk"),
    )
    b = s.select(
        F.col("doc_id").alias("b_id"),
        F.col("shingles").alias("b_sh"),
        F.floor(F.col("n_chars") / block_chars).cast("long").alias("blk"),
    )
    pairs = a.join(b, "blk").filter(F.col("a_id") < F.col("b_id"))
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("long")
    union = (F.size("a_sh") + F.size("b_sh")).cast("long") - inter
    return (
        pairs.select(
            "blk",
            "a_id",
            "b_id",
            inter.alias("inter_size"),
            union.alias("union_size"),
        )
        .filter(F.col("inter_size") >= min_inter)
    )


def ngram_jaccard_pairs_banded(
    docs: DataFrame, n: int = 3, min_inter: int = 2
) -> DataFrame:
    """The DEFAULT near-dup Jaccard pipeline: MinHash-LSH banded candidate
    generation + exact shingle-set verification. Unlike the length-block
    variant it has no block-boundary recall hole — a pair is a candidate
    whenever any signature band collides, which is driven by actual
    content similarity, not by document length landing in the same bucket.

    Cost shape at 100 TB: signatures are one md5 per shingle + k mins in
    one groupBy; candidates are an equi-join on (band, band_key);
    verification re-joins the shingle arrays only for candidate pairs —
    every step is a narrow projection or an equi-join on well-spread hash
    keys, never all-pairs. The shingle frame feeds THREE consumers
    (signatures + both verify sides), so it is materialized once
    (r18, guide §2.4 — the jaccard_pairs_prefix lesson): without the
    checkpoint the corpus re-tokenizes per consumer."""
    s = (
        _with_shingles(docs, n)
        .select("doc_id", "shingles")
        .localCheckpoint(eager=True)
    )
    cands = lsh_candidate_pairs(minhash_sig_array(docs, n=n, shingled=s))
    a = s.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = s.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    pairs = cands.join(a, "a_id").join(b, "b_id")
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("long")
    union = (F.size("a_sh") + F.size("b_sh")).cast("long") - inter
    return pairs.select(
        "a_id", "b_id", inter.alias("inter_size"), union.alias("union_size")
    ).filter(F.col("inter_size") >= min_inter)


def minhash_sig_array(
    docs: DataFrame,
    k: int = MINHASH_K,
    n: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """k-wide MinHash signature per document as ONE array row
    (doc_id, sigs: array<long>) — a single groupBy over the shingle hashes.

    One md5 per shingle (the expensive op), then k affine maps
    (a·h31 + b) mod 2^31-1 folded into a single groupBy as k min
    aggregates — no k-fold row or hash blowup. 5-10× faster than the
    naive salt-k-times form at any scale, same collision behavior.

    ``shingled`` (r18, guide §2.4): an optional caller-provided
    (doc_id, shingles) frame — callers that ALSO consume the shingle
    arrays (lsh_quality's exact-truth side, the banded verify join)
    materialize the frame once and pass it here, so the corpus is
    tokenized+shingled ONCE per query instead of once per consumer.
    Must be exactly ``_with_shingles(docs, n)``'s output columns.
    """
    from tepsonic_database_sync_spark.functions.hashing import (
        MERSENNE31,
        affine_coeffs,
        h31,
    )

    s = shingled if shingled is not None else _with_shingles(docs, n)
    hashed = s.select("doc_id", F.explode("shingles").alias("sh")).select(
        "doc_id", h31(F.col("sh")).alias("h")
    )
    return hashed.groupBy("doc_id").agg(
        F.array(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).cast("long")
                for a, b in affine_coeffs(k)
            ]
        ).alias("sigs")
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K, n: int = 3) -> DataFrame:
    """Long-format view of the signature (doc_id, i, sig) — the
    oracle-comparable shape."""
    return minhash_sig_array(docs, k, n).select(
        "doc_id", F.posexplode("sigs").alias("i", "sig")
    ).select(
        "doc_id", F.col("i").cast("int").alias("i"), F.col("sig").cast("long").alias("sig")
    )


def _banded(sig_arr: DataFrame, k: int, band_size: int) -> DataFrame:
    """(doc_id, band, band_key) from array signatures — pure array exprs:
    band keys are sliced out of the signature array in the same stage that
    produced it. The long-format alternative (posexplode → second groupBy)
    costs an extra k-rows/doc aggregation pass — not an extra shuffle,
    since Spark reuses the doc_id partitioning for the (doc_id, band)
    re-group — but the slice form removes both the pass and the k× row
    materialization between them."""
    n_bands = k // band_size
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                ",", F.array_sort(F.slice(F.col("sigs"), b * band_size + 1, band_size))
            )
        ),
    )
    return sig_arr.select("doc_id", F.posexplode(keys).alias("band", "band_key"))


def lsh_candidate_pairs(
    sigs: DataFrame, band_size: int = LSH_BAND_SIZE, k: int = MINHASH_K
) -> DataFrame:
    """LSH banding: candidates = pairs of docs sharing any (band, band_key)
    bucket. Accepts array-form signatures (doc_id, sigs) from
    ``minhash_sig_array`` (preferred — banding is shuffle-free) or the
    long form (doc_id, i, sig), which is re-banded with a groupBy."""
    if "sigs" in sigs.columns:
        banded = _banded(sigs, k, band_size)
    else:
        banded = (
            sigs.withColumn("band", F.floor(F.col("i") / band_size).cast("long"))
            .groupBy("doc_id", "band")
            .agg(
                F.md5(
                    F.concat_ws(",", F.array_sort(F.collect_list(F.col("sig"))))
                ).alias("band_key")
            )
        )
    a = banded.select(
        F.col("doc_id").alias("a_id"), "band", F.col("band_key")
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), "band", F.col("band_key")
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 20, strict: bool = True
) -> DataFrame:
    """Connected components by iterative min-label propagation — the step
    that turns near-dup candidate PAIRS into dedup CLUSTERS (keeper = the
    cluster's min id). Returns (node, comp).

    ``edges``: (a_id, b_id) undirected; ``nodes``: one column ``node``
    (so isolated docs form singleton clusters).

    Each iteration is one join + one groupBy over the edge list; labels
    converge in O(cluster diameter) rounds — near-dup clusters are
    shallow, so this terminates in a handful of iterations. The driver
    loop only orchestrates (one small ``count()`` per round to detect the
    fixpoint); all data movement is distributed. At extreme graph scale
    swap the loop body for the large-star/small-star contraction
    (Kiveris et al.), which keeps the same interface.

    Convergence is VERIFIED, never assumed: plain propagation advances
    min-labels one hop per round, so a component with diameter > max_iter
    (a long near-dup chain) would otherwise return silently-wrong labels.
    ``strict=True`` (default) raises if the fixpoint wasn't reached;
    ``strict=False`` logs a warning and returns the partial labels (for
    exploratory use only).
    """
    import warnings

    sym = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(
            edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
        )
        .distinct()
    )
    labels = nodes.select(F.col("node"), F.col("node").alias("comp"))
    prev = None
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                    "new_comp"
                ),
                F.col("comp").alias("old_comp"),
            )
        ).persist()
        n_changed = updated.filter(F.col("new_comp") < F.col("old_comp")).count()
        labels = updated.select("node", F.col("new_comp").alias("comp"))
        # release the previous round's cache — it's fully consumed; only
        # the latest labels need to stay materialized
        if prev is not None:
            prev.unpersist()
        prev = updated
        if n_changed == 0:
            converged = True
            break
    if not converged:
        if prev is not None:
            prev.unpersist()
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds — a candidate component has diameter > max_iter and the "
            "returned labels would be wrong. Raise max_iter (rounds needed = "
            "longest chain length) or switch to star-contraction."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels
    if prev is not None:
        # materialize the final labels eagerly, then drop the cache entry
        # so no plan fragments linger in the session CacheManager (they
        # would silently substitute into unrelated later queries)
        final = labels.localCheckpoint(eager=True)
        prev.unpersist()
        return final
    return labels


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 50,
    edges_canonical: bool = False,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same interface and output as ``connected_components``, but
    converges in O(log²) rounds of the component size instead of
    O(diameter): the web-graph-scale body for deep/chain-shaped
    components, where plain min-label propagation would need one round
    per hop.

    Each round is two window-aggregate passes over the shrinking edge
    list (r10 — one exchange per star; see the inline comment); the
    fixpoint test compares an order-insensitive edge-set signature
    (count + XOR of per-edge hashes — XOR, not SUM, so the fold can't
    overflow under ANSI mode). r10 also folds the signature into the
    materializing job (lazy localCheckpoint triggered by the sig
    aggregate), so the driver schedules ONE job per round where r9 ran
    two; see the inline comment for why rounds must NOT be stacked
    without a materialization boundary.

    - large-star: every node links its LARGER neighbors to the minimum of
      its whole neighborhood (including itself);
    - small-star: every node links its ≤ neighbors (and itself) to the
      minimum of that subset.
    At the fixpoint every edge is (node → component-min root).

    Orientation invariant (r9, −2 shuffles/round): every edge frame in
    the loop keeps ``u > v`` — the input is canonicalized once, and both
    stars emit (x, m) with m strictly below x (m is a neighborhood min
    with the x = m case filtered). A set with all edges descending
    cannot contain a pair AND its reverse, so symmetrization is a plain
    union — no ``.distinct()`` exchange. The per-star ``.distinct()``
    calls that bound the frame SIZE are kept; only the provably-no-op
    dedup was removed. At sf0.1 this is latency-neutral (round time is
    scheduling-dominated — SCALE.md r9); the payoff is shuffle VOLUME
    at real scale: two fewer full-edge-frame exchanges per round.
    """
    # ``edges_canonical=True`` (r17, guide §2.4 "a distinct on data that
    # is already unique"): the caller certifies the pair frame is
    # already DISTINCT with a_id < b_id strict (true for every candidate
    # generator in this repo — lsh_candidate_pairs ends .distinct(),
    # embedding_neardup_pairs and cooccur_pairs end in a groupBy/unique
    # join, all with the a < b filter), so the canonicalization below —
    # a full exchange of the pair frame at any scale — is a provable
    # no-op and is skipped. Default False keeps the defensive form for
    # arbitrary inputs.
    if edges_canonical:
        E = edges.select(
            F.col("b_id").alias("u"), F.col("a_id").alias("v")
        )
    else:
        E = (
            edges.select(
                F.greatest("a_id", "b_id").alias("u"),
                F.least("a_id", "b_id").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _sig(e: DataFrame) -> tuple:
        r = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    def _sym(e: DataFrame) -> DataFrame:
        # no .distinct(): with every edge u > v, e and its reverse are
        # disjoint and e itself is already distinct (invariant above)
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    # r10: each star computes its neighborhood minimum with a WINDOW
    # aggregate over partitionBy(u) instead of groupBy(u) + self-join —
    # one exchange per star instead of two, and no join. Skew profile is
    # UNCHANGED: the old join already co-located every edge of a hub
    # node in one task (the groupBy's map-side combine only slimmed the
    # tiny mins side, never the edge side), so the window moves exactly
    # the data the join moved, minus the extra mins exchange. Measured
    # at sf0.1 (SCALE.md r10): −25% Spark jobs, −22% wall vs the
    # lazy-checkpoint groupBy+join form, output bit-identical.
    from pyspark.sql import Window

    w_u = Window.partitionBy("u")

    def _round(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        # large-star: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(w_u), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large-star output:
        # S = {v ∈ Γ(u): v ≤ u}; m = min(S ∪ {u}); emit (w, m) for w ∈ S ∪ {u}
        sym2 = _sym(ls)
        sm = sym2.filter(F.col("v") <= F.col("u")).withColumn(
            "m", F.least(F.min("v").over(w_u), F.col("u"))
        )
        return (
            sm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(
                # one (u, m) row per group, not per edge — dedup before
                # the union so the final distinct sees a smaller frame
                sm.select(F.col("u"), F.col("m").alias("v")).distinct()
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    # Job fusion (r10, the bfs_hops treatment): the per-round
    # materialization is LAZY (``localCheckpoint(eager=False)``), so the
    # signature aggregate — the first action over the frame — triggers
    # it: ONE Spark job per round where the r9 shape ran two (eager
    # checkpoint, then sig read-back). Round time at sf0.1 is
    # scheduling-dominated (SCALE.md r9 graph curve, factors 1-2 flat),
    # so job COUNT is the latency lever; shuffle volume is unchanged.
    #
    # Measured dead end, kept out deliberately (SCALE.md r10): fusing
    # TWO contraction rounds per materialization. Each round references
    # its input ~8-12× (the two _sym unions and the star joins each
    # duplicate the subtree in the LOGICAL plan — exchange reuse dedups
    # execution, not planning), so an unfused double round squares that
    # into ~100 copies of the base subtree and Catalyst planning alone
    # took 30 s on a 199-edge sf0.001 graph. The checkpoint-per-round
    # LogicalRDD leaf is what keeps planning O(1) per round; never stack
    # rounds without a materialization boundary between them.
    from tepsonic_database_sync_spark.functions.lifecycle import (
        free_local_checkpoint,
    )

    sig = None
    for _ in range(max_iter):
        new_e = _round(E).localCheckpoint(eager=False)
        new_sig = _sig(new_e)
        # the previous round's checkpoint is superseded the moment the
        # new one materializes (the _sig collect above) — free its
        # blocks instead of pinning every round's edge frame for the
        # session lifetime (r17, functions/lifecycle.py; the round-0
        # input is a plain plan, where this is a no-op)
        free_local_checkpoint(E)
        E = new_e
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in max_iter={max_iter} "
            "rounds — pathological input (contraction converges in "
            "O(log² component size) rounds on any graph)."
        )
    roots = E.groupBy("u").agg(F.min("v").alias("comp"))
    return (
        nodes.join(roots, nodes.node == roots.u, "left")
        .select(
            "node",
            F.least(
                F.col("node"), F.coalesce(F.col("comp"), F.col("node"))
            ).alias("comp"),
        )
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash signature: per token a 60-bit hash votes ±1 on each of
    ``bits`` positions; the packed majority bits form the signature.

    Single-pass form: one hash per token, then ``bits`` conditional-sum
    aggregates in ONE groupBy (no bit-dimension row explosion — a 32×
    shuffle-volume saving), packed with a final sum of masks."""
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    hashed = tok.select("doc_id", h60(F.col("t")).alias("h"))
    vote_cols = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    votes = hashed.groupBy("doc_id").agg(*vote_cols)
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("doc_id", packed.cast("long").alias("simhash"))


def canonicalize(docs: DataFrame) -> DataFrame:
    """End-to-end near-dup REMOVAL: LSH candidate pairs → connected
    components (star contraction) → keep one canonical document (the
    cluster's min doc_id) per cluster, annotated with its cluster size.
    This is the step a training-data pipeline actually runs — the pair
    and cluster operators above are its observable intermediates.

    Returns the surviving documents: (doc_id, lang, source, n_chars,
    cluster_size). ``cluster_size = 1`` means the doc had no near-dups.

    Scale shape: signatures + banding as in ``lsh_candidate_pairs``
    (never all-pairs), star contraction is O(log²) rounds, and the final
    keeper selection is a filter + two equi-joins on doc_id — the join
    back to ``docs`` recovers full rows only for survivors, so the wide
    text column never travels through the clustering shuffles.
    """
    pairs = lsh_candidate_pairs(minhash_sig_array(docs)).localCheckpoint(eager=True)
    nodes = docs.select(F.col("doc_id").alias("node"))
    comp = connected_components_star(pairs, nodes, edges_canonical=True)
    # cluster_size via a window over the labels (one exchange) instead
    # of groupBy + rejoin (two) — near-dup clusters are small, so the
    # per-comp window partition is bounded (r10, same rationale as the
    # window-star rewrite above)
    from pyspark.sql import Window

    keepers = comp.withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("comp")).cast("long"),
    ).filter(F.col("node") == F.col("comp"))
    return keepers.join(
        docs.select("doc_id", "lang", "source", "n_chars"),
        keepers.node == F.col("doc_id"),
    ).select("doc_id", "lang", "source", "n_chars", "cluster_size")


def contamination_flags(
    docs: DataFrame,
    bench_pct: int = 5,
    n: int = 3,
    min_hits: int = 1,
    salt: str = "bench",
) -> DataFrame:
    """Benchmark decontamination screen: flag training documents sharing
    word n-grams with a held-out benchmark set. The benchmark here is a
    deterministic hash slice of the corpus (``split_bucket < bench_pct``)
    so the check is self-contained and oracle-able; in production the
    benchmark grams come from the eval suites themselves.

    Returns one row per TRAINING doc: (doc_id, n_hit_grams,
    contaminated) — ``n_hit_grams`` counts the doc's distinct shingles
    that appear anywhere in the benchmark set.

    Scale shape: benchmark gram sets are tiny relative to the corpus
    (eval suites are MBs against a 100 TB corpus), so the gram join is an
    explicit ``broadcast`` — the training side streams through a
    map-side hash probe with NO shuffle; the only shuffle is the
    per-doc hit-count groupBy on uniformly-spread doc_id.
    """
    from tepsonic_database_sync_spark.operators.sampling import split_bucket

    sh = _with_shingles(docs, n).withColumn(
        "is_bench", split_bucket(F.col("doc_id"), salt) < bench_pct
    )
    bench_grams = (
        sh.filter(F.col("is_bench"))
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    train = sh.filter(~F.col("is_bench"))
    hits = (
        train.select("doc_id", F.explode("shingles").alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit_grams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long").alias(
                "n_hit_grams"
            ),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


# Bloom decontamination parameters: k probes, bits sized so the filter
# stays ~2e-4 FP (32 bits/gram, k=4 → (1-e^-1/8)^4 ≈ 1.9e-4). m is a
# power of two so position math is an exact modulus in both engines.
BLOOM_K = 4
BLOOM_BITS_PER_GRAM = 32


def _bloom_pos(i: int, m_bits: int) -> F.Column:
    """Position i of the double-hashing scheme: (h1 + i*h2) mod m, with
    h2 forced odd so the k probes hit k distinct positions for any
    power-of-two m. Expects materialized columns h1/h2."""
    return (F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(m_bits)


def _with_bloom_hashes(grams: DataFrame, m_bits: int) -> DataFrame:
    return grams.withColumn(
        "h1", h60(F.col("g")) % F.lit(m_bits)
    ).withColumn(
        "h2",
        (h60_salted(F.col("g"), 1) % F.lit(m_bits)).bitwiseOR(F.lit(1)),
    )


def bloom_bitset(grams: DataFrame, m_bits: int) -> DataFrame:
    """Build the Bloom bitset AS A DATAFRAME of (w, bits) 64-bit words —
    a distributed bit_or aggregate, never a driver-side structure. At most
    m_bits/64 rows (KBs), the broadcast side of every probe."""
    g = _with_bloom_hashes(grams, m_bits)
    pos = F.explode(
        F.array(*[_bloom_pos(i, m_bits) for i in range(BLOOM_K)])
    ).alias("pos")
    return (
        g.select(pos)
        .select(
            F.expr("CAST(pos div 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def contamination_flags_bloom(
    docs: DataFrame,
    bench_pct: int = 5,
    n: int = 3,
    min_hits: int = 1,
    salt: str = "bench",
    bits_per_gram: int = BLOOM_BITS_PER_GRAM,
) -> DataFrame:
    """``contamination_flags`` with the benchmark gram set ALSO carried as
    a Bloom filter — the decontamination shape for when the gram set
    outgrows an exact broadcast (a full eval-suite union at 100 TB can be
    billions of grams = tens of GBs exact, but MBs as a bitset).

    Emits per training doc: (doc_id, n_hit_grams, contaminated,
    bloom_ok). The exact columns are oracle-hashed as in
    ``contamination_flags``; ``bloom_ok`` is the hard flag of the sketch
    family: TRUE iff NO exact-hit gram was missed by the bloom probe.
    Bloom filters cannot produce false negatives, so any FALSE here is an
    implementation bug and fails the correctness gate. False-positive
    rate is bounded separately in tests (theory × slack).

    Scale shape: the bitset is built by a distributed ``bit_or`` over the
    (tiny) benchmark side and probed via ONE broadcast join on the word
    index after exploding the k=4 positions per gram; the corpus side
    still never shuffles on grams — the only shuffle remains the per-doc
    groupBy, exactly like the exact path.
    """
    import math

    from tepsonic_database_sync_spark.operators.sampling import split_bucket

    sh = _with_shingles(docs, n).withColumn(
        "is_bench", split_bucket(F.col("doc_id"), salt) < bench_pct
    )
    bench_grams = (
        sh.filter(F.col("is_bench"))
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_bench = max(bench_grams.count(), 1)
    m_bits = max(1024, 1 << math.ceil(math.log2(bits_per_gram * n_bench)))
    words = bloom_bitset(bench_grams, m_bits)

    train = sh.filter(~F.col("is_bench"))
    tg = _with_bloom_hashes(
        train.select("doc_id", F.explode("shingles").alias("g")), m_bits
    )
    # exact probe (broadcast of the gram set, as contamination_flags)
    tg = tg.join(
        F.broadcast(bench_grams.select(F.col("g"), F.lit(True).alias("in_bench"))),
        "g",
        "left",
    )
    # bloom probe: k broadcast joins on the word index (no posexplode →
    # no extra (doc, gram) shuffle for the k-way AND; the corpus side
    # stays map-side only, like the exact probe)
    hit_terms = []
    for i in range(BLOOM_K):
        tg = tg.withColumn(f"pos{i}", _bloom_pos(i, m_bits)).withColumn(
            f"w{i}", F.expr(f"CAST(pos{i} div 64 AS INT)")
        )
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        tg = tg.join(F.broadcast(wi), f"w{i}", "left")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 64 AS INT))"
        )
        hit_terms.append(
            F.coalesce(F.col(f"bits{i}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    bloom_hit = hit_terms[0]
    for t in hit_terms[1:]:
        bloom_hit = bloom_hit & t
    per_doc = (
        tg.select(
            "doc_id",
            F.coalesce(F.col("in_bench"), F.lit(False)).alias("exact"),
            bloom_hit.alias("bloom_hit"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_if(F.col("exact")).cast("long").alias("n_hit_grams"),
            (F.count_if(F.col("exact")) >= min_hits).alias("contaminated"),
            (F.count_if(F.col("exact") & ~F.col("bloom_hit")) == 0).alias(
                "bloom_ok"
            ),
            F.count_if(F.col("bloom_hit") & ~F.col("exact"))
            .cast("long")
            .alias("n_false_pos"),
            F.count("*").cast("long").alias("n_grams"),
        )
    )
    # docs whose shingle array is empty never survive the explode — emit
    # them with zero counts like the exact path does
    return (
        train.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long").alias(
                "n_hit_grams"
            ),
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
            F.coalesce(F.col("bloom_ok"), F.lit(True)).alias("bloom_ok"),
            F.coalesce(F.col("n_false_pos"), F.lit(0)).cast("long").alias(
                "n_false_pos"
            ),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        )
    )


def _fp_index_merge(state: DataFrame, new: DataFrame) -> DataFrame:
    return (
        state.unionByName(new)
        .groupBy("fp_md5")
        .agg(F.min("doc_id").cast("long").alias("doc_id"))
    )


def incremental_dedup(new_docs: DataFrame, store) -> DataFrame:
    """Exact dedup of an INCREMENT against a persistent fingerprint
    index — the operational dedup shape at 100 TB: a daily increment is
    probed against the corpus index (anti-join on the fingerprint key,
    with the index read partition-pruned to the buckets the increment
    hashes to), never by re-deduplicating the whole corpus. Survivors
    are admitted into the index in the same call (``store.merge``, which
    itself rewrites only touched buckets).

    Returns the admitted rows ``(doc_id, fp_md5)``: first-seen
    fingerprints, intra-batch collisions resolved to the min doc_id
    (deterministic under any partitioning). Replay-safe by construction:
    re-delivering an already-admitted increment anti-joins to empty and
    changes nothing — no batch-id bookkeeping needed, the index itself
    is the idempotence ledger.

    Cost: O(increment) + O(index buckets touched). The md5 key is
    uniform, so a large increment touches at most ``n_buckets``
    directories and a small one only the few its keys hash to; the
    anti-join shuffles increment-sized data only (the pruned index side
    is read once and hash-joined).
    """
    from tepsonic_database_sync_spark.operators.text import fingerprint

    batch = (
        fingerprint(new_docs)
        .groupBy("fp_md5")
        .agg(F.min("doc_id").cast("long").alias("doc_id"))
    )
    existing = store.read_touched(batch)
    fresh = (
        batch
        if existing is None
        else batch.join(existing.select("fp_md5"), "fp_md5", "left_anti")
    )
    # one materialization feeds BOTH the index merge and the returned
    # DataFrame (eager localCheckpoint: no CacheManager entry to leak)
    fresh = fresh.localCheckpoint(eager=True)
    store.merge(fresh, _fp_index_merge)
    return fresh.select("doc_id", "fp_md5")


def source_overlap(docs: DataFrame, n: int = 3) -> DataFrame:
    """Pairwise content overlap between corpus SOURCES — the corpus-
    curation view of dedup: before mixing sources into a training set,
    measure how much of each source's distinct content already exists in
    every other source (the reference's vendor-vs-catalog reconciliation
    at products.js:285-307, lifted from per-item to per-corpus).

    Per source, the distinct word n-gram shingle set; per unordered
    source pair (a < b) that shares at least one shingle:
    ``(source_a, source_b, n_a, n_b, n_common, jaccard_permille,
    containment_a_permille, containment_b_permille)`` — containment is
    the direction-aware signal ("90% of B is inside A" matters even when
    Jaccard is small because A is huge). Integer permille throughout.
    Pairs with zero shared shingles are omitted (inner join on the
    shingle key — emitting the zero rows would force a |sources|²
    cross product for no signal).

    Scale shape: one distinct shuffle on (source, shingle) — map-side
    combined — then an equi self-join on the shingle hash whose
    amplification is bounded by the per-shingle source fan-out
    (≤ |sources|, typically ≪ 100), aggregated map-side down to the
    |sources|² overlap matrix; the per-source totals broadcast back onto
    it. The wide text column never enters any shuffle.
    """
    from tepsonic_database_sync_spark.operators.text import tokens

    from tepsonic_database_sync_spark.io import fan_out_cpu

    # fan_out_cpu (r18): the shingle explode + distinct below is the
    # CPU-heavy head (no-op on well-split inputs)
    toked = fan_out_cpu(docs).select("source", tokens(F.col("text")).alias("t"))
    grams = (
        toked.select("source", F.explode(word_shingles(F.col("t"), n)).alias("g"))
        .distinct()
    )
    per_src = grams.groupBy("source").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    a = grams.select(F.col("source").alias("source_a"), "g")
    b = grams.select(F.col("source").alias("source_b"), "g")
    common = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    na = per_src.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("n_a")
    )
    nb = per_src.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("n_b")
    )
    return (
        common.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.floor(
                F.lit(1000)
                * F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            )
            .cast("long")
            .alias("jaccard_permille"),
            F.floor(F.lit(1000) * F.col("n_common") / F.col("n_a"))
            .cast("long")
            .alias("containment_a_permille"),
            F.floor(F.lit(1000) * F.col("n_common") / F.col("n_b"))
            .cast("long")
            .alias("containment_b_permille"),
        )
    )


def source_neardup_matrix(
    docs: DataFrame, tau_permille: int = 600, n: int = 3
) -> DataFrame:
    """Cross-source NEAR-DUPLICATE matrix — the doc-level complement of
    ``source_overlap`` (which measures gram-set overlap): per unordered
    source pair, how many verified near-duplicate DOCUMENT pairs
    (exact shingle Jaccard ≥ ``tau_permille``) span the two sources,
    the strongest match, and an example pair for review. This is the
    dump-overlap analysis web-crawl curation runs before mixing
    sources (later CC dumps near-duplicate earlier ones; mirrors
    near-duplicate their upstreams) — same-source rows report
    WITHIN-source near-dup pressure on the same scale.

    Exact integer semantics: verified pairs come from
    ``ngram_jaccard_pairs_banded`` (banded LSH candidates, exact
    distinct-shingle verify, ``min_inter ≥ 2`` so the union is never
    zero); ``jaccard_permille = 1000·inter div union``; the source
    pair is normalized (lexicographic least first) WITH its doc ids
    swapped in step, so the example always reads (source_a's doc,
    source_b's doc); the strongest match per cell is the algebraic
    ``min(struct(-jaccard, a_id, b_id))`` — no window. Cells with no
    verified pair are omitted (emitting them would force a |sources|²
    product for no signal — the ``source_overlap`` rule).

    Scale shape: candidate generation is the banded equi-join (never
    all-pairs); the verified pair frame is bounded by band collisions,
    so BOTH source attaches broadcast it against the streaming
    (doc_id, source) projection — the corpus never shuffles on its own
    size here; the rollup is one map-side-combined aggregate to at
    most |sources|² rows.

    Returns (source_a, source_b, n_pairs, max_jaccard_permille,
    example_a_id, example_b_id).
    """
    if "n_chars" not in docs.columns:  # _with_shingles carries it
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    pairs = ngram_jaccard_pairs_banded(docs, n=n)
    v = pairs.select(
        "a_id",
        "b_id",
        F.expr("(1000 * inter_size) div (union_size)").cast("long").alias(
            "jp"
        ),
    ).filter(F.col("jp") >= tau_permille)
    src = docs.select("doc_id", "source")
    m1 = F.broadcast(v).join(
        src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("sa")),
        "a_id",
    )
    m = F.broadcast(m1).join(
        src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("sb")),
        "b_id",
    )
    norm = m.select(
        F.least("sa", "sb").alias("source_a"),
        F.greatest("sa", "sb").alias("source_b"),
        F.when(F.col("sa") <= F.col("sb"), F.col("a_id"))
        .otherwise(F.col("b_id"))
        .alias("ea"),
        F.when(F.col("sa") <= F.col("sb"), F.col("b_id"))
        .otherwise(F.col("a_id"))
        .alias("eb"),
        "jp",
    )
    agg = norm.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min(
            F.struct(
                (-F.col("jp")).alias("nj"),
                F.col("ea").alias("a"),
                F.col("eb").alias("b"),
            )
        ).alias("k"),
    )
    return agg.select(
        "source_a",
        "source_b",
        "n_pairs",
        (-F.col("k.nj")).cast("long").alias("max_jaccard_permille"),
        F.col("k.a").cast("long").alias("example_a_id"),
        F.col("k.b").cast("long").alias("example_b_id"),
    )


def keep_best_dedup(docs: DataFrame, fingerprint: Column | None = None) -> DataFrame:
    """Quality-aware exact dedup: one survivor per identical-content
    cluster, chosen by HIGHEST quality score (ties → min doc_id) instead
    of min id — the curation-correct survivor policy when duplicates
    differ in formatting (casing, whitespace damage) but not content:
    keep the cleanest copy, not the first-crawled one.

    ``fingerprint`` overrides the cluster key (default: md5 of the
    normalized text — exact content identity). Pass a looser key (e.g.
    the bag-of-words SET fingerprint the registry query uses) to cluster
    copies whose damage altered the byte content but not the vocabulary.

    Scale shape (r17): the (doc_id, fp, quality) projection is computed
    in ONE pass (fingerprint + quality are row-local expressions), then
    the keeper AND the copy count collapse in ONE map-side-combined
    aggregation — ``min(struct(-quality, doc_id, quality))`` is the
    algebraic argmax (== row_number ORDER BY quality DESC, doc_id), so
    a million-copy cluster ships one candidate struct per map task
    where the pre-r17 window form shuffled and sorted every copy's row.
    Only the narrow projection moves; text never does.

    Returns (fp, keeper_doc_id, quality, n_copies).
    """
    from tepsonic_database_sync_spark.operators.text import (
        normalize_text,
        quality_expr,
    )

    fp = (
        fingerprint
        if fingerprint is not None
        else F.md5(normalize_text(F.col("text")))
    )
    scored = docs.select(
        "doc_id",
        fp.alias("fp"),
        quality_expr(F.col("text")).alias("quality"),
    )
    agg = scored.groupBy("fp").agg(
        F.min(
            F.struct(
                (-F.col("quality")).alias("nq"),
                F.col("doc_id").alias("d"),
                F.col("quality").alias("q"),
            )
        ).alias("k"),
        F.count("*").cast("long").alias("n_copies"),
    )
    return (
        agg
        .select(
            "fp",
            F.col("k.d").alias("keeper_doc_id"),
            F.col("k.q").alias("quality"),
            F.col("n_copies"),
        )
    )


def fuzzy_keep_best(docs: DataFrame) -> DataFrame:
    """Quality-aware keeper per FUZZY duplicate cluster — the
    production survivor policy (FineWeb / RefinedWeb): near-duplicate
    clusters come from MinHash-LSH + connected components, and the
    cluster's survivor is its HIGHEST-quality member (ties → min
    doc_id), not the first-crawled one. ``keep_best_dedup`` above is
    the exact-fingerprint form; this composes the repo's fuzzy tier:
    ``minhash_sig_array`` → ``lsh_candidate_pairs`` →
    ``connected_components_star`` → row-local ``quality_expr`` →
    deterministic per-cluster argmax.

    Scale shape: candidate generation is banded LSH (never all-pairs),
    components are the window-aggregate star rounds (one exchange per
    round), quality is a row-local expression computed in the same
    narrow (doc_id, quality) projection the cluster join consumes —
    text never shuffles. The argmax is min(struct(-quality, doc_id)) —
    algebraic, so the keeper choice is map-side partial-combined with
    NO window (a million-copy cluster ships one candidate struct per
    map task). The pair frame is localCheckpointed: the star rounds
    consume it iteratively and must not re-run the LSH banding per
    round.

    Returns (cluster_id, keeper_doc_id, quality, n_members) — one row
    per cluster including singletons (n_members = 1, keeper = self).
    """
    from tepsonic_database_sync_spark.operators.text import quality_expr

    if "n_chars" not in docs.columns:  # _with_shingles carries it
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    pairs = lsh_candidate_pairs(minhash_sig_array(docs)).localCheckpoint(
        eager=True
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    clusters = connected_components_star(pairs, nodes, edges_canonical=True)
    scored = docs.select(
        "doc_id", quality_expr(F.col("text")).alias("quality")
    )
    j = clusters.join(
        scored, clusters["node"] == scored["doc_id"]
    ).select(F.col("comp").alias("cluster_id"), "doc_id", "quality")
    agg = j.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (-F.col("quality")).alias("nq"), F.col("doc_id").alias("d")
            )
        ).alias("k"),
        F.count("*").cast("long").alias("n_members"),
    )
    return agg.select(
        "cluster_id",
        F.col("k.d").alias("keeper_doc_id"),
        (-F.col("k.nq")).cast("long").alias("quality"),
        "n_members",
    )


def fuzzy_canonicalize(docs: DataFrame) -> DataFrame:
    """End-to-end FUZZY-tier corpus emitter — what FineWeb actually
    ships after its near-dup stage: the surviving documents themselves,
    one per MinHash-LSH cluster, chosen by the quality-argmax policy
    (``fuzzy_keep_best``), with their wide columns re-attached.
    ``canonicalize`` above is the min-id form of the same idiom; this
    is its quality-aware sibling (VERDICT r16 item 4: compose the r16
    keeper with the survivors-rejoin so the fuzzy tier has a
    corpus-out form, not just a (cluster, keeper) report).

    Scale shape: everything up to the keeper choice is
    ``fuzzy_keep_best``'s certified plan (banded LSH pairs, star-
    contraction components, row-local quality on a narrow projection,
    algebraic ``min(struct(-quality, doc_id))`` argmax — no window).
    The ONLY new stage is one equi-join on doc_id between the
    |clusters|-row keeper frame and the docs projection — wide columns
    (text etc. stay out; lang/source/n_chars are fixed-width) travel
    ONLY for survivors and never through the clustering shuffles,
    exactly the ``canonicalize`` rejoin idiom.

    Returns the surviving documents: (doc_id, lang, source, n_chars,
    quality, cluster_size) — ``cluster_size = 1`` means no near-dups;
    ``quality`` is the keeper's own integer quality score.
    """
    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    kb = fuzzy_keep_best(docs)
    wide = [c for c in ("lang", "source") if c in docs.columns]
    survivors = kb.select(
        F.col("keeper_doc_id").alias("doc_id"),
        "quality",
        F.col("n_members").cast("long").alias("cluster_size"),
    )
    return survivors.join(
        docs.select("doc_id", *wide, "n_chars"), "doc_id"
    ).select("doc_id", *wide, "n_chars", "quality", "cluster_size")


def contamination_fuzzy_report(
    train: DataFrame,
    bench: DataFrame,
    source_col: str = "source",
    **kwargs,
) -> DataFrame:
    """Per-source FUZZY-contamination rollup — the |sources|-row report
    a curation review actually reads (VERDICT r16 item 5):
    ``contamination_report`` above rolls up the exact gram probe; this
    gives ``decontaminate_fuzzy`` the same treatment. A source with a
    high fuzzy-contamination permille gets its ingestion re-filtered
    or dropped wholesale; the per-doc flags alone don't localize the
    leak. Keyword args pass through to ``decontaminate_fuzzy``.

    Exact integer semantics per source (train docs only):
    ``contamination_permille = n_contaminated · 1000 div n_docs``,
    plus the single WORST verified match for triage — the
    (doc, bench, jaccard) triple a reviewer opens first — chosen by
    the algebraic ``min(struct(-jaccard, doc_id))`` (doc_id is unique
    per row, so the argmax is deterministic; the bench id rides in
    the same struct). Sources with no verified candidate report
    worst_jaccard_permille 0 / worst_bench_id -1.

    Scale shape: ``decontaminate_fuzzy``'s plan (broadcast bench band
    probe + broadcast-candidate verify — the train corpus never
    shuffles on its own size) + the source attach on uniformly-spread
    doc_id + ONE map-side-combined rollup to |sources| rows; the
    min-struct worst-match keeps the rollup window-free.

    Returns (source, n_docs, n_contaminated, contamination_permille,
    worst_jaccard_permille, worst_doc_id, worst_bench_id).
    """
    from tepsonic_database_sync_spark.operators.text import _permille

    flags = decontaminate_fuzzy(train, bench, **kwargs)
    j = flags.join(
        train.select("doc_id", F.col(source_col).alias("source")), "doc_id"
    )
    agg = j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.min(
            F.struct(
                (-F.col("best_jaccard_permille")).alias("nj"),
                F.col("doc_id").alias("d"),
                F.col("best_bench_id").alias("b"),
            )
        ).alias("k"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_contaminated",
        _permille(F.col("n_contaminated"), F.col("n_docs")).alias(
            "contamination_permille"
        ),
        (-F.col("k.nj")).cast("long").alias("worst_jaccard_permille"),
        F.col("k.d").cast("long").alias("worst_doc_id"),
        F.col("k.b").cast("long").alias("worst_bench_id"),
    )


def decontaminate_fuzzy(
    train: DataFrame,
    bench: DataFrame,
    tau_permille: int = 800,
    n: int = 3,
) -> DataFrame:
    """FUZZY eval-set decontamination — the near-duplicate complement
    of the exact gram probe (``contamination_flags``): a training doc
    is contaminated if its 3-shingle Jaccard with ANY benchmark doc
    reaches ``tau_permille``. Exact gram probes miss lightly-edited
    leaks (whitespace damage, appended boilerplate, small insertions);
    the fuzzy tier is what production decontamination runs next to the
    exact one (the Stack/StarCoder and Llama-family pipelines pair
    them the same way).

    Candidates via MinHash-LSH banding ACROSS the two corpora (one
    banded equi-join train×bench — never all-pairs), then EXACT
    shingle-set Jaccard verification on candidates only (the
    dedup_jaccard_banded rule: inter/union over the distinct shingle
    arrays, integer permille). Best match per train doc is the
    deterministic ``min(struct(-jaccard, bench_id))`` — algebraic, so
    map-side partial-combined, no window.

    Scale shape: the benchmark side is SMALL by construction (eval
    suites are thousands of docs; the corpus is billions), so both the
    banded bench frame and the bench shingle arrays are broadcast —
    the train corpus streams through one map-side band probe + one
    verify projection and never shuffles on its own size. If the bench
    side ever outgrows broadcast, drop the two hints: both joins are
    key-wide equi-joins (band_key / b_id) and AQE takes over. The train
    shingle frame is materialized once and shared by the banding and
    verify consumers (r18, guide §2.4) — one tokenize+shingle pass over
    the corpus instead of two.

    Returns (doc_id, best_bench_id, best_jaccard_permille,
    contaminated) for EVERY train doc — best_bench_id is -1 when no
    candidate verified (jaccard 0, contaminated false).
    """
    if "n_chars" not in train.columns:
        train = train.withColumn("n_chars", F.length("text").cast("long"))
    if "n_chars" not in bench.columns:
        bench = bench.withColumn("n_chars", F.length("text").cast("long"))
    # The TRAIN shingle frame feeds TWO consumers (the MinHash banding
    # and the verify join), so it is materialized once (r18, guide §2.4
    # — the lsh_quality lesson): without the checkpoint the full train
    # corpus re-tokenizes + re-shingles per consumer. The bench side
    # stays lazy: it is thousands of rows by construction and both its
    # consumers are driver-broadcast builds anyway.
    tshingled = (
        _with_shingles(train, n)
        .select("doc_id", "shingles")
        .localCheckpoint(eager=True)
    )
    tb = _banded(
        minhash_sig_array(train, n=n, shingled=tshingled), MINHASH_K, LSH_BAND_SIZE
    ).select(F.col("doc_id").alias("t_id"), "band", "band_key")
    bb = _banded(minhash_sig_array(bench, n=n), MINHASH_K, LSH_BAND_SIZE).select(
        F.col("doc_id").alias("b_id"), "band", "band_key"
    )
    cand = (
        tb.join(F.broadcast(bb), ["band", "band_key"])
        .select("t_id", "b_id")
        .distinct()
    )
    tsh = tshingled.select(
        F.col("doc_id").alias("t_id"), F.col("shingles").alias("t_sh")
    )
    bsh = _with_shingles(bench, n).select(
        F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")
    )
    inter = F.size(F.array_intersect("t_sh", "b_sh")).cast("long")
    # The candidate frame is bounded by band collisions against the
    # SMALL bench side (≤ bands × |bench| pairs before distinct), so it
    # broadcasts too — without the hint this join would shuffle the full
    # train shingle projection on t_id, which is exactly the
    # train-sized exchange the docstring promises away (ADVICE r16).
    v = (
        F.broadcast(cand).join(tsh, "t_id")
        .join(F.broadcast(bsh), "b_id")
        .select(
            "t_id",
            "b_id",
            inter.alias("inter"),
            (F.size("t_sh") + F.size("b_sh")).cast("long").alias("sz"),
        )
        .select(
            "t_id",
            "b_id",
            F.when(
                F.col("sz") - F.col("inter") > 0,
                F.expr("(1000 * inter) div (sz - inter)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("jp"),
        )
    )
    best = v.groupBy("t_id").agg(
        F.min(
            F.struct((-F.col("jp")).alias("nj"), F.col("b_id").alias("b"))
        ).alias("k")
    )
    return (
        train.select("doc_id")
        .join(best, train["doc_id"] == best["t_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("k.b"), F.lit(-1)).cast("long").alias(
                "best_bench_id"
            ),
            F.coalesce(-F.col("k.nj"), F.lit(0)).cast("long").alias(
                "best_jaccard_permille"
            ),
            (F.coalesce(-F.col("k.nj"), F.lit(0)) >= tau_permille).alias(
                "contaminated"
            ),
        )
    )


# Canonical prefix-filter similarity threshold. Lives HERE (not in the
# registry) so measurement scripts can share it without compiling all
# 183 registry entries; the registry and its DuckDB oracles import this
# single constant (ADVICE r9 — a registry-side copy would silently
# desynchronize scripts/scale_smoke.py from the audited operator).
PREFIX_TAU_PERMILLE = 600


def jaccard_pairs_prefix(
    docs: DataFrame,
    n: int = 3,
    tau_permille: int = PREFIX_TAU_PERMILLE,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """EXACT similarity self-join via prefix filtering (AllPairs /
    PPJoin candidate generation, Bayardo et al. / Xiao et al.) — the
    third candidate-generation tier of the Jaccard family, completing
    the trade-off ladder:

    - ``ngram_jaccard_pairs``        cheap length blocks, recall holes;
    - ``ngram_jaccard_pairs_banded`` LSH bands, probabilistic recall;
    - this                           provably COMPLETE at threshold τ
                                     (every pair with J ≥ τ is emitted),
                                     at the cost of a per-doc sort and a
                                     frequency pass.

    Mechanics: order every doc's shingles by GLOBAL rarity (document
    frequency asc, shingle asc — one total order for the whole corpus),
    keep each doc's first |s| − ⌈τ·|s|⌉ + 1 shingles (the "prefix"); any
    pair with J ≥ τ must share a prefix shingle, so an equi-join on
    prefix shingles generates all candidates. Rare-first ordering makes
    the prefixes collide as little as possible. Candidates then pass the
    two-sided length filter (τ·|a| ≤ |b| and τ·|b| ≤ |a|, integer
    cross-multiplied) and the exact inter/union verification — all
    integer math: keep 1000·inter ≥ τ·union.

    Scale shape: the document-frequency attach is deliberately
    UNHINTED (r12) — the shingle vocabulary grows with the corpus, and
    forcing the same frame to broadcast in ``containment_pairs`` was
    MEASURED super-linear at sf0.1×8 (44.5 s hinted vs 13.3 s adaptive:
    the driver builds a multi-million-row map). AQE still picks a
    broadcast when the vocabulary is actually small, so factor-1 cost
    is unchanged while the 100 TB failure mode is gone. The rank window
    partitions by uniformly-spread doc_id and sorts only that doc's
    grams; candidates arrive by equi-join on prefix shingles whose
    fan-out the rare-first order actively minimizes; verification
    touches candidate pairs only. Returns
    (a_id, b_id, inter_size, union_size).
    """
    # materialize the shingle frame ONCE: it feeds the frequency pass,
    # the prefix build, and BOTH verification sides — without this the
    # corpus re-tokenizes per consumer (observed 6 FileScans = 6×
    # split+shingle cost; same lesson as winnow_overlap's posting table).
    # ``shingled`` (r18, guide §2.4): a caller that shares the substrate
    # with another consumer (lsh_quality's candidate side) passes the
    # ALREADY-MATERIALIZED (doc_id, shingles) frame instead — the sz
    # projection off a checkpoint is free, a second checkpoint is not.
    if shingled is not None:
        s = shingled.select(
            "doc_id", "shingles", F.size("shingles").cast("long").alias("sz")
        )
    else:
        s = (
            _with_shingles(docs, n)
            .select(
                "doc_id", "shingles", F.size("shingles").cast("long").alias("sz")
            )
            .localCheckpoint(eager=True)
        )
    tok = s.select("doc_id", "sz", F.explode("shingles").alias("g"))
    dfreq = tok.groupBy("g").agg(F.count("*").cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    # prefix length |s| − ⌈τ|s|⌉ + 1; ⌈x/1000⌉ = (x + 999) div 1000
    keep = F.col("sz") - F.expr(
        f"(sz * {tau_permille} + 999) div 1000"
    ) + 1
    # the prefix feeds both sides of the self-join — checkpoint it too,
    # or the freq join + rank window run twice
    prefix = (
        tok.join(dfreq, "g")
        .withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= keep)
        .select("doc_id", "sz", "g", F.col("__pos").alias("pos"))
        .localCheckpoint(eager=True)
    )
    a = prefix.select(
        F.col("doc_id").alias("a_id"),
        F.col("sz").alias("a_sz"),
        F.col("pos").alias("a_pos"),
        "g",
    )
    b = prefix.select(
        F.col("doc_id").alias("b_id"),
        F.col("sz").alias("b_sz"),
        F.col("pos").alias("b_pos"),
        "g",
    )
    # PPJoin positional filter: a pair generated at prefix positions
    # (pa, pb) can overlap at most 1 + min(|a|−pa, |b|−pb); require that
    # to reach the equivalent-overlap bound ⌈τ(|a|+|b|)/(1+τ)⌉. Per-row
    # pruning is sound — a pair whose better-positioned shared gram
    # survives is still generated by THAT gram's row before the
    # distinct. Measured 2.8× candidate reduction at sf0.1.
    alpha = F.expr(
        f"({tau_permille} * (a_sz + b_sz) + {1000 + tau_permille} - 1)"
        f" div {1000 + tau_permille}"
    )
    cands = (
        a.join(b, "g")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            (F.col("b_sz") * 1000 >= F.col("a_sz") * tau_permille)
            & (F.col("a_sz") * 1000 >= F.col("b_sz") * tau_permille)
        )
        .filter(
            1
            + F.least(
                F.col("a_sz") - F.col("a_pos"), F.col("b_sz") - F.col("b_pos")
            )
            >= alpha
        )
        .select("a_id", "b_id")
        .distinct()
    )
    av = s.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    bv = s.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    # The verify attaches are deliberately UNHINTED (r18 A/B): forcing
    # the candidate side to broadcast (the edit_verified_pairs §3.2
    # shape) regressed the prefix family — unlike edit_verified's
    # 2 KB-capped nt proxy, the attach here carries FULL shingle
    # arrays, so the pairs+a_sh intermediate round-trips a multi-MB
    # array payload through the driver (containment measured 3.5 →
    # 8.8 s min-of-4; this form was neutral). AQE keeps the 100 TB
    # shape safe the same way as the df attach above: av/bv broadcast
    # only while they actually fit, SMJ on id keys otherwise.
    pairs = cands.join(av, "a_id").join(bv, "b_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("long")
    union = (F.size("a_sh") + F.size("b_sh")).cast("long") - inter
    return (
        pairs.select(
            "a_id",
            "b_id",
            inter.alias("inter_size"),
            union.alias("union_size"),
        )
        .filter(F.col("inter_size") * 1000 >= F.col("union_size") * tau_permille)
    )


CHUNK_DEDUP_TOKENS = 32


def chunk_dedup(
    docs: DataFrame, chunk_tokens: int = CHUNK_DEDUP_TOKENS
) -> DataFrame:
    """Sub-document exact dedup (the RefinedWeb/Falcon "exact substring
    dedup" shape, at chunk granularity): split every document into
    non-overlapping ``chunk_tokens``-token chunks, keep each distinct
    chunk's GLOBALLY FIRST occurrence (ordered by doc_id, chunk_idx),
    and reassemble documents from their surviving chunks — boilerplate
    and quoted passages disappear corpus-wide while the enclosing
    documents survive, where whole-document dedup (``dedup_exact``)
    would either keep the duplication or drop whole documents.

    Mechanics: chunking reuses ``text.chunk_documents`` (overlap=0, so
    reassembly is lossless); the winner per chunk fingerprint is one
    row_number window partitioned by the h60 fingerprint — balanced
    partitions by construction (it's a hash), the same shuffle size as
    any groupBy on the chunk key at 100 TB; reassembly is one groupBy
    on doc_id with an array_sort on (idx, chunk) structs, no second
    scan of the corpus.

    Returns (doc_id, n_chunks, n_kept, kept_text) — kept_text is the
    idx-ordered space-join of surviving chunks ('' when every chunk was
    someone else's duplicate).
    """
    from tepsonic_database_sync_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=0
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("idx"),
        "chunk_text",
        h60(F.lower(F.col("chunk_text"))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(
        F.col("doc_id").asc(), F.col("idx").asc()
    )
    flagged = chunks.withColumn("rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "  CASE WHEN rn = 1"
                    "       THEN struct(idx, chunk_text) END)),"
                    " s -> s.chunk_text)"
                ),
                " ",
            ).alias("kept_text"),
        )
    )


def blocking_quality(
    truth_pairs: DataFrame, cand_pairs: DataFrame
) -> DataFrame:
    """The blocking AUDIT: measure a candidate generator against exact
    ground truth as one full-outer join + one aggregate — recall ("did
    the blocker miss true pairs?") and precision ("how much junk does
    verification pay for?") in floored permille. The number every
    dedup/similarity deployment should publish next to its throughput;
    here it is an operator, so the measurement itself is distributed,
    deterministic, and oracle-checkable.

    Inputs: two (a_id, b_id) pair frames (a < b). Returns ONE row
    (n_true, n_cand, n_hit, recall_permille, precision_permille);
    degenerate empty sides report -1 for the undefined ratio.
    """
    t = truth_pairs.select("a_id", "b_id").distinct().withColumn(
        "t", F.lit(1)
    )
    c = cand_pairs.select("a_id", "b_id").distinct().withColumn(
        "c", F.lit(1)
    )
    j = t.join(c, ["a_id", "b_id"], "full_outer")
    # outer coalesce: with BOTH inputs empty the join has zero rows and
    # sum() yields NULL — the counts must still read 0 (oracle parity
    # on the fully-degenerate case; caught in review)
    return j.agg(
        F.coalesce(F.sum(F.coalesce("t", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_true"),
        F.coalesce(F.sum(F.coalesce("c", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_cand"),
        F.coalesce(
            F.sum(
                F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_hit"),
    ).select(
        "n_true",
        "n_cand",
        "n_hit",
        F.expr(
            "CASE WHEN n_true > 0 THEN (1000 * n_hit) div n_true"
            " ELSE -1 END"
        )
        .cast("long")
        .alias("recall_permille"),
        F.expr(
            "CASE WHEN n_cand > 0 THEN (1000 * n_hit) div n_cand"
            " ELSE -1 END"
        )
        .cast("long")
        .alias("precision_permille"),
    )


BQ_SAMPLE_PERMILLE = 250


def blocking_quality_sampled(
    docs: DataFrame,
    truth_fn,
    cand_fn,
    sample_permille: int = BQ_SAMPLE_PERMILLE,
    key: str = "doc_id",
    salt: str = "bq",
) -> DataFrame:
    """``blocking_quality`` in the form that runs at 100 TB: the exact
    ground truth is computed on a deterministic HASH SAMPLE of the
    corpus, never on the corpus itself. The inline-full-truth wiring
    (``registry.q_lsh_quality``) is the small-SF checkable form; at
    production scale exact all-pairs truth over the corpus is the very
    job blocking exists to avoid, so the audit must estimate recall
    from a sample — this operator is that pattern, as one frame.

    Mechanics: keep documents with ``h60(salt # key) % 1000 <
    sample_permille`` (deterministic, engine-portable, re-runnable),
    then run BOTH the candidate generator and the exact-truth generator
    on the sampled sub-corpus and audit one against the other.

    Validity: sampling documents (not pairs) keeps the recall estimate
    unbiased exactly when the blocker's candidate decision is PER-PAIR
    — true for MinHash banding, SimHash bands, and prefix-filter, whose
    collision probability depends only on the two documents' contents.
    It is NOT valid for corpus-dependent blockers (e.g. a df-capped
    posting join, where dropping documents changes df): audit those
    with candidate pairs computed on the full corpus restricted to
    sample×sample, at the same truth cost.

    Precision of the estimate: n_true in the output is the binomial
    sample size; the recall CI half-width is ±1960·sqrt(hat·(1000−hat)
    /n_true)/1000 permille at 95% (hat = recall_permille) — e.g. 400
    sampled true pairs at recall 900‰ gives ±29‰. Document-sampling at
    rate p yields ~p² of the corpus's true pairs, so pick
    sample_permille to land n_true in the hundreds; the CI arithmetic
    stays caller-side to keep this frame integer-exact.

    Returns ONE row: (sample_permille, n_docs_sampled, n_true, n_cand,
    n_hit, recall_permille, precision_permille) — the last five exactly
    as ``blocking_quality`` defines them, over the sample.
    """
    sampled = docs.filter(
        F.pmod(
            h60(F.concat(F.lit(f"{salt}#"), F.col(key).cast("string"))),
            F.lit(1000),
        )
        < F.lit(sample_permille)
    )
    audit = blocking_quality(
        truth_fn(sampled).select("a_id", "b_id"),
        cand_fn(sampled).select("a_id", "b_id"),
    )
    n_docs = sampled.agg(
        F.count("*").cast("long").alias("n_docs_sampled")
    )
    return audit.crossJoin(F.broadcast(n_docs)).select(
        F.lit(sample_permille).cast("long").alias("sample_permille"),
        "n_docs_sampled",
        "n_true",
        "n_cand",
        "n_hit",
        "recall_permille",
        "precision_permille",
    )


def _chunk_index_merge(state: DataFrame, new: DataFrame) -> DataFrame:
    u = state.unionByName(new)
    return (
        u.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "idx")).alias("m"))
        .select(
            "fp",
            F.col("m.doc_id").cast("long").alias("doc_id"),
            F.col("m.idx").cast("long").alias("idx"),
        )
    )


def incremental_chunk_dedup(
    new_docs: DataFrame, store, chunk_tokens: int = CHUNK_DEDUP_TOKENS
) -> DataFrame:
    """``chunk_dedup``'s operational form: dedupe an INCREMENT's chunks
    against a persistent chunk-fingerprint index (the
    ``incremental_dedup`` pattern at sub-document granularity) — a
    daily crawl drop loses its boilerplate against EVERYTHING already
    ingested, at O(increment) cost, never by re-chunking the corpus.

    Per batch: chunk (overlap=0, lossless reassembly) → within-batch
    winner per fingerprint (min (doc_id, idx)) → anti-join against the
    partition-pruned index probe → admit fresh fingerprints
    (``store.merge`` rewrites only touched buckets) → reassemble every
    batch document from its surviving chunks.

    The INDEX is replay-idempotent (re-merging admitted fingerprints is
    a no-op by the min-merge); the EMITTED reassembly is
    first-delivery-wins — a replayed batch reassembles to all-dropped
    documents because its own chunks now sit in the index, so the
    output sink must be append-once per batch (exactly the
    ``stream_upsert_sink`` batch_id contract, which
    ``streaming.ops.chunk_dedup_stream`` applies).

    Equivalence law (pinned in tests): feeding batches in doc_id order
    and concatenating the emissions equals one-shot ``chunk_dedup``
    over the union — the global first-occurrence rule and the arrival
    order coincide exactly then.

    Returns (doc_id, n_chunks, n_kept, kept_text) for the batch's docs.
    """
    fresh, out = incremental_chunk_dedup_plan(new_docs, store, chunk_tokens)
    store.merge(fresh, _chunk_index_merge)
    return out


def incremental_chunk_dedup_plan(
    new_docs: DataFrame, store, chunk_tokens: int = CHUNK_DEDUP_TOKENS
) -> tuple[DataFrame, DataFrame]:
    """``incremental_chunk_dedup`` WITHOUT the index merge: returns
    ``(fresh, out)`` where ``fresh`` is the eagerly-checkpointed
    fingerprint increment still to be merged (via
    ``store.merge(fresh, _chunk_index_merge)``) and ``out`` is the
    reassembled-batch frame. ``out`` depends only on the batch's chunks
    and the materialized ``fresh`` — never on the post-merge index — so
    a caller may sequence output-commit and index-merge in whichever
    order its crash-recovery protocol needs (``streaming.ops.
    chunk_dedup_applier`` commits the output atomically FIRST, then
    merges; the batch wrapper above merges first, which is equivalent
    for a non-crashing caller)."""
    from tepsonic_database_sync_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        new_docs, chunk_tokens=chunk_tokens, overlap=0
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("idx"),
        "chunk_text",
        h60(F.lower(F.col("chunk_text"))).alias("fp"),
    )
    # first occurrence per fingerprint as a map-side-combined
    # min(struct) argmin (r17 — == row_number ORDER BY doc_id, idx):
    # duplicate chains collapse on the map side instead of shuffling
    # and sorting every chunk occurrence
    winners = chunks.groupBy("fp").agg(
        F.min(
            F.struct(F.col("doc_id").alias("d"), F.col("idx").alias("i"))
        ).alias("w")
    ).select("fp", F.col("w.d").alias("doc_id"), F.col("w.i").alias("idx"))
    existing = store.read_touched(winners.select("fp"))
    fresh = (
        winners
        if existing is None
        else winners.join(existing.select("fp"), "fp", "left_anti")
    )
    fresh = fresh.localCheckpoint(eager=True)
    marked = chunks.join(
        fresh.select(
            "fp",
            F.col("doc_id").alias("__wd"),
            F.col("idx").alias("__wi"),
        ),
        "fp",
        "left",
    ).withColumn(
        "__kept",
        (F.col("doc_id") == F.col("__wd")) & (F.col("idx") == F.col("__wi")),
    )
    out = marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("__kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list("
                "  CASE WHEN __kept THEN struct(idx, chunk_text) END)),"
                " s -> s.chunk_text)"
            ),
            " ",
        ).alias("kept_text"),
    )
    return fresh, out


def substring_dup_rate(docs: DataFrame, n: int = 8) -> DataFrame:
    """Per-document substring-duplication rate — the corpus-health
    metric of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (ACL 2022): the fraction of token positions covered
    by some n-gram that occurs MORE THAN ONCE in the corpus (their
    NearDup/ExactSubstr diagnostic, here over whitespace tokens with
    n = ``n``). This is the measurement that motivates the dedup
    family; the operators above remove duplication, this one reports
    how much there is and where.

    Exact by construction: grams are compared as strings (no hashing,
    so no collision caveat), coverage is the distinct-position union of
    all duplicated grams' [i, i+n) spans, and the rate is integer
    permille — hence a full DuckDB oracle.

    Scale shape: the gram-count aggregation shuffles ~token-count keys
    with map-side combine — the intrinsic cost of the EXACT metric (the
    paper spends a suffix-array cluster job on the same information);
    the coverage join is gram-keyed (wide key space, no hot key), and
    the position union stays per-doc. At 100 TB run it on a hash-sample
    of docs (the rate is a corpus statistic — sampling error is
    binomial) or fall back to ``winnow_overlap``'s fingerprint
    approximation; the exact form IS the published metric, so it is
    what the oracle pins.

    Returns (doc_id, n_tokens, dup_covered, dup_rate_permille) for
    EVERY doc (docs shorter than ``n`` tokens have rate 0).
    """
    from tepsonic_database_sync_spark.operators.text import tokens

    # toked feeds the gram explode (twice — the dup aggregate and the
    # covered join recompute grams from it) and the final n_tokens
    # attach; checkpoint it so the corpus tokenizes once (r18, §2.4 —
    # same trade as _substr_gram_frames: grams itself stays
    # recompute-from-toked, its 8-gram strings are ~n× the corpus)
    from tepsonic_database_sync_spark.io import fan_out_cpu

    toked = fan_out_cpu(docs).select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda x: x != F.lit("")).alias("t"),
    ).localCheckpoint(eager=True)
    grams = (
        toked.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n} + 1),"
                    f" i -> struct(i AS i, concat_ws(' ', slice(t, i, {n})) AS g))"
                )
            ).alias("x"),
        )
        .select("doc_id", "x.i", "x.g")
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("g")
    )
    covered = (
        grams.join(dup, "g")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {n} - 1)")).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dup_covered"))
    )
    return (
        toked.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_covered"), F.lit(0)).cast("long").alias(
                "dup_covered"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(1000 * coalesce(dup_covered, 0)) div n_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_rate_permille"),
        )
    )


def substring_dedup(docs: DataFrame, n: int = 8) -> DataFrame:
    """Exact-substring deduplication — the REMOVAL transformation of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022, their ExactSubstr pass): wherever an n-gram
    occurs more than once in the corpus, every occurrence except one
    canonical one is deleted, leaving a single copy of each duplicated
    span. ``substring_dup_rate`` above MEASURES the duplication; this
    operator removes it (the paper's actual training-data treatment).

    Deterministic semantics (both engines, bit-identical):

    - tokens = lowercased whitespace split, empties dropped (the shared
      ``text.tokens`` normalization — the output text is therefore the
      NORMALIZED-token reconstruction, not the raw string);
    - for each gram string that occurs > 1 time corpus-wide, the
      canonical occurrence is the (doc_id, position)-lexicographic
      minimum ("keep the first occurrence"); all other occurrences
      contribute their [i, i+n) span to the doc's removal set;
    - removed positions are the distinct union of those spans (a
      position inside BOTH a canonical and a removed span is removed —
      span-union removal, the same union rule the rate metric uses);
    - kept_text = the surviving tokens in original order, space-joined.

    Scale shape: identical to ``substring_dup_rate`` — one map-side-
    combined aggregation over gram strings (min(struct(doc_id, i)) and
    count are both algebraic, so the canonical-occurrence choice needs
    no window and no second pass), one gram-keyed equi-join (wide key
    space, no hot key), then per-doc array ops. The per-doc removal
    array is bounded by the doc's own token count. At 100 TB the gram
    aggregation IS the published cost (the paper spends a suffix-array
    cluster job on it); shard the corpus and union if one job's shuffle
    is too large — min/count merge across shards exactly.

    Returns (doc_id, n_tokens, removed_tokens, kept_tokens, kept_text)
    for EVERY doc — reconstruction is the linear-time shared body
    ``_reconstruct_kept`` (r12; see its docstring for the bound).
    """
    toked, dup_pos = _substr_removal_positions(docs, n)
    removed = dup_pos.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("rp")
    )
    return _reconstruct_kept(toked, removed)


def _substr_gram_frames(docs: DataFrame, n: int):
    """Shared ExactSubstr gram substrate: tokenized corpus, the
    (doc_id, i, g) gram frame, and the duplicated-gram canonical frame
    (canonical = (doc_id, i)-lexicographic min per gram, chosen INSIDE
    the one map-side-combined gram aggregate — min-struct and count
    are both algebraic). Returns (toked, grams, canon).

    ``toked`` is localCheckpointed (r18, guide §2.4): every family
    member consumes it 2-3× (the gram explode, the island gram rebuild,
    the kept-text reconstruction), and without the cut each consumer
    re-scans the parquet and re-tokenizes the corpus. The materialized
    frame is 1× the corpus token mass — the working set, affordable at
    any scale. ``grams`` is deliberately NOT materialized: its 8-gram
    strings are ~n× the corpus, so recompute-from-toked is the
    scale-correct trade (the docstrings' published-cost note)."""
    from tepsonic_database_sync_spark.operators.text import tokens

    from tepsonic_database_sync_spark.io import fan_out_cpu

    toked = fan_out_cpu(docs).select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda x: x != F.lit("")).alias("t"),
    ).localCheckpoint(eager=True)
    grams = (
        toked.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n} + 1),"
                    f" i -> struct(i AS i, concat_ws(' ', slice(t, i, {n})) AS g))"
                )
            ).alias("x"),
        )
        .select("doc_id", "x.i", "x.g")
    )
    canon = (
        grams.groupBy("g")
        .agg(
            F.min(F.struct("doc_id", "i")).alias("can"),
            F.count("*").cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 1)
        .select("g", F.col("can.doc_id").alias("c_doc"), F.col("can.i").alias("c_i"))
    )
    return toked, grams, canon


def _noncanon_positions(grams: DataFrame, canon: DataFrame, n: int) -> DataFrame:
    """The DISTINCT (doc_id, pos) set of non-canonical duplicated-gram
    positions — the removal substrate shared by the ExactSubstr
    family."""
    return (
        grams.join(canon, "g")
        .filter(~((F.col("doc_id") == F.col("c_doc")) & (F.col("i") == F.col("c_i"))))
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {n} - 1)")).alias("pos"),
        )
        .distinct()
    )


def _substr_removal_positions(docs: DataFrame, n: int):
    """Shared ExactSubstr removal-position builder for
    ``substring_dedup`` and ``substring_dedup_spans``.
    Returns (toked, positions)."""
    toked, grams, canon = _substr_gram_frames(docs, n)
    return toked, _noncanon_positions(grams, canon, n)


def substring_dedup_spans(
    docs: DataFrame, n: int = 8, min_span: int = 50
) -> DataFrame:
    """ExactSubstr with the PUBLISHED removal rule — Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL
    2022) remove *maximal duplicated spans of at least 50 tokens*, not
    every duplicated n-gram occurrence. ``substring_dedup`` above is
    the gram-granular treatment (every non-canonical duplicated n-gram
    position goes); this variant coalesces the duplicated positions of
    each doc into MAXIMAL contiguous spans and removes only spans of
    ``min_span``+ tokens, leaving short incidental overlaps (quotes,
    idioms, named entities) untouched — the paper's removal *rule*
    (their §3.1 threshold; default 50) applied to this repo's
    duplicate-position substrate.

    DOCUMENTED DEVIATION (over-approximation) — VERDICT r16 item 3:
    the paper's substrate is suffix-array maximal repeats, i.e. a
    removed span is a single verbatim substring that appears
    elsewhere in the corpus as one piece. This operator's substrate
    is ``substring_dedup``'s n-gram chain, so a coalesced island can
    SPLICE runs of grams that are duplicated against *different*
    source documents: positions 1..40 duplicated against doc A and
    positions 41..80 against doc B coalesce into one 80-token island
    and get removed, even though no single 80-token verbatim copy
    exists anywhere. The deviation is strictly over-approximating
    (every paper-removable span is also removed here — a verbatim
    ≥ min_span repeat is a fortiori a contiguous run of duplicated
    grams; the converse can over-remove at splice points), which is
    the conservative direction for decontamination-style cleaning,
    and it is the same direction as the A2/J2 deviation doctrine.
    Pipelines needing the paper's exact per-source-verified semantics
    should verify spans against a single matching source before
    removal (extend the span's first gram back to its canonical
    (doc, pos) and check contiguity) — at the cost of one more
    gram-keyed join of span-sized frames.

    Deterministic semantics (both engines, bit-identical):

    - duplicated positions per doc = exactly ``substring_dedup``'s
      removal set (non-canonical occurrences of corpus-duplicated
      n-grams, span-union, keep-first canonical rule);
    - those positions are coalesced gaps-and-islands style into
      maximal runs; a run of length ≥ ``min_span`` is removed whole,
      shorter runs are kept in full;
    - kept_text = surviving tokens in original order, space-joined.

    Scale shape: the gram aggregation and gram-keyed join are shared
    with ``substring_dedup`` (map-side-combined min-struct/count — the
    intrinsic published cost). The islands pass adds NOTHING
    distributed: the per-doc removal positions are already collected
    to one sorted array by the existing doc_id aggregate, and the
    span coalescing is row-local array math (start-index filter +
    per-span slice bounds — O(len) per doc, SQL-string transforms, so
    no expression capture). No window over raw corpus rows, no new
    shuffle, no join beyond ``substring_dedup``'s own.

    Returns (doc_id, n_tokens, removed_tokens, kept_tokens, kept_text,
    n_spans, max_span_tokens) for EVERY doc — n_spans / max_span_tokens
    describe the REMOVED (≥ min_span) spans, 0 when nothing qualifies.
    """
    toked, positions = _substr_removal_positions(docs, n)
    dup_pos = positions.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dp")
    )
    # Row-local gaps-and-islands over the sorted distinct positions:
    # `starts` = 1-based indices into dp where a new run begins; span j
    # runs from dp[starts[j]] to dp[starts[j+1] - 1] (or dp[last]).
    # All SQL-string transforms over the materialized dp column.
    spans = dup_pos.select(
        "doc_id",
        F.expr(
            "filter(sequence(1, size(dp)), k -> k = 1"
            " OR element_at(dp, k) != element_at(dp, k - 1) + 1)"
        ).alias("starts"),
        "dp",
    ).select(
        "doc_id",
        F.expr(
            "filter(transform(sequence(1, size(starts)),"
            " j -> named_struct("
            "   'lo', element_at(dp, element_at(starts, j)),"
            "   'hi', element_at(dp, if(j < size(starts),"
            "         element_at(starts, j + 1) - 1, size(dp))))),"
            f" s -> s.hi - s.lo + 1 >= {min_span})"
        ).alias("qual"),
    )
    removed = spans.select(
        "doc_id",
        F.when(
            F.size("qual") > 0,
            F.expr("flatten(transform(qual, s -> sequence(s.lo, s.hi)))"),
        ).alias("rp"),
        F.size("qual").cast("long").alias("n_spans"),
        F.coalesce(
            F.expr(
                "array_max(transform(qual, s -> s.hi - s.lo + 1))"
            ).cast("long"),
            F.lit(0),
        ).alias("max_span_tokens"),
    )
    return _reconstruct_kept(
        toked, removed, passthrough=("n_spans", "max_span_tokens")
    )


def substring_dedup_spans_verified(
    docs: DataFrame, n: int = 8, min_span: int = 50
) -> DataFrame:
    """ExactSubstr maximal-span removal with PER-SPAN VERBATIM
    VERIFICATION — closes ``substring_dedup_spans``'s documented
    gram-chain over-approximation (VERDICT r16 item 3's second
    option): a removed span must be a single verbatim substring that
    appears elsewhere in the corpus as ONE PIECE, which is Lee et
    al.'s suffix-array maximal-repeat semantics. The plain spans
    operator can SPLICE grams duplicated against different source
    documents into one island; this variant checks each qualifying
    island against actual sources and removes only the verbatim-
    matched sub-spans of ``min_span``+ tokens.

    Exact semantics (both engines, bit-identical):

    - islands = ``substring_dedup_spans``'s qualifying (≥ min_span)
      maximal runs of non-canonical duplicated-gram positions;
    - for each island, every gram start p in [lo, hi-n+1] is joined to
      ALL corpus occurrences (e, q) of that gram (canonical ones too —
      the verbatim source usually IS the canonical copy), excluding
      only the exact self-occurrence (e, q) = (d, p);
    - per (island, e, delta=q−p): maximal contiguous runs of matched
      starts p1..p2 certify a verbatim token match over
      [p1, p2+n−1] (overlapping n-grams at one offset force token
      equality across the whole run); runs with p2−p1+n ≥ min_span
      are removed — the union over all (e, delta) per doc;
    - kept_text reconstruction and stats as in the spans operator,
      over the COALESCED verified removal islands.

    A verbatim ≥ min_span repeat is always inside one island (all its
    grams are duplicated), so restricting verification to qualifying
    islands loses nothing; a spliced island with no single ≥ min_span
    verbatim source is now KEPT — the false-removal branch the plain
    operator documents away.

    Scale shape: the gram aggregate and the non-canonical position
    join are the family's shared intrinsic cost; ``canon`` is
    localCheckpointed because BOTH the removal chain and the
    occurrence index consume it (O(duplicated grams) distributed
    storage buys not re-running the corpus-wide gram aggregate
    twice). The verify adds: one doc-keyed equi-join (islands →
    token arrays), one gram-keyed equi-join (island gram starts →
    duplicated-gram occurrences — bounded by the SAME occurrence
    frame the removal join already shuffles), one
    (doc, island, e, delta) aggregate whose groups are bounded by
    island length, and one per-doc distinct union. Run detection and
    coalescing are row-local SQL-string array math over materialized
    sorted arrays — NO window over corpus rows, no nested loop.

    Returns (doc_id, n_tokens, removed_tokens, kept_tokens, kept_text,
    n_spans, max_span_tokens) for EVERY doc — stats describe the
    VERIFIED removed spans. ``min_span`` must be ≥ n (a verbatim
    repeat shorter than the gram width is invisible to the substrate).
    """
    toked, grams, canon = _substr_gram_frames(docs, n)
    canon = canon.localCheckpoint(eager=True)
    # ONE gram-keyed join feeds both the removal chain and the
    # occurrence index (r18, guide §2.4): dup_occ = every occurrence of
    # a corpus-duplicated gram with its canonical (c_doc, c_i) attached.
    # Before this, `grams` (the full corpus gram explode) was joined
    # against canon TWICE — once filtered to non-canonical positions,
    # once g-only for `occ` — re-running the n-gram explode over the
    # whole corpus. The materialized frame is bounded by the corpus's
    # DUPLICATION mass (occurrences of duplicated grams only), far
    # below the full gram frame, so the checkpoint is scale-safe.
    dup_occ = grams.join(canon, "g").localCheckpoint(eager=True)
    positions = (
        dup_occ.filter(
            ~((F.col("doc_id") == F.col("c_doc")) & (F.col("i") == F.col("c_i")))
        )
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {n} - 1)")).alias("pos"),
        )
        .distinct()
    )
    dup_pos = positions.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dp")
    )
    islands = (
        dup_pos.select(
            "doc_id",
            F.expr(
                "filter(sequence(1, size(dp)), k -> k = 1"
                " OR element_at(dp, k) != element_at(dp, k - 1) + 1)"
            ).alias("starts"),
            "dp",
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(starts)),"
                    " j -> named_struct("
                    "   'lo', element_at(dp, element_at(starts, j)),"
                    "   'hi', element_at(dp, if(j < size(starts),"
                    "         element_at(starts, j + 1) - 1, size(dp))))),"
                    f" s -> s.hi - s.lo + 1 >= {min_span})"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.lo").alias("lo"), F.col("s.hi").alias("hi"))
    )
    # island gram starts with their gram strings, built row-locally
    # from the doc's token array (the small (p, g) array is
    # materialized BEFORE the explode, so t never travels per-gram)
    ig = (
        islands.join(toked, "doc_id")
        .select(
            "doc_id",
            "lo",
            F.explode(
                F.expr(
                    f"transform(sequence(lo, hi - {n} + 1),"
                    f" p -> struct(p AS p, concat_ws(' ', slice(t, p, {n})) AS g))"
                )
            ).alias("x"),
        )
        .select("doc_id", "lo", "x.p", "x.g")
    )
    # all occurrences of corpus-duplicated grams (canonical included) —
    # read from the one materialized dup_occ frame, not a second
    # corpus-wide gram join
    occ = dup_occ.select(
        F.col("doc_id").alias("e"), F.col("i").alias("q"), "g"
    )
    m = (
        ig.join(occ, "g")
        .filter(~((F.col("e") == F.col("doc_id")) & (F.col("q") == F.col("p"))))
        .select(
            "doc_id", "lo", "p", "e", (F.col("q") - F.col("p")).alias("delta")
        )
    )
    per_src = m.groupBy("doc_id", "lo", "e", "delta").agg(
        F.sort_array(F.collect_list("p")).alias("mp")
    )
    vruns = (
        per_src.select(
            "doc_id",
            F.expr(
                "filter(sequence(1, size(mp)), k -> k = 1"
                " OR element_at(mp, k) != element_at(mp, k - 1) + 1)"
            ).alias("rstarts"),
            "mp",
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(rstarts)),"
                    " j -> named_struct("
                    "   'a', element_at(mp, element_at(rstarts, j)),"
                    "   'b', element_at(mp, if(j < size(rstarts),"
                    "         element_at(rstarts, j + 1) - 1, size(mp))))),"
                    f" r -> r.b - r.a + {n} >= {min_span})"
                )
            ).alias("r"),
        )
        .select("doc_id", "r.a", "r.b")
    )
    vpos = vruns.select(
        "doc_id",
        F.explode(F.expr(f"sequence(a, b + {n} - 1)")).alias("pos"),
    ).distinct()
    removed = (
        vpos.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("rp"))
        .select(
            "doc_id",
            "rp",
            F.expr(
                "filter(sequence(1, size(rp)), k -> k = 1"
                " OR element_at(rp, k) != element_at(rp, k - 1) + 1)"
            ).alias("vstarts"),
        )
        .select(
            "doc_id",
            "rp",
            F.size("vstarts").cast("long").alias("n_spans"),
            F.expr(
                "array_max(transform(sequence(1, size(vstarts)),"
                " j -> (if(j < size(vstarts),"
                "       element_at(rp, element_at(vstarts, j + 1) - 1),"
                "       element_at(rp, size(rp)))"
                "   - element_at(rp, element_at(vstarts, j))) + 1))"
            ).cast("long").alias("max_span_tokens"),
        )
    )
    return _reconstruct_kept(
        toked, removed, passthrough=("n_spans", "max_span_tokens")
    )


def _reconstruct_kept(
    toked: DataFrame,
    removed: DataFrame,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Shared kept-text reconstruction for ``substring_dedup``, its
    incremental form and the maximal-span variant: join the per-doc
    sorted removal-position arrays back onto the tokenized corpus and
    rebuild the surviving text. ``passthrough`` names extra BIGINT
    columns on ``removed`` to carry through (null → 0 for docs with no
    removal row), appended after ``kept_text``.

    LINEAR per doc (r12 — VERDICT r11 flagged the previous
    ``filter(t, idx -> !array_contains(rp, idx))`` form as
    O(len × removed) per doc): ``array_except(sequence(1, size(t)),
    rp)`` builds a hash set of the removed positions (Spark's
    ArrayExcept codegen uses an OpenHashSet for primitive element
    types), so kept positions cost O(len + removed) and the indexed
    ``element_at`` projection is O(len) — all within-row, no new
    shuffle (the explode + anti-join alternative would re-shuffle the
    corpus at per-TOKEN granularity). ``array_except`` preserves
    first-array order and ``sequence`` is duplicate-free, so token
    order survives exactly.

    Contract: ``rp`` is null or a non-empty array of distinct 1-based
    positions for a doc with ≥ 1 token — ``sequence(1, size(t))`` is
    only built on that branch (sequence(1, 0) is DESCENDING, not
    empty, the usual trap). ``rp`` may be int or long positions; the
    cast normalizes (element_at needs an int index).
    """
    kept_expr = F.expr(
        "transform(array_except(sequence(1, size(t)),"
        " cast(rp AS array<int>)), p -> element_at(t, p))"
    )
    return (
        toked.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.when(F.col("rp").isNull(), F.lit(0))
            .otherwise(F.size("rp"))
            .cast("long")
            .alias("removed_tokens"),
            F.when(F.col("rp").isNull(), F.size("t"))
            .otherwise(F.size("t") - F.size("rp"))
            .cast("long")
            .alias("kept_tokens"),
            F.when(
                F.col("rp").isNull(), F.concat_ws(" ", F.col("t"))
            )
            .otherwise(F.concat_ws(" ", kept_expr))
            .alias("kept_text"),
            *(
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in passthrough
            ),
        )
    )


def _gram_index_merge(state: DataFrame, new: DataFrame) -> DataFrame:
    u = state.unionByName(new)
    return (
        u.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "i")).alias("m"))
        .select(
            "fp",
            F.col("m.doc_id").cast("long").alias("doc_id"),
            F.col("m.i").cast("long").alias("i"),
        )
    )


def incremental_substring_dedup(new_docs: DataFrame, store, n: int = 8) -> DataFrame:
    """``substring_dedup``'s operational form: remove an INCREMENT's
    duplicated n-gram spans against a persistent gram-fingerprint index
    (the ``incremental_chunk_dedup`` mechanic at overlapping-gram
    granularity) — a daily crawl drop loses its duplicated substrings
    against EVERYTHING already ingested at O(increment) cost, never by
    re-gramming the corpus.

    Per batch: gram (h60 fingerprint of the gram STRING — the index
    stores 8-byte fps, not 8-token strings; collision probability
    < |grams|²/2⁶¹, the documented exactness trade the chunk index
    already makes) → within-batch canonical per fp (min (doc_id, i),
    one map-side-combined aggregation) → anti-join against the
    partition-pruned index probe → admit fresh fps with their canonical
    occurrence → an occurrence SURVIVES iff it is the batch canonical
    AND its gram is fresh; all other occurrences' [i, i+n) spans union
    into the doc's removal set, and the batch documents reconstruct
    exactly as in the one-shot operator.

    The INDEX is replay-idempotent (min-merge); the EMITTED output is
    first-delivery-wins (a replayed batch's grams sit in the index, so
    it reconstructs as heavily-removed text) — the output sink must be
    append-once per batch_id, exactly the ``chunk_dedup_applier``
    protocol, which ``streaming.ops.substring_dedup_stream`` applies.

    Equivalence law (pinned in tests): feeding batches in doc_id order
    and concatenating the emissions equals one-shot ``substring_dedup``
    over the union — keep-the-first-occurrence and arrival order
    coincide exactly then (an occurrence kept at emission time can
    never be demoted by later, larger (doc_id, i) arrivals, because
    removal only ever points backward).

    Returns (doc_id, n_tokens, removed_tokens, kept_tokens, kept_text)
    for the batch's docs.
    """
    fresh, out = incremental_substring_dedup_plan(new_docs, store, n)
    store.merge(fresh, _gram_index_merge)
    return out


def incremental_substring_dedup_plan(
    new_docs: DataFrame, store, n: int = 8
) -> tuple[DataFrame, DataFrame]:
    """``incremental_substring_dedup`` WITHOUT the index merge — the
    ``(fresh, out)`` split ``incremental_chunk_dedup_plan`` defines,
    and for the same reason: ``out`` depends only on the batch's grams
    and the materialized ``fresh``, so a crash-recovery protocol may
    order output-commit and index-merge as it needs."""
    from tepsonic_database_sync_spark.functions.hashing import h60
    from tepsonic_database_sync_spark.operators.text import tokens

    toked = new_docs.select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda x: x != F.lit("")).alias("t"),
    )
    grams = (
        toked.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n} + 1),"
                    f" i -> struct(i AS i, concat_ws(' ', slice(t, i, {n})) AS g))"
                )
            ).alias("x"),
        )
        .select(
            "doc_id",
            F.col("x.i").cast("long").alias("i"),
            h60(F.col("x.g")).alias("fp"),
        )
    )
    canon = (
        grams.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "i")).alias("m"))
        .select("fp", F.col("m.doc_id").alias("doc_id"), F.col("m.i").alias("i"))
    )
    existing = store.read_touched(canon.select("fp"))
    fresh = (
        canon
        if existing is None
        else canon.join(existing.select("fp"), "fp", "left_anti")
    )
    fresh = fresh.localCheckpoint(eager=True)
    removed = (
        grams.join(
            fresh.select(
                "fp",
                F.col("doc_id").alias("__wd"),
                F.col("i").alias("__wi"),
            ),
            "fp",
            "left",
        )
        .filter(
            F.col("__wd").isNull()
            | (F.col("doc_id") != F.col("__wd"))
            | (F.col("i") != F.col("__wi"))
        )
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {n} - 1)")).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("rp"))
    )
    return fresh, _reconstruct_kept(toked, removed)


CONTAIN_TAU_PERMILLE = 700


def containment_pairs(
    docs: DataFrame, n: int = 3, tau_permille: int = CONTAIN_TAU_PERMILLE
) -> DataFrame:
    """EXACT asymmetric containment self-join: directed pairs (a, b)
    with C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ τ — the
    dedup ladder's SUBSET detector (a quoted, excerpted, or
    boilerplate-wrapped inside b), which symmetric Jaccard structurally
    misses: a 50-gram doc fully contained in a 500-gram doc has
    J ≈ 0.1 but C = 1.0.

    Prefix filtering adapts to containment one-sidedly (the Bayardo/
    Xiao mechanic ``jaccard_pairs_prefix`` uses, with the b-side
    length/prefix constraints dropped — containment puts no upper bound
    on |b|): rank each doc's shingles by global rarity (df asc, shingle
    asc); if overlap ≥ ⌈τ·|a|⌉ then a's FIRST shared shingle sits at
    position ≤ |a| − ⌈τ·|a|⌉ + 1, so joining a's PREFIX against b's
    FULL posting list generates every qualifying pair. Candidates pass
    the length filter (1000·|b| ≥ τ·|a| — b must hold enough grams) and
    the positional filter (1 + |a| − pos(a) ≥ ⌈τ·|a|⌉, sound per-row by
    the first-shared-gram argument in ``jaccard_pairs_prefix``), then
    exact array-intersect verification. All integer math.

    Scale trade, documented: the b-side posting lists are UNCAPPED —
    exactness forbids a df-cap, so stop-gram-heavy corpora hot-spot the
    gram join (the winnowing stop-fingerprint cap is the lossy
    alternative when that binds; AQE skew-join split is the lossless
    mitigation). The df attach is deliberately UNHINTED: the shingle
    vocabulary grows with the corpus, and a forced broadcast was
    MEASURED super-linear at sf0.1×8 (44.5 s hinted vs 13.3 s
    adaptive — driver-side build of a multi-million-row map); AQE
    still picks a broadcast when the vocabulary is actually small.
    (``jaccard_pairs_prefix`` and ``token_pmi`` carried the same
    vocabulary-scaled hints until r12, when the rotation window let
    the unhinting land with its re-verification.)
    Rare-first prefix ordering minimizes the a-side fan-out exactly as
    in the Jaccard form.

    Returns directed (a_id, b_id, inter_size, a_size, cont_permille),
    cont_permille = (1000·inter) div |a|.
    """
    s = (
        _with_shingles(docs, n)
        .select(
            "doc_id", "shingles", F.size("shingles").cast("long").alias("sz")
        )
        .filter(F.col("sz") >= 1)
        .localCheckpoint(eager=True)
    )
    tok = s.select("doc_id", "sz", F.explode("shingles").alias("g"))
    dfreq = tok.groupBy("g").agg(F.count("*").cast("long").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    need = F.expr(f"(sz * {tau_permille} + 999) div 1000")  # ceil(tau·|a|)
    keep = F.col("sz") - need + 1
    prefix = (
        tok.join(dfreq, "g")
        .withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= keep)
        .select(
            F.col("doc_id").alias("a_id"),
            F.col("sz").alias("a_sz"),
            F.col("__pos").alias("a_pos"),
            "g",
        )
    )
    full_b = tok.select(
        F.col("doc_id").alias("b_id"), F.col("sz").alias("b_sz"), "g"
    )
    a_need = F.expr(f"(a_sz * {tau_permille} + 999) div 1000")
    cands = (
        prefix.join(full_b, "g")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.col("b_sz") * 1000 >= F.col("a_sz") * tau_permille)
        .filter(1 + F.col("a_sz") - F.col("a_pos") >= a_need)
        .select("a_id", "b_id")
        .distinct()
    )
    av = s.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    bv = s.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    # verify attaches deliberately UNHINTED — identical reasoning (and
    # the same r18 A/B rejection of the forced candidate broadcast:
    # 3.5 → 8.8 s min-of-4 here) as jaccard_pairs_prefix above.
    pairs = cands.join(av, "a_id").join(bv, "b_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("long")
    return (
        pairs.select(
            "a_id",
            "b_id",
            inter.alias("inter_size"),
            F.size("a_sh").cast("long").alias("a_size"),
        )
        .filter(F.col("inter_size") * 1000 >= F.col("a_size") * tau_permille)
        .withColumn(
            "cont_permille",
            F.expr("(1000 * inter_size) div a_size").cast("long"),
        )
    )


def snapshot_dedup(
    captures: DataFrame,
    url: str = "url",
    snapshot: str = "snapshot_id",
    text: str = "text",
) -> DataFrame:
    """Cross-snapshot URL-level dedup with a frequency keep policy — the
    CommonCrawl-corpus step between per-snapshot dedup and training:
    the same URL is re-captured in every crawl snapshot, usually with
    identical content, sometimes with edits or transient error pages.
    Published pipelines keep ONE capture per URL (RefinedWeb §3 dedups
    across dumps; FineWeb measured per-snapshot dedup + cross-snapshot
    URL policy beating global MinHash); the robust policy is
    MOST-FREQUENT content version — a transient error page captured
    once loses to the stable page captured in every other snapshot —
    with recency (latest last_seen) then fingerprint as deterministic
    tie-breaks.

    Version identity is the exact normalized-content fingerprint
    (``normalize_text`` + the portable ``h60`` — the ``fingerprint``
    operator's key), so "same version" is whitespace/case-insensitive
    exact equality, the cross-snapshot analog of ``exact_dedup``.

    Scale shape: two map-side-combined aggregates — (url, fp) capture
    rollup, then per-url argmax as ONE ``max(struct(...))`` (the
    grouped-mode pattern: sort keys support, last_seen, -fp lead the
    struct; fp/first_seen ride as payload) — never a per-url
    neighborhood sort or window. Both shuffle keys contain url, so hot
    URLs don't exist (a URL has ≤ #snapshots captures by construction).

    Returns (url, n_captures, n_versions, win_support, win_first_seen,
    win_last_seen, win_fp).
    """
    return snapshot_winners(snapshot_versions(captures, url, snapshot, text))


def snapshot_versions(
    captures: DataFrame,
    url: str = "url",
    snapshot: str = "snapshot_id",
    text: str = "text",
) -> DataFrame:
    """The (url, fp) version STORE underlying snapshot_dedup: one row
    per content version per URL with its capture support and
    first/last snapshot — the mergeable state the incremental form
    persists between crawls. One map-side-combined aggregate."""
    from tepsonic_database_sync_spark.functions.hashing import h60
    from tepsonic_database_sync_spark.operators.text import normalize_text

    v = captures.select(
        F.col(url).alias("url"),
        F.col(snapshot).cast("long").alias("snap"),
        h60(normalize_text(F.col(text))).alias("fp"),
    )
    return v.groupBy("url", "fp").agg(
        F.count("*").cast("long").alias("support"),
        F.min("snap").cast("long").alias("first_seen"),
        F.max("snap").cast("long").alias("last_seen"),
    )


def snapshot_store_merge(store: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge a new crawl's version rollup into the persisted store —
    the INCREMENTAL step of cross-snapshot dedup (each monthly
    snapshot arrives; nobody recomputes all dumps from scratch). The
    version statistics are MERGEABLE by construction (support is a
    sum, first/last_seen a min/max), so the merge is one co-keyed
    full-outer join on (url, fp) — the same exactly-once MERGE shape
    as ``incremental_dedup``'s store. Algebraic law (property-tested
    AND the registry oracle): folding snapshots through this merge in
    ANY batch split equals the one-shot batch rollup.

    Both inputs in store schema (url, fp, support, first_seen,
    last_seen); returns the merged store."""
    s = store.select(
        "url", "fp",
        F.col("support").alias("s_sup"),
        F.col("first_seen").alias("s_first"),
        F.col("last_seen").alias("s_last"),
    )
    b = batch.select(
        "url", "fp",
        F.col("support").alias("b_sup"),
        F.col("first_seen").alias("b_first"),
        F.col("last_seen").alias("b_last"),
    )
    z = F.lit(0).cast("long")
    return s.join(b, ["url", "fp"], "full_outer").select(
        "url",
        "fp",
        (F.coalesce(F.col("s_sup"), z) + F.coalesce(F.col("b_sup"), z))
        .cast("long")
        .alias("support"),
        F.least(
            F.coalesce(F.col("s_first"), F.col("b_first")),
            F.coalesce(F.col("b_first"), F.col("s_first")),
        )
        .cast("long")
        .alias("first_seen"),
        F.greatest(
            F.coalesce(F.col("s_last"), F.col("b_last")),
            F.coalesce(F.col("b_last"), F.col("s_last")),
        )
        .cast("long")
        .alias("last_seen"),
    )


def snapshot_winners(store: DataFrame) -> DataFrame:
    """The keep-policy reduction over a version store: per-url argmax
    on (support DESC, last_seen DESC, fp ASC) as ONE max(struct) —
    shared by the batch and incremental forms."""
    win = store.groupBy("url").agg(
        F.count("*").cast("long").alias("n_versions"),
        F.sum("support").cast("long").alias("n_captures"),
        F.max(
            F.struct(
                F.col("support"),
                F.col("last_seen"),
                (-F.col("fp")).alias("neg_fp"),
                F.col("fp"),
                F.col("first_seen"),
            )
        ).alias("w"),
    )
    return win.select(
        "url",
        "n_captures",
        "n_versions",
        F.col("w.support").alias("win_support"),
        F.col("w.first_seen").alias("win_first_seen"),
        F.col("w.last_seen").alias("win_last_seen"),
        F.col("w.fp").alias("win_fp"),
    )


EDIT_TAU_PERMILLE = 200   # near-dup iff edit distance <= 20% of longer
EDIT_MAX_CHARS = 2000     # verify on a bounded prefix (DP is O(n*m))


def edit_verified_pairs(
    docs: DataFrame,
    tau_permille: int = EDIT_TAU_PERMILLE,
    max_chars: int = EDIT_MAX_CHARS,
) -> DataFrame:
    """Edit-distance-verified near-duplicate pairs — the character-level
    verification tier between shingle Jaccard (``ngram_jaccard_pairs``)
    and semantic cosine (``semdedup``): MinHash-LSH banded candidates
    (never all-pairs) verified by Levenshtein distance ≤ tau of the
    longer normalized text — the classic near-dup confirm step (Broder's
    sketch → verify shape with edit distance as the verifier; both
    engines ship the same Wagner-Fischer unit-cost distance, so the
    oracle is value-exact).

    Scale design, stated honestly: the DP is O(n·m) PER PAIR, so
    verification runs on normalized text TRUNCATED to ``max_chars``
    (named constant; 2000 chars bounds a pair at 4M cell ops) — at
    100 TB full-document edit distance is not a thing anyone computes;
    the prefix is the standard trade. Three guards run BEFORE the DP:
    the banded candidate join bounds the pair count, a FULL-length gap
    reject on the untruncated normalized lengths (|flen_a − flen_b| >
    tau of the longer full text ⇒ the true distance must exceed tau —
    deletions alone cost the gap), and the truncated-length gap reject
    (|len_a − len_b| > tau_abs). The full-length guard closes the
    truncation false-accept class ADVICE r13 flagged — two docs
    identical in their first 2000 chars but wildly different lengths
    (boilerplate-prefixed pages) no longer read as distance 0; pairs
    that survive it and differ only beyond the cap still read as
    near-dups (the residual, now length-bounded, prefix trade). Both
    gap rejects sit inside a short-circuiting ``when`` — Catalyst may
    reorder filter conjuncts, a ``when`` guard it cannot.

    Returns (a_id, b_id, dist, dist_permille) for surviving pairs.
    """
    from tepsonic_database_sync_spark.operators.text import normalize_text

    if "n_chars" not in docs.columns:
        # the shingle helper selects n_chars (length-block metadata some
        # callers carry); the minhash path never reads its value
        docs = docs.withColumn("n_chars", F.lit(None).cast("long"))
    cands = lsh_candidate_pairs(minhash_sig_array(docs))
    # Catalyst's subexpression elimination computes normalize_text once
    # per row for the prefix and the full length. The frame feeds BOTH
    # verify attaches, so it is materialized once (r18, guide §2.4 —
    # before this the a-side and b-side each re-ran the parquet scan +
    # normalize pass; the checkpoint is the lightweight-proxy table of
    # guide §8, 2 KB/doc, never the raw corpus).
    nt = docs.select(
        "doc_id",
        F.substring(normalize_text(F.col("text")), 1, max_chars).alias("nt"),
        F.length(normalize_text(F.col("text"))).cast("long").alias("fl"),
    ).localCheckpoint(eager=True)
    # Both attaches broadcast the CANDIDATE-BOUNDED side (r18, guide
    # §3.2 — the decontaminate_fuzzy precedent): the pair frame is
    # bounded by band collisions, so it broadcasts, and the corpus-sized
    # nt proxy STREAMS through both joins instead of being hash-built —
    # without the hints the planner builds on nt, which is exactly the
    # corpus-sized build side that dies at 100 TB.
    j = (
        F.broadcast(
            F.broadcast(cands).join(
                nt.select(
                    F.col("doc_id").alias("a_id"),
                    F.col("nt").alias("na"),
                    F.col("fl").alias("fla"),
                ),
                "a_id",
            )
        )
        .join(
            nt.select(
                F.col("doc_id").alias("b_id"),
                F.col("nt").alias("nb"),
                F.col("fl").alias("flb"),
            ),
            "b_id",
        )
        .withColumn("la", F.length("na").cast("long"))
        .withColumn("lb", F.length("nb").cast("long"))
        .withColumn(
            "tau_abs",
            F.expr(f"greatest(la, lb) * {tau_permille} div 1000").cast(
                "long"
            ),
        )
        .withColumn(
            "tau_full",
            F.expr(f"greatest(fla, flb) * {tau_permille} div 1000").cast(
                "long"
            ),
        )
    )
    dist = F.when(
        (F.abs(F.col("fla") - F.col("flb")) <= F.col("tau_full"))
        & (F.abs(F.col("la") - F.col("lb")) <= F.col("tau_abs")),
        F.levenshtein("na", "nb").cast("long"),
    )
    out = (
        j.withColumn("dist", dist)
        .filter(F.col("dist").isNotNull() & (F.col("dist") <= F.col("tau_abs")))
    )
    return out.select(
        "a_id",
        "b_id",
        "dist",
        F.when(
            F.greatest("la", "lb") > 0,
            F.expr("dist * 1000 div greatest(la, lb)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dist_permille"),
    )


LINE_DEDUP_HEAD_CHARS = 240


def line_dedup(
    docs: DataFrame, head_chars: int = LINE_DEDUP_HEAD_CHARS
) -> DataFrame:
    """Cross-corpus duplicate-LINE removal — CCNet's paragraph-dedup
    preprocessing step (Wenzek et al. 2020, §4.2: hash every paragraph,
    drop repeats corpus-wide keeping one copy; RefinedWeb/FineWeb
    inherit the pass for boilerplate — nav bars, cookie banners, footer
    text — which document-level dedup never catches because the
    surrounding page differs). The reference has no text surface; this
    is an extension operator of the training-data pipeline.

    Semantics (deterministic): lines are normalized ``lower(trim())``
    with empties dropped (``text.norm_lines_expr`` — the corpus's one
    line form); a line occurrence is KEPT iff it is the corpus-first
    occurrence of its content, i.e. the lexicographic minimum
    ``(doc_id, line_no)`` over all occurrences of that line. Every doc
    reports its surviving prefix (first ``head_chars`` chars of the
    kept lines re-joined in order — certifies actual reconstruction,
    the bpe_encode enc_head pattern) plus exact counts.

    Line identity is the 60-bit ``h60`` content hash — the engine's
    cross-engine workhorse; a collision would merge two distinct lines
    (probability ~n²/2⁶¹ — negligible, and the DuckDB oracle uses the
    identical construction, so parity is unconditional).

    Scale shape: ONE map-side-combined aggregate on the line-hash key
    (the min-struct keeper partial-combines, so a million-copy cookie
    banner ships one row per map task, never a hot reduce key) + the
    occurrences-to-keeper equi-join back on the same key, UNHINTED —
    the keeper frame is |distinct lines| rows; AQE broadcasts it when
    small, and its skew-split covers the hot-key join when a
    boilerplate line dominates. The per-doc reassembly shuffles on
    uniform doc_id. No window over raw rows, no driver state.

    Returns (doc_id, n_lines, n_kept, removed_permille, kept_head).
    """
    from tepsonic_database_sync_spark.operators.text import (
        _permille,
        norm_lines_expr,
    )

    lines = docs.select(
        "doc_id",
        F.posexplode(norm_lines_expr(F.col("text"))).alias("idx", "line"),
    ).select(
        "doc_id",
        (F.col("idx") + 1).cast("long").alias("line_no"),
        "line",
        h60(F.col("line")).alias("k"),
    )
    keep = lines.groupBy("k").agg(
        F.min(F.struct("doc_id", "line_no")).alias("keeper")
    )
    flagged = lines.join(keep, "k").select(
        "doc_id",
        "line_no",
        "line",
        (
            (F.col("doc_id") == F.col("keeper.doc_id"))
            & (F.col("line_no") == F.col("keeper.line_no"))
        ).alias("kept"),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        # collect_list skips the NULLs the no-otherwise when() leaves on
        # removed lines; array_sort on (line_no, line) structs is
        # positional order
        F.substring(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("line_no", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ),
            1,
            head_chars,
        ).alias("kept_head"),
    )
    z = lambda c: F.coalesce(c, F.lit(0)).cast("long")  # noqa: E731
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            z(F.col("n_lines")).alias("n_lines"),
            z(F.col("n_kept")).alias("n_kept"),
            _permille(
                z(F.col("n_lines")) - z(F.col("n_kept")),
                z(F.col("n_lines")),
            ).alias("removed_permille"),
            F.coalesce(F.col("kept_head"), F.lit("")).alias("kept_head"),
        )
    )


def dedup_cluster_census(docs: DataFrame) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — the corpus-health report
    the FineWeb/RefinedWeb ablations plot before choosing a dedup
    policy: how many near-dup clusters exist at each size, what share
    of the corpus sits in them, and an example cluster id per size (the
    thing an engineer actually goes and reads). A corpus whose mass
    sits in large clusters needs aggressive dedup; one that is mostly
    singletons doesn't — this report is the decision input, the dedup
    operators above are the treatment.

    Clusters are the repo's certified fuzzy tier (MinHash-LSH pairs →
    star-contraction components, labels = min member id). Census rules
    (deterministic): per size, n_clusters, n_docs = size·n_clusters,
    doc_share_permille = n_docs·1000 div corpus size, example_cluster =
    the smallest cluster id of that size. Singletons are counted (size
    1 row) — the report must say how much of the corpus is NOT
    duplicated.

    Scale shape: on top of the pair/CC substrate, ONE map-side count
    per cluster label, ONE count per size (output is |distinct sizes|
    rows — tens), and the corpus total as a broadcast 1-row aggregate.
    No window, no driver-side state.

    Returns (cluster_size, n_clusters, n_docs, doc_share_permille,
    example_cluster) ordered by nothing (the driver compare sorts).
    """
    from tepsonic_database_sync_spark.operators.text import _permille

    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    pairs = lsh_candidate_pairs(minhash_sig_array(docs)).localCheckpoint(
        eager=True
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    comp = connected_components_star(pairs, nodes, edges_canonical=True)
    sizes = comp.groupBy("comp").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    total = docs.agg(F.count("*").cast("long").alias("n_total"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.min("comp").cast("long").alias("example_cluster"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            _permille(
                F.col("cluster_size") * F.col("n_clusters"),
                F.col("n_total"),
            ).alias("doc_share_permille"),
            "example_cluster",
        )
    )


def boilerplate_report(
    docs: DataFrame, source_col: str = "source", min_docs: int = 3
) -> DataFrame:
    """Per-source boilerplate-line census — the curation report that
    tells a pipeline WHICH sources ship template lines (nav bars,
    cookie banners, footers) and how much of the source they cover.
    RefinedWeb/CCNet REMOVE repeated lines (``line_dedup``); this is
    the measurement that decides whether a source needs that pass at
    all, or should be dropped wholesale (a source whose top line sits
    in 90% of its docs is a template farm).

    Deterministic semantics (both engines): lines normalized by
    ``text.norm_lines_expr`` (lower/trim, empties dropped); a line is
    BOILERPLATE for a source iff it appears in ≥ ``min_docs`` DISTINCT
    docs of that source (distinct docs, not occurrences — a 100×
    within-doc repeat is repetition, not boilerplate); the TOP line is
    the one in the most distinct docs, ties broken by the smaller line
    string.

    Scale shape: one distinct pass on (source, line, doc_id) —
    partial-combined, within-doc repeats collapse map-side — then ONE
    (source, line) count, a per-source argmax via the algebraic
    min(struct(-cnt, line)) (no window), and one equi-join back from
    the boilerplate lines for the affected-docs permille. Output is
    |sources| rows; every join key is the wide (source, line) space or
    uniform doc_id — no hot reduce key. The keys carry raw normalized
    lines (not h60) because the report itself needs the string; at
    100 TB swap the census key to h60 and re-attach the top line by a
    final |sources|-row lookup if line widths dominate the shuffle.

    Returns (source, n_docs, n_boiler_lines, top_line, top_line_docs,
    coverage_permille, boiler_doc_permille) — all-zero/'' for sources
    with no qualifying line.
    """
    from tepsonic_database_sync_spark.operators.text import (
        _permille,
        norm_lines_expr,
    )

    base = docs.select(
        "doc_id", F.col(source_col).alias("source")
    )
    n_docs = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # distinct (source, line, doc) — the census unit
    sld = (
        docs.select(
            "doc_id",
            F.col(source_col).alias("source"),
            F.explode(norm_lines_expr(F.col("text"))).alias("line"),
        )
        .distinct()
    )
    counts = sld.groupBy("source", "line").agg(
        F.count("*").cast("long").alias("in_docs")
    )
    boiler = counts.filter(F.col("in_docs") >= min_docs)
    top = boiler.groupBy("source").agg(
        F.count("*").cast("long").alias("n_boiler_lines"),
        F.min(
            F.struct(
                (-F.col("in_docs")).alias("nc"), F.col("line").alias("l")
            )
        ).alias("k"),
    )
    # docs touched by ANY boilerplate line of their source
    touched = (
        sld.join(boiler.select("source", "line"), ["source", "line"])
        .select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("boiler_docs"))
    )
    z = lambda c: F.coalesce(c, F.lit(0)).cast("long")  # noqa: E731
    return (
        n_docs.join(top, "source", "left")
        .join(touched, "source", "left")
        .select(
            "source",
            "n_docs",
            z(F.col("n_boiler_lines")).alias("n_boiler_lines"),
            F.coalesce(F.col("k.l"), F.lit("")).alias("top_line"),
            z(-F.col("k.nc")).alias("top_line_docs"),
            _permille(z(-F.col("k.nc")), F.col("n_docs")).alias(
                "coverage_permille"
            ),
            _permille(z(F.col("boiler_docs")), F.col("n_docs")).alias(
                "boiler_doc_permille"
            ),
        )
    )


NGRAM_NOVELTY_N = 8


def ngram_novelty(docs: DataFrame, n: int = NGRAM_NOVELTY_N) -> DataFrame:
    """Per-document novel-n-gram rate — the memorization/duplication
    audit of Lee et al. 2022 (ACL, "Deduplicating Training Data Makes
    Language Models Better"): a document's n-gram is NOVEL iff this is
    its first occurrence in the corpus (lexicographic (doc_id,
    position) order — the ``line_dedup`` keeper rule at gram
    granularity), and heavily non-novel documents are the train-set
    memorization hazard the paper measures. The reference has no text
    surface; extension operator.

    Exact integer semantics: per doc, ``n_grams`` (token count − n + 1,
    0 under n tokens), ``n_novel`` (corpus-first occurrences),
    ``novelty_permille = n_novel · 1000 div n_grams``. Within-doc
    repeats count as non-novel beyond their first occurrence — same
    rule corpus-wide, no special casing.

    Scale shape (r17 — the keeper join-back is GONE): the positional
    gram generator is the certified ``substring_dedup`` expr (token
    array materialized as a column — the lambda-capture contract) and
    runs ONCE; then ONE map-side-combined min-struct aggregate on the
    h60 gram key (hot boilerplate grams combine per map task). Each
    gram key has exactly one corpus-first occurrence, so
    ``n_novel(doc) = count of keys whose keeper lands in doc`` — a tiny
    groupBy over the keeper frame — and ``n_grams(doc)`` is just
    ``max(|tokens| − n + 1, 0)``, read straight off the token array.
    The pre-r17 form joined the FULL gram-occurrence frame back against
    the keeper frame on the gram key (second full-size exchange) and
    re-generated the grams for that side (the aggregate and the join
    are different subtrees, so no exchange reuse); both costs were pure
    overhead — the join only recovered a per-occurrence flag whose
    per-doc sum is already determined by the keeper frame alone.

    Returns (doc_id, n_grams, n_novel, novelty_permille).
    """
    from tepsonic_database_sync_spark.operators.text import _permille
    from tepsonic_database_sync_spark.io import fan_out_cpu

    toked = fan_out_cpu(docs).select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda x: x != F.lit("")).alias("t"),
    )
    grams = (
        toked.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n} + 1),"
                    f" i -> struct(i AS i, concat_ws(' ', slice(t, i, {n})) AS g))"
                )
            ).alias("x"),
        )
        .select(
            "doc_id",
            F.col("x.i").cast("long").alias("i"),
            h60(F.col("x.g")).alias("k"),
        )
    )
    keep = grams.groupBy("k").agg(
        F.min(F.struct("doc_id", "i")).alias("keeper")
    )
    # exactly ONE occurrence per gram key is corpus-first (the min
    # struct), so counting keepers per doc IS the per-doc novel count —
    # no join back against the occurrence frame needed
    novel = keep.groupBy(F.col("keeper.doc_id").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_novel")
    )
    per_doc = toked.select(
        "doc_id",
        F.greatest(F.size("t").cast("long") - n + 1, F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    z = lambda c: F.coalesce(c, F.lit(0)).cast("long")  # noqa: E731
    return (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            z(F.col("n_grams")).alias("n_grams"),
            z(F.col("n_novel")).alias("n_novel"),
            _permille(z(F.col("n_novel")), z(F.col("n_grams"))).alias(
                "novelty_permille"
            ),
        )
    )


def contamination_report(
    docs: DataFrame, source_col: str = "source", **kwargs
) -> DataFrame:
    """Per-source benchmark-contamination report — the curation
    dashboard over ``contamination_flags``: WHICH sources leak eval
    data is the actionable question (a contaminated source gets
    dropped or re-filtered wholesale; the per-doc flags alone don't
    localize the leak). Keyword args pass through to
    ``contamination_flags``.

    Exact integer semantics per source (training docs only — the
    held-out benchmark slice is excluded by construction):
    ``contamination_permille = n_contaminated · 1000 div n_docs``,
    plus the total and max hit-gram counts for severity.

    Scale shape: ``contamination_flags``'s plan (broadcast gram probe,
    one doc_id groupBy) + the source attach on uniformly-spread doc_id
    + ONE map-side-combined rollup to |sources| rows.

    Returns (source, n_docs, n_contaminated, contamination_permille,
    total_hit_grams, max_hit_grams).
    """
    from tepsonic_database_sync_spark.operators.text import _permille

    flags = contamination_flags(docs, **kwargs)
    j = flags.join(
        docs.select("doc_id", F.col(source_col).alias("source")), "doc_id"
    )
    agg = j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.sum("n_hit_grams").cast("long").alias("total_hit_grams"),
        F.max("n_hit_grams").cast("long").alias("max_hit_grams"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_contaminated",
        _permille(F.col("n_contaminated"), F.col("n_docs")).alias(
            "contamination_permille"
        ),
        "total_hit_grams",
        "max_hit_grams",
    )

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

from pyspark.sql import Column, DataFrame
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

    Guarded: ``sequence(0, size-n)`` only when size ≥ n (Spark's sequence
    DESCENDS when stop < start — an empty-array guard, not a clamp).
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def _with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id",
        "n_chars",
        word_shingles(tokens(F.col("text")), n).alias("shingles"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, block_chars: int = 100, min_inter: int = 2
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: candidate pairs share a length
    block (n_chars // block_chars); overlap reported as exact integers
    (inter/union sizes) — no float ratios.

    At 100 TB the blocking key bounds the join fan-out; swap the length
    block for LSH bands (below) when recall matters more than cost.
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


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K, n: int = 3) -> DataFrame:
    """k-wide MinHash signature per document: sig_i = min over shingles of
    a salt-i 60-bit hash. Output long format (doc_id, i, sig) — the
    natural shape for both banding and SQL oracles."""
    s = _with_shingles(docs, n)
    exploded = s.select(
        "doc_id", F.explode("shingles").alias("sh")
    ).join(
        # k salts via a broadcast range — stays fully columnar
        F.broadcast(
            docs.sparkSession.range(k).select(F.col("id").cast("int").alias("i"))
        ),
        how="cross",
    )
    hashed = exploded.select(
        "doc_id",
        "i",
        h60(F.concat(F.col("i").cast("string"), F.lit("#"), F.col("sh"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "i").agg(F.min("h").alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, band_size: int = LSH_BAND_SIZE
) -> DataFrame:
    """LSH banding over long-format signatures: band id = i div band_size,
    band key = md5 of the ordered sigs in the band; candidates = pairs of
    docs sharing any (band, key) bucket."""
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


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash signature: per token a 60-bit hash votes ±1 on each of
    ``bits`` positions; the packed majority bits form the signature.
    Relational form: explode(token) × broadcast(bit-mask table) → sign
    sum per (doc, bit) → pack via sum of masks. Masks are precomputed
    driver-side (shiftleft needs a literal count; a 32-row broadcast is
    free and keeps everything portable)."""
    spark = docs.sparkSession
    masks = spark.createDataFrame(
        [(b, 1 << b) for b in range(bits)], "b int, mask long"
    )
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    hashed = tok.select("doc_id", h60(F.col("t")).alias("h"))
    bit = hashed.join(F.broadcast(masks), how="cross").select(
        "doc_id",
        "b",
        "mask",
        F.when(F.col("h").bitwiseAND(F.col("mask")) != 0, 1).otherwise(-1).alias("vote"),
    )
    votes = bit.groupBy("doc_id", "b", "mask").agg(F.sum("vote").alias("s"))
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.col("mask")).otherwise(F.lit(0)))
        .cast("long")
        .alias("simhash")
    )

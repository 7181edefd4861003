"""Sequence packing — the concat-and-chunk layout step of LLM pretraining.

Training consumes fixed-length context windows, not documents: documents
are concatenated in a deterministic order and the resulting token stream
is cut every ``ctx_len`` tokens. This operator computes, per document,
where it lands in that stream — its start offset and the range of context
windows it spans — without materializing the stream itself.

Scale design: a GLOBAL running sum would be a single-partition window
(one task owns the whole orderBy — the classic scale killer). Instead the
corpus is sharded on a key (``source`` here) and each shard packs its own
independent token stream, which is how production packing runs anyway:
shards map to writer tasks, each emitting its own sequence of context
windows. The window function is partitioned on the shard key, so the work
distributes across however many shards the corpus has; within a shard the
cumulative sum is one sort + one pass. All arithmetic is integer
(token counts < 2^52), so the floor-division window assignment is exact
and oracle-portable.

The reference has no training-data surface (it is an inventory sync —
src/routes/products.js); this is part of the engine's pipeline-extension
north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.operators.text import tokens


def pack_sequences(
    docs: DataFrame, ctx_len: int = 512, shard: str = "source"
) -> DataFrame:
    """Per-document packing coordinates in the shard's concatenated token
    stream: (doc_id, shard, n_toks, start_tok, chunk_first, chunk_last,
    n_chunks), where chunks are ``ctx_len``-token context windows and
    documents are concatenated in doc_id order within each shard.

    ``n_toks >= 1`` always (the tokenizer emits one token even for empty
    text), so ``chunk_last = (end_tok - 1) // ctx_len`` is well-defined.
    """
    toked = docs.select(
        "doc_id", shard, F.size(tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    return pack_from_counts(toked, ctx_len=ctx_len, shard=shard)


def pack_from_counts(
    toked: DataFrame, ctx_len: int = 512, shard: str = "source"
) -> DataFrame:
    """The packing core on a precomputed per-document count frame
    (doc_id, shard, n_toks) — so the budget UNIT is the caller's:
    whitespace tokens (``pack_sequences``), true BPE tokenizer tokens
    (``bpe_encode`` counts — what a training run actually packs by),
    bytes. Zero-token documents (possible with tokenizer counts,
    impossible with the whitespace tokenizer) occupy no stream space:
    chunk_first = chunk_last = -1, n_chunks = 0 — the documented
    sentinel, mirrored in the oracle.

    Same scale note as ``pack_sequences``: one per-shard cumulative
    window (shard count bounds parallelism; the stream coordinate is a
    per-shard running sum, never a global sort)."""
    w = (
        Window.partitionBy(shard)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_end = F.sum("n_toks").over(w)
    start = (run_end - F.col("n_toks")).cast("long")
    chunk_first = F.floor(start / ctx_len).cast("long")
    chunk_last = F.floor((run_end - 1) / ctx_len).cast("long")
    neg1 = F.lit(-1).cast("long")
    empty = F.col("n_toks") == 0
    return toked.select(
        "doc_id",
        shard,
        "n_toks",
        start.alias("start_tok"),
        F.when(empty, neg1).otherwise(chunk_first).alias("chunk_first"),
        F.when(empty, neg1).otherwise(chunk_last).alias("chunk_last"),
        F.when(empty, F.lit(0).cast("long"))
        .otherwise((chunk_last - chunk_first + 1).cast("long"))
        .alias("n_chunks"),
    )


def packing_efficiency(
    packed: DataFrame, ctx_len: int = 512, shard: str = "source"
) -> DataFrame:
    """Packing-layout audit over ``pack_sequences``/``pack_from_counts``
    output — the report a training run reads before committing to a
    context length and sharding: per shard, how full the context
    windows are and how many documents straddle window boundaries
    (boundary-crossing docs are the ones whose loss masks / attention
    resets the run must handle; the waste term is the final partial
    window of each shard's stream).

    Exact integer semantics per shard:
    - ``n_docs`` / ``n_packed_docs`` (n_toks > 0) / ``total_tokens``;
    - ``n_windows = max(chunk_last) + 1`` (== ceil(total/ctx_len) —
      the stream is contiguous by construction);
    - ``fill_permille = total_tokens · 1000 div (n_windows · ctx_len)``
      (< 1000 exactly when the last window is partial);
    - ``crossing_permille = |docs with n_chunks > 1| · 1000 div
      n_packed_docs`` — the boundary-straddle rate;
    - ``oversize_permille = |docs with n_toks > ctx_len| · 1000 div
      n_packed_docs`` — docs that cannot fit ANY single window.

    Scale shape: ONE map-side-combined aggregate on the shard key over
    the packed frame — |shards| output rows; no window, no join (the
    packed frame already carries every per-doc coordinate).

    Returns (shard, n_docs, n_packed_docs, total_tokens, n_windows,
    fill_permille, crossing_permille, oversize_permille).
    """
    agg = packed.groupBy(shard).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_toks") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_packed_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        (F.max("chunk_last") + 1).cast("long").alias("n_windows"),
        F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_crossing"),
        F.sum(F.when(F.col("n_toks") > ctx_len, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
    )
    from tepsonic_database_sync_spark.operators.text import _permille as pm

    z = F.lit(0).cast("long")
    return agg.select(
        shard,
        "n_docs",
        "n_packed_docs",
        "total_tokens",
        F.greatest(F.col("n_windows"), z).alias("n_windows"),
        pm(
            F.col("total_tokens"),
            F.greatest(F.col("n_windows"), z) * ctx_len,
        ).alias("fill_permille"),
        pm(F.col("n_crossing"), F.col("n_packed_docs")).alias(
            "crossing_permille"
        ),
        pm(F.col("n_oversize"), F.col("n_packed_docs")).alias(
            "oversize_permille"
        ),
    )

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

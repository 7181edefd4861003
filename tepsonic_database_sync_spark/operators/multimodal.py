"""Multimodal column plumbing — images/audio/video as opaque binary
columns with typed metadata (training-data-pipeline extension).

The convention: one row per asset with

    asset_id  long
    kind      string            ('image' | 'audio' | 'video')
    payload   binary            (opaque encoded bytes)
    meta      struct<width int, height int, n_frames int, format string>

Everything Spark-side is real — schema, partitioning, Arrow batch shape
through ``mapInPandas`` — while the *decode* step is a clearly-marked
deterministic fake (``_FAKE_DECODE``): the image/audio codecs aren't in
this container. Swapping in PIL/librosa/ffmpeg is a one-function change;
the distributed plumbing (what actually matters at 100 TB) is exercised
and tested as-is.

Scale notes: payloads dominate bytes — keep them in their own parquet
column (columnar pruning means metadata-only queries never read them),
partition by ``kind`` + hash(asset_id), and size batches via
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of decoded
frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8
# Modulus for the stubbed feature hash; the registry oracle derives its SQL
# from this same constant so the two can never silently desynchronize.
FEATURE_MOD = 997

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal asset table from ``documents``:
    payload = utf-8 text bytes, kind cycles image/audio/video, metadata
    from the text sizes. (Fixture generator — no randomness.)"""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        (F.col("n_chars") % 24).cast("int").alias("n_frames"),
        F.lit("synthetic").alias("format"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """STUB — deterministic stand-in for a real codec. Real deployments
    replace this with PIL.Image.open / librosa.load / av.open; raising
    NotImplementedError here would be the other contract-preserving
    choice, but a deterministic fake lets the batch plumbing be tested."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    return [
        float(sum(payload[i::FEATURE_DIM]) % FEATURE_MOD)
        for i in range(FEATURE_DIM)
    ]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the canonical multimodal decode shape: batches in,
    batches out, constant memory, no driver involvement."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": pdf["payload"].map(_fake_decode),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """STUB — deterministic stand-in for a real image resize (PIL
    ``Image.resize`` in deployment). Produces exactly w*h bytes by
    tiling/truncating the source so batch memory shapes are realistic."""
    if payload is None or w <= 0 or h <= 0:
        return b""
    need = w * h
    reps = -(-need // max(len(payload), 1))
    return (payload * reps)[:need]


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize plumbing via ``mapInPandas``: binary payload in,
    resized binary payload out, metadata struct rewritten to the target
    dims. The Arrow batch carries the bytes both ways — the shape that
    matters at scale: constant-memory batches, no driver hop, output
    partitioning inherited from input (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[pdf["kind"] == "image"].copy()
            out["payload"] = out["payload"].map(
                lambda p: _fake_resize(p, width, height)
            )
            out["meta"] = out["meta"].map(
                lambda m: {
                    "width": width,
                    "height": height,
                    "n_frames": (m or {}).get("n_frames"),
                    "format": (m or {}).get("format"),
                }
            )
            yield out

    return assets.filter(F.col("kind") == "image").mapInPandas(
        batches, ASSET_SCHEMA
    )


def frame_sample(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (the decode itself is the stub above). Pure expressions —
    the frame index fan-out never touches Python."""
    # guard: Spark's sequence DESCENDS when stop < start, so empty assets
    # need an explicit empty array, not sequence(0, -1)
    frames = F.when(
        F.col("meta.n_frames") > 0,
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1),
    ).otherwise(F.array().cast("array<int>"))
    sampled = F.filter(frames, lambda i: i % every_n == 0)
    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", F.explode(sampled).alias("frame_idx"))
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup — never reads payload bytes (column pruning):
    per kind: count, total payload bytes, max width."""
    return assets.groupBy("kind").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max("meta.width").cast("int").alias("max_width"),
    )


PHASH_BITS = 48
PHASH_BANDS = 4
PHASH_GRAM_BYTES = 4
PHASH_TAU = 6


def phash_signatures(
    assets: DataFrame, bits: int = PHASH_BITS, gram_bytes: int = PHASH_GRAM_BYTES
) -> DataFrame:
    """Perceptual-hash-style binary signature: a ``bits``-wide SimHash
    over the payload's distinct byte ``gram_bytes``-grams — the
    multimodal member of the dedup ladder (``operators/dedup.py``'s
    SimHash mechanic lifted from word tokens to raw bytes, the
    sdhash/TLSH family shape). A REAL pHash (DCT over decoded pixels)
    slots into the same signature column by swapping this function —
    the decode stays behind the module's stub boundary; byte-gram
    SimHash is itself an honest binary near-dup measure (high gram
    overlap ⇒ small hamming distance) and needs no codec.

    All hashing rides the hex STRING of the payload (``hex()`` is
    byte-exact and engine-portable, so ``h60`` md5s identical
    characters in Spark and DuckDB). Per asset: distinct grams explode,
    each gram's 60-bit hash votes ±1 on each bit position, all ``bits``
    votes collapse in ONE map-side-combined aggregation (conditional
    sums — no bit-dimension row explosion), packed to a single long.
    48 bits keeps every mask and the packed value far from the int64
    sign bit under ANSI mode.

    Assets with payloads shorter than ``gram_bytes`` have no grams and
    emit NO signature row (nothing to compare — documented, not a
    crash).

    Returns (asset_id, sig).
    """
    from tepsonic_database_sync_spark.functions.hashing import h60

    # the hex string is materialized AS A COLUMN before the gram
    # transform (r15 lambda-capture audit): hex(payload) captured
    # inside the lambda re-evaluates on every substring access —
    # O(bytes) per gram position, O(bytes²) per asset, catastrophic on
    # real image/audio payloads (a 1 MB asset would re-hex ~10⁶ times)
    from tepsonic_database_sync_spark.io import fan_out_cpu

    # fan_out_cpu (r18): the hex + per-position byte-gram hashing below
    # is CPU-bound per row (no-op on well-split inputs)
    pre = fan_out_cpu(assets).filter(
        F.octet_length(F.col("payload")) >= gram_bytes
    ).select(
        "asset_id",
        F.hex(F.col("payload")).alias("hx"),
        (F.octet_length(F.col("payload")) - gram_bytes + 1)
        .cast("int")
        .alias("n_grams"),
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("n_grams") - 1),
            lambda i: F.substring(F.col("hx"), i * 2 + 1, gram_bytes * 2),
        )
    )
    g = pre.select("asset_id", F.explode(grams).alias("g")).select(
        "asset_id", h60(F.col("g")).alias("h")
    )
    vote_cols = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    votes = g.groupBy("asset_id").agg(*vote_cols)
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("asset_id", packed.cast("long").alias("sig"))


def phash_neardup_pairs(
    assets: DataFrame,
    bits: int = PHASH_BITS,
    bands: int = PHASH_BANDS,
    tau: int = PHASH_TAU,
    max_band_fanout: int | None = None,
) -> DataFrame:
    """Banded hamming near-dup over ``phash_signatures``: split the
    signature into ``bands`` contiguous bit-slices, candidates = pairs
    agreeing on at least one slice (band-keyed equi-join — NEVER
    all-pairs), verify = exact ``bit_count(xor)`` ≤ tau. Pigeonhole
    guarantees full recall only for hamming < ``bands``; pairs with
    hamming in [bands, tau] surface only when their flipped bits
    cluster inside few bands — the standard banding recall trade
    (``dedup.py``'s bit-sliced hamming buckets make the same one).

    100 TB shape: signatures are 8 bytes/asset; the band join shuffles
    on (band, key) — low-entropy payloads (constant bytes) hot-spot a
    band key, and the mitigation is ``max_band_fanout``, the stop-key
    cap the winnowing operator uses (r12 — previously documented but
    unimplemented): a (band, key) bucket holding more than
    ``max_band_fanout`` assets is degenerate-content boilerplate whose
    self-join cost is quadratic in the bucket, so the whole bucket is
    dropped BEFORE the join (one extra map-side-combined count over the
    banded frame + a semi join — both keyed on the same (band, key) the
    join already shuffles on). Recall trade, explicit: a true near-dup
    pair whose every agreeing band is capped is lost — exactly
    winnowing's posting-cap semantics. Default ``None`` = no cap,
    byte-identical plan to the hash-verified r11 form (the registry
    entry's contract); deployments with adversarial/degenerate payload
    mixes opt in.

    Returns (a_id, b_id, hamming), a_id < b_id.
    """
    sig = phash_signatures(assets, bits=bits)
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "asset_id",
        "sig",
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    ).select(
        "asset_id",
        "sig",
        "band",
        F.expr(f"shiftright(sig, CAST(band * {width} AS INT)) & {mask}").alias(
            "key"
        ),
    )
    if max_band_fanout is not None:
        kept = (
            banded.groupBy("band", "key")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") <= max_band_fanout)
            .select("band", "key")
        )
        banded = banded.join(kept, ["band", "key"])
    a = banded.select(
        F.col("asset_id").alias("a_id"), F.col("sig").alias("a_sig"),
        "band", "key",
    )
    b = banded.select(
        F.col("asset_id").alias("b_id"), F.col("sig").alias("b_sig"),
        "band", "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    ham = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))).cast("long")
    return cand.select("a_id", "b_id", ham.alias("hamming")).filter(
        F.col("hamming") <= tau
    )

"""Model-scoring exemplar — the batch-inference path of a training-data
pipeline (quality/toxicity/importance models over documents), expressed as
the two Pandas stages every real deployment has:

1. ``score_documents`` — ``mapInPandas`` stateless inference: Arrow
   batches in, vectorized feature extraction + model forward pass in
   pandas/numpy, scores out. The "model" here is a deterministic integer
   linear scorer (milli-weights over text features) so the DuckDB oracle
   can replicate it bit-exactly; a real deployment swaps ``_forward`` for
   an ONNX/XGBoost/transformer call — the Spark-side plumbing (schema,
   batching, column pruning before the Python exchange) is what this
   module makes real and tested.
2. ``rank_normalize`` — ``groupBy(domain).applyInPandas`` grouped
   post-processing: per-domain integer permille rank of the score
   (cross-domain score calibration, the standard fix for per-source model
   drift). One shuffle on the domain key; SQL ``rank()`` tie semantics so
   the result is engine-exact.

Scale notes (100 TB): the scorer is embarrassingly parallel — no shuffle,
Arrow-batched, and the input projection is pruned to (doc_id, source,
lang, text) BEFORE the Python exchange so payload columns never cross the
JVM/Python boundary. The rank stage shuffles once on ``source``; at
billions of rows per domain, pass ``method="histogram"`` — the two-pass
histogram rank (aggregate per (domain, score), cumulate over the
histogram, join back) produces the SAME output contract with no
per-domain sort of raw rows and no Python stage: the only ordered
structure is the per-domain score histogram, whose size is the number of
DISTINCT scores, not the number of documents.

Feature regexes reuse operators/text.py's portable Java/RE2-identical
subset (reference: the engine's text-quality conventions, SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Integer milli-weights of the stub linear model. The registry oracle is
# GENERATED from these constants (registry._model_score_oracle), so model
# and oracle cannot silently desynchronize.
MODEL_BIAS_MILLI = 100
W_CHARS_MILLI = 3
W_PUNCT_MILLI = -20
W_DIGIT_RUNS_MILLI = -15
W_EN_MILLI = 500

# Explicit ASCII whitespace set: Python re's \s is Unicode-aware while
# DuckDB's RE2 \s is ASCII-only, so a NBSP would count as punctuation in
# one engine and not the other (ADVICE r5). Both engines read this exact
# class identically; the registry oracle interpolates these constants.
PUNCT_RE = r"[^A-Za-z0-9 \t\n\r\f\v]"
DIGIT_RUN_RE = r"[0-9]+"

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("score_milli", T.LongType(), False),
    ]
)

RANKED_SCHEMA = T.StructType(
    SCORE_SCHEMA.fields
    + [T.StructField("rank_permille", T.LongType(), False)]
)


def _forward(pdf: pd.DataFrame) -> pd.Series:
    """Vectorized model forward pass over one Arrow batch. STUB — a real
    model replaces this body (e.g. ``onnx_session.run`` on a tokenized
    batch); deterministic integer math keeps the oracle exact."""
    text = pdf["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(PUNCT_RE).astype("int64")
    n_digit_runs = text.str.count(DIGIT_RUN_RE).astype("int64")
    is_en = (pdf["lang"] == "en").astype("int64")
    return (
        MODEL_BIAS_MILLI
        + W_CHARS_MILLI * n_chars
        + W_PUNCT_MILLI * n_punct
        + W_DIGIT_RUNS_MILLI * n_digit_runs
        + W_EN_MILLI * is_en
    )


def score_documents(docs: DataFrame) -> DataFrame:
    """Arrow-batched stateless inference over documents. The projection
    is pruned BEFORE mapInPandas so only the columns the model needs
    cross into Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "score_milli": _forward(pdf).astype("int64"),
                }
            )

    return docs.select("doc_id", "source", "lang", "text").mapInPandas(
        run, SCORE_SCHEMA
    )


def rank_normalize(
    scored: DataFrame, domain_col: str = "source", method: str = "pandas"
) -> DataFrame:
    """Per-domain integer permille rank: (1000 * (rank-1)) // (n-1), SQL
    ``rank()`` tie semantics (ties share the min rank), 0 for singleton
    domains.

    ``method="pandas"``: grouped applyInPandas — one shuffle on the domain
    key, every domain's rows ranked in one Python worker. The exemplar for
    grouped post-model calibration, but a domain must fit one worker.

    ``method="histogram"``: the billions-per-domain path (SCALE.md).
    Two exact passes, pure Catalyst: (1) histogram = count per
    (domain, score); (2) running count over the per-domain histogram gives
    each score's min-rank; join back on (domain, score). Bit-identical to
    the pandas mode on non-null scores (min-rank is a function of the
    score histogram alone), with no per-domain sort of raw rows and no
    Python exchange — the only Window runs over distinct scores. NULL
    scores are retained and rank lowest (SQL NULLS FIRST); the pandas
    mode raises on them (pd.rank → NaN → int64 cast)."""
    if method == "histogram":
        return _rank_normalize_histogram(scored, domain_col)
    if method != "pandas":
        raise ValueError(f"unknown rank method: {method!r}")

    def per_domain(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        r = pdf["score_milli"].rank(method="min").astype("int64")
        pdf = pdf.copy()
        pdf["rank_permille"] = (
            (1000 * (r - 1)) // (n - 1) if n > 1 else 0
        )
        pdf["rank_permille"] = pdf["rank_permille"].astype("int64")
        return pdf

    return scored.groupBy(domain_col).applyInPandas(per_domain, RANKED_SCHEMA)


def _rank_normalize_histogram(scored: DataFrame, domain_col: str) -> DataFrame:
    """Exact histogram rank: rank(s) = 1 + count of rows with a smaller
    score, computed as a running sum over the (domain, score) histogram."""
    from pyspark.sql import Window

    hist = scored.groupBy(domain_col, "score_milli").agg(
        F.count("*").alias("c")
    )
    w_cum = (
        Window.partitionBy(domain_col)
        .orderBy("score_milli")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(domain_col)
    ranked = hist.select(
        domain_col,
        "score_milli",
        (F.sum("c").over(w_cum) - F.col("c") + F.lit(1)).alias("r"),
        F.sum("c").over(w_all).alias("n"),
    ).withColumn(
        "rank_permille",
        F.when(
            F.col("n") > 1,
            # integer div: ranks are non-negative so div == floor
            F.expr("CAST((1000 * (r - 1)) div (n - 1) AS LONG)"),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    # null-safe on BOTH join-back columns: groupBy keeps NULL as its own
    # group, but a plain equi-join-back would silently drop NULL-domain
    # rows (fixed r6) and NULL-score rows (ADVICE r6). NULL scores rank
    # below every non-null score (Spark window NULLS FIRST == SQL rank());
    # note the pandas mode cannot accept them at all — pd.rank yields NaN
    # and the int64 cast raises — so NULL-score support is histogram-only.
    s = scored.alias("s")
    r = ranked.alias("r")
    return s.join(
        r,
        s[domain_col].eqNullSafe(r[domain_col])
        & s["score_milli"].eqNullSafe(r["score_milli"]),
    ).select(
        s["doc_id"], s[domain_col], s["score_milli"], r["rank_permille"]
    )

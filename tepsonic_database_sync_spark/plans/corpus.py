"""End-to-end training-corpus preparation — the pipeline a 100 TB
pre-training run actually executes, as ONE lazy Spark plan.

The reference has no corpus surface (it syncs product rows,
src/routes/products.js); this plan composes the engine's extension
operators into the standard prepare sequence:

    row-local gate (quality + language + PII audit + fingerprint)
      → exact dedup (min doc_id per fingerprint)
      → decontamination screen (benchmark-gram broadcast probe)

Scale design, stage by stage:

- **Stage A is ONE projection, zero shuffle.** Quality score, language
  guess, PII audit counts and the dedup fingerprint are all row-local;
  they are computed as column expressions in a single pass over the scan
  (``enrich_corpus``, plan-asserted Exchange-free). The naive
  composition — joining quality_score(docs) ⋈ lang_id(docs) ⋈ … on
  doc_id — would shuffle the full corpus once per signal.
- **Stage B is the only corpus-wide shuffle**: exact dedup as min-struct
  per fingerprint (no window, no sort — a plain groupBy aggregate whose
  partial combine ships one candidate row per fingerprint per
  partition).
- **Stage C reuses the decontamination shape** (operators/dedup.py):
  benchmark grams are broadcast, the corpus side never shuffles on gram
  text, and the per-doc hit count shuffles on uniform doc_id only.

The deduped survivor set is eager-localCheckpointed once: it feeds both
the contamination probe and the final join, and re-running the
gate+dedup subtree twice would double the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.operators.text import (
    EMAIL_RE,
    URL_RE,
    lang_guess_expr,
    normalize_text,
    quality_expr,
)

PREP_MIN_QUALITY = 50
PREP_LANGS = ("en", "es", "de", "fr", "zh")


def enrich_corpus(docs: DataFrame) -> DataFrame:
    """Stage A: every row-local signal in one projection (no Exchange —
    asserted in tests/test_plan_quality.py). Keeps text and n_chars for
    the downstream shingle probe."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        "n_chars",
        t.alias("text"),
        quality_expr(t).alias("quality"),
        lang_guess_expr(t).alias("lang"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0))
        .cast("long")
        .alias("n_urls"),
        F.md5(normalize_text(t)).alias("fp_md5"),
    )


def prepare_corpus(
    docs: DataFrame,
    min_quality: int = PREP_MIN_QUALITY,
    langs: tuple[str, ...] = PREP_LANGS,
    bench_pct: int = 5,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The full prepare pipeline; returns the admitted training corpus as
    ``(doc_id, lang, quality, n_emails, n_urls, fp_md5)`` — gate-passing,
    first-seen-per-fingerprint, benchmark-clean, non-benchmark docs.

    Quality and language are computed on the ORIGINAL text (scrubbing
    replaces emails/URLs with placeholders and would perturb the token
    signals); the audit counts record what a scrub pass would redact.
    """
    from tepsonic_database_sync_spark.operators.dedup import contamination_flags

    gated = enrich_corpus(docs).filter(
        (F.col("quality") >= min_quality) & F.col("lang").isin(*langs)
    )
    # exact dedup without a window: min over a struct ordered by the
    # unique doc_id picks the deterministic representative row
    rep = (
        gated.groupBy("fp_md5")
        .agg(
            F.min(
                F.struct(
                    "doc_id", "n_chars", "lang", "quality",
                    "n_emails", "n_urls", "text",
                )
            ).alias("r")
        )
        .select("fp_md5", "r.*")
        .localCheckpoint(eager=True)
    )
    clean = contamination_flags(
        rep.select("doc_id", "n_chars", "text"),
        bench_pct=bench_pct,
        n=n,
        min_hits=min_hits,
    ).filter(~F.col("contaminated"))
    return rep.join(clean.select("doc_id"), "doc_id").select(
        "doc_id", "lang", "quality", "n_emails", "n_urls", "fp_md5"
    )

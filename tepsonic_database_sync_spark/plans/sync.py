"""The flagship sync pipeline — SURVEY.md §3 entry point 1.

Reference lifecycle (syncWholecellVendor, src/routes/products.js:227-354):
fetch vendor items → group by (name, grade) → match each group against the
admin catalog (exact-ci then substring regex, one awaited findOne per
group) → per valid group, aggregate (color, variant) options → merge with
stored state → bulk upsert → summary counters.

Here the whole thing is ONE DataFrame lineage: the N+1 per-group lookups
become two joins (operators.matching), the per-group Maps become grouped
aggregations (operators.options), and the only driver-side materialization
is the final summary collect — exactly the shape that scales to a
1000-executor cluster (shuffles only at the groupBys/joins on well-
distributed keys; the catalog side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.fixtures import FIXED_CONDITION_ID, build_fixtures
from tepsonic_database_sync_spark.operators.matching import (
    match_cascade,
    valid_skip_split,
    variant_admin,
)
from tepsonic_database_sync_spark.operators.options import (
    aggregate_options,
    option_source_rows,
    with_group_keys,
)


def sync_options(
    items: DataFrame,
    admin: DataFrame,
    flat_uids: bool = True,
    matched: DataFrame | None = None,
) -> DataFrame:
    """Full first-sync pipeline: flat vendor items in → aggregated option
    rows out (one row per product × grade × color × variant).

    ``matched``: optionally a precomputed (gname, product_id) match table
    (see ``cached_matched``) — the catalog match is tiny and slowly-changing,
    so callers that run several pipeline variants share one materialization.
    """
    keyed = with_group_keys(items)
    if matched is None:
        gnames = keyed.select("gname").distinct()
        matched = match_cascade(gnames, admin)
    vadmin = variant_admin(admin)
    src = option_source_rows(keyed, matched, vadmin)
    return aggregate_options(src, flat_uids=flat_uids)


# (applicationId, sf_dir) → persisted match table. The match cascade output
# is ~|distinct product names| rows (KBs even at 100 TB fact scale — it is
# bounded by the catalog, not the fact table), and every sync entry point
# needs it; one persist amortizes it across the whole query session.
#
# Staleness contract: the cache key is (session, sf_dir), NOT the catalog
# contents — a caller that mutates the catalog mid-session MUST call
# ``invalidate_match_cache`` (tested in tests/test_plans.py). Long-lived
# services should invalidate on their catalog-refresh tick.
_MATCH_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_matched(
    spark: SparkSession, sf_dir: str, items: DataFrame, admin: DataFrame
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MATCH_CACHE:
        gnames = with_group_keys(items).select("gname").distinct()
        _MATCH_CACHE[key] = match_cascade(gnames, admin).persist()
    return _MATCH_CACHE[key]


def invalidate_match_cache(spark: SparkSession | None = None) -> int:
    """Unpersist and drop cached match tables (all sessions, or just
    ``spark``'s). Returns the number of entries released. This is the
    explicit hook that keeps the memoization honest: nothing stays in the
    CacheManager after invalidation, and the next ``cached_matched`` call
    recomputes against the current catalog."""
    app_id = spark.sparkContext.applicationId if spark is not None else None
    released = 0
    for key in list(_MATCH_CACHE):
        if app_id is None or key[0] == app_id:
            try:
                _MATCH_CACHE[key].unpersist()
            except Exception:
                pass  # session already stopped — the cache entry is dead anyway
            del _MATCH_CACHE[key]
            released += 1
    return released


def vendor_products(
    items: DataFrame,
    admin: DataFrame,
    vendor_id: str = "vendor-1",
    matched: DataFrame | None = None,
) -> DataFrame:
    """Faithful output shape: one row per (vendorId, product, condition)
    with a ``selectedOptions`` array<struct> — the ``tep_vendor_products``
    document shape (products.js:291-298). The reference hard-codes one
    condition ObjectId for every row (products.js:230) which collapses
    different grades onto one key; the engine keeps ``grade`` as an
    explicit column beside the fixed id (documented deviation — the
    reference would otherwise stage duplicate-key inserts)."""
    opts = sync_options(items, admin, flat_uids=False, matched=matched)
    option_struct = F.struct(
        F.col("color"),
        F.col("variant"),
        F.col("stock"),
        F.col("price"),
        F.col("discount"),
        F.col("uids").alias("uniqueNumbers"),
    )
    return (
        opts.groupBy("product_id", "grade")
        .agg(F.sort_array(F.collect_list(option_struct)).alias("selectedOptions"))
        .select(
            F.lit(vendor_id).alias("vendorId"),
            F.col("product_id").alias("product"),
            F.lit(FIXED_CONDITION_ID).alias("condition"),
            F.col("grade"),
            F.col("selectedOptions"),
            F.lit("wholecell").alias("database"),
            F.current_timestamp().alias("updatedAt"),
            F.current_timestamp().alias("createdAt"),
        )
    )


def sync_summary(
    items: DataFrame,
    admin: DataFrame,
    state_keys: DataFrame | None = None,
    vendor_id: str = "vendor-1",
    matched: DataFrame | None = None,
) -> DataFrame:
    """A5 — the per-vendor run summary (products.js:343-353): one row of
    counters. ``state_keys``: optional (product_id, grade) rows of the
    pre-sync state table (drives new-vs-updated counts; None = first sync).

    Counter semantics, faithful to the reference:
    - totalFetched: ALL fetched items (including Sold).
    - validProducts: matched (name, grade) groups — including groups later
      skipped for zero stock (the reference counts them valid first,
      products.js:255-256, and skips at products.js:277-281).
    - skippedProducts: unmatched groups.
    - written groups = valid groups with ≥1 Available item; each stages
      exactly one bulk op (insert if absent from state, else update).
    - totalStockProcessed: sum of option stocks over written groups =
      number of Available items in them (products.js:329-332).
    """
    keyed = with_group_keys(items)
    # one pass over items → one row per (gname, grade_c) with both counts;
    # everything downstream is group-level (tiny) + one broadcast join
    groups = keyed.groupBy("gname", "grade_c").agg(
        F.count("*").alias("n_items"),
        F.count_if(F.col("status") == "Available").alias("n_avail"),
    )
    if matched is None:
        gnames = groups.select("gname").distinct()
        matched = match_cascade(gnames, admin)
    g = groups.join(F.broadcast(matched), "gname", "left").withColumn(
        "is_valid", F.col("product_id").isNotNull()
    )
    written = F.col("is_valid") & (F.col("n_avail") > 0)
    if state_keys is not None:
        st = F.broadcast(
            state_keys.select(
                F.col("product_id").alias("__sp"), F.col("grade").alias("__sg")
            ).distinct()
        )
        g = g.join(
            st, (g.product_id == st.__sp) & (g.grade_c == st.__sg), "left"
        ).withColumn("is_update", F.col("__sp").isNotNull())
    else:
        g = g.withColumn("is_update", F.lit(False))

    zero = F.lit(0).cast("long")

    def cnt(cond):
        return F.coalesce(F.sum(F.when(cond, 1)), zero).cast("long")

    return g.agg(
        F.coalesce(F.sum("n_items"), zero).cast("long").alias("totalFetched"),
        cnt(F.col("is_valid")).alias("validProducts"),
        cnt(~F.col("is_valid")).alias("skippedProducts"),
        cnt(written & ~F.col("is_update")).alias("newVendorProducts"),
        cnt(written & F.col("is_update")).alias("updatedVendorProducts"),
        F.coalesce(F.sum(F.when(written, F.col("n_avail"))), zero)
        .cast("long")
        .alias("totalStockProcessed"),
        cnt(written).alias("totalOperations"),
    ).select(
        F.lit(vendor_id).alias("vendorId"),
        F.lit("wholecell").alias("database"),
        "totalFetched",
        "validProducts",
        "skippedProducts",
        "newVendorProducts",
        "updatedVendorProducts",
        "totalStockProcessed",
        "totalOperations",
    )


def run_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry used by ``__spark_entry__.entry``: fixtures → faithful
    vendor-product rows (nested selectedOptions)."""
    fx = build_fixtures(spark, sf_dir)
    m = cached_matched(spark, sf_dir, fx["vendor_items"], fx["admin_products"])
    return vendor_products(fx["vendor_items"], fx["admin_products"], matched=m)

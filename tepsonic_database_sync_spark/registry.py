"""Driver-facing query catalog.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent DuckDB oracle SQL (None ⇒ rows-only check for ops SQL can't
express). ``__spark_entry__.py`` re-exports these as ``queries()`` /
``oracle_sql()``.

Naming ties back to SURVEY.md §2's operator inventory (P/F/J/A/S/X ids).
Column names are aliased identically on both sides — the driver sorts
columns by name and hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tepsonic_database_sync_spark import oracle
from tepsonic_database_sync_spark.fixtures import build_fixtures
from tepsonic_database_sync_spark.functions.normalize import (
    cents_to_dollars,
    resolve_variant,
    uid_coalesce,
)
from tepsonic_database_sync_spark.operators import matching, options
from tepsonic_database_sync_spark.plans import sync

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# Reference-core queries (SURVEY.md §2) — flagship first
# ---------------------------------------------------------------------------


def q_sync_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full first-sync spine (SURVEY §3 entry 1, steps 2-5)."""
    fx = build_fixtures(spark, sf_dir)
    return sync.sync_options(fx["vendor_items"], fx["admin_products"])


def q_sync_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-vendor run summary counters (products.js:343-353)."""
    fx = build_fixtures(spark, sf_dir)
    return sync.sync_summary(fx["vendor_items"], fx["admin_products"])


def q_sync_merge_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — merge of a re-run sync into existing state: stock doubles,
    uniqueNumbers concatenate (non-idempotent by reference design,
    products.js:194-223, 300-307)."""
    fx = build_fixtures(spark, sf_dir)
    opts = sync.sync_options(fx["vendor_items"], fx["admin_products"])
    return options.merge_options(opts, opts)


def q_p1_norm_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 — name normalization + grade default, as group keys with
    counts (also exercises A1 grouping)."""
    fx = build_fixtures(spark, sf_dir)
    keyed = options.with_group_keys(fx["vendor_items"])
    return keyed.groupBy("gname", "grade_c").agg(
        F.count("*").cast("long").alias("n_items")
    )


def q_p3_uid_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — falsy-skipping identifier coalesce chain (products.js:185-187)."""
    fx = build_fixtures(spark, sf_dir)
    vi = fx["vendor_items"]
    return vi.select(
        "id",
        uid_coalesce(F.col("esn"), F.col("hex_id"), F.col("sku"), F.col("id")).alias(
            "uid"
        ),
    )


def q_p4_cents_to_dollars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — Math.round(cents/100) with null guard (products.js:168-170)."""
    fx = build_fixtures(spark, sf_dir)
    return fx["vendor_items"].select(
        "id", cents_to_dollars(F.col("total_price_paid")).alias("dollars")
    )


def q_p6_resolve_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7 — storage-variant resolution incl. both fallbacks, for every
    item against the exact-name admin lookup (products.js:90-111,150-162)."""
    fx = build_fixtures(spark, sf_dir)
    keyed = options.with_group_keys(fx["vendor_items"])
    vadmin = matching.variant_admin(fx["admin_products"])
    j = keyed.join(F.broadcast(vadmin), keyed.gname == vadmin.name, "left")
    return j.select(
        "id", resolve_variant(F.col("capacity"), F.col("storage")).alias("variant")
    )


def q_f1_status_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — Available-status predicate, shown as a status histogram."""
    fx = build_fixtures(spark, sf_dir)
    return (
        fx["vendor_items"]
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_j1_match_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — case-insensitive exact name join, deterministic first pick."""
    fx = build_fixtures(spark, sf_dir)
    keyed = options.with_group_keys(fx["vendor_items"])
    gnames = keyed.select("gname").distinct()
    return matching.match_exact(gnames, fx["admin_products"])


def q_j2_match_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — substring-containment fallback join for J1 misses (len>3)."""
    fx = build_fixtures(spark, sf_dir)
    keyed = options.with_group_keys(fx["vendor_items"])
    gnames = keyed.select("gname").distinct()
    exact = matching.match_exact(gnames, fx["admin_products"])
    misses = gnames.join(exact.select("gname"), "gname", "left_anti")
    return matching.match_partial(misses, fx["admin_products"])


def q_j5_valid_skip_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — semi/anti split of groups into valid vs skipped, flagged."""
    fx = build_fixtures(spark, sf_dir)
    keyed = options.with_group_keys(fx["vendor_items"])
    groups = keyed.select("gname", "grade_c").distinct()
    gnames = groups.select("gname").distinct()
    matched = matching.match_cascade(gnames, fx["admin_products"])
    valid, skipped = matching.valid_skip_split(groups, matched)
    return valid.withColumn("is_valid", F.lit(True)).unionByName(
        skipped.withColumn("is_valid", F.lit(False))
    )


def q_s3_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — predicate-pushdown scan of the vendor control table
    (find({database:'wholecell'}), products.js:429-433)."""
    fx = build_fixtures(spark, sf_dir)
    return fx["wholesale_apis"].filter(F.col("database") == "wholecell")


def q_s9_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — backfill NULL database to 'wholecell' (products.js:369-380)."""
    fx = build_fixtures(spark, sf_dir)
    return fx["wholesale_apis"].withColumn(
        "database", F.coalesce(F.col("database"), F.lit("wholecell"))
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — composed from oracle.py CTEs
# ---------------------------------------------------------------------------

_O = {
    "sync_pipeline": oracle.prefix("options") + "\nSELECT * FROM options",
    "sync_summary": oracle.prefix("matched")
    + """,
valid_groups AS (
  SELECT g.* FROM groups g
  WHERE EXISTS (SELECT 1 FROM matched m WHERE m.gname = g.gname)
),
avail AS (
  SELECT trim(coalesce(manufacturer, '') || ' ' || coalesce(model, '')) AS gname,
         coalesce(nullif(grade, ''), 'Unknown') AS grade_c,
         count(*) AS n_avail
  FROM vendor_items WHERE status = 'Available'
  GROUP BY 1, 2
),
written AS (
  SELECT v.gname, v.grade_c, a.n_avail
  FROM valid_groups v JOIN avail a ON v.gname = a.gname AND v.grade_c = a.grade_c
)
SELECT
  'vendor-1' AS "vendorId",
  'wholecell' AS "database",
  (SELECT CAST(count(*) AS BIGINT) FROM vendor_items) AS "totalFetched",
  (SELECT CAST(count(*) AS BIGINT) FROM valid_groups) AS "validProducts",
  CAST((SELECT count(*) FROM groups) - (SELECT count(*) FROM valid_groups) AS BIGINT)
    AS "skippedProducts",
  (SELECT CAST(count(*) AS BIGINT) FROM written) AS "newVendorProducts",
  CAST(0 AS BIGINT) AS "updatedVendorProducts",
  (SELECT CAST(coalesce(sum(n_avail), 0) AS BIGINT) FROM written) AS "totalStockProcessed",
  (SELECT CAST(count(*) AS BIGINT) FROM written) AS "totalOperations"
""",
    "sync_merge_resync": oracle.prefix("options")
    + """
SELECT product_id, grade, color, variant,
       CAST(sum(stock) AS BIGINT) AS stock,
       CAST(min(price) AS BIGINT) AS price,
       CAST(min(price) AS BIGINT) AS discount,
       array_to_string(list_sort(flatten(list(str_split(uids, '|')))), '|') AS uids
FROM (SELECT * FROM options UNION ALL SELECT * FROM options)
GROUP BY product_id, grade, color, variant
""",
    "p1_norm_name": oracle.prefix("vendor_items")
    + """
SELECT trim(coalesce(manufacturer, '') || ' ' || coalesce(model, '')) AS gname,
       coalesce(nullif(grade, ''), 'Unknown') AS grade_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM vendor_items GROUP BY 1, 2
""",
    "p3_uid_coalesce": oracle.prefix("vendor_items")
    + """
SELECT id,
       coalesce(nullif(esn, ''), nullif(hex_id, ''), nullif(sku, ''),
                'item_' || CAST(id AS VARCHAR)) AS uid
FROM vendor_items
""",
    "p4_cents_to_dollars": oracle.prefix("vendor_items")
    + """
SELECT id,
       CAST(ROUND(coalesce(total_price_paid, 0) / 100.0, 0) AS BIGINT) AS dollars
FROM vendor_items
""",
    "p6_resolve_variant": oracle.prefix("variant_admin")
    + """
SELECT i.id,
  CASE WHEN i.capacity IS NULL OR i.capacity = '' THEN 'Unknown'
       WHEN a.storage IS NOT NULL AND a.storage <> '' THEN coalesce(
         list_filter(str_split(a.storage, ', '),
                     o -> contains(o, replace(i.capacity, ' ', '')))[1],
         list_filter(str_split(a.storage, ', '), o -> contains(o, i.capacity))[1],
         'Unknown')
       ELSE i.capacity || 'GB 4GB RAM' END AS variant
FROM (
  SELECT v.*, trim(coalesce(manufacturer, '') || ' ' || coalesce(model, '')) AS gname
  FROM vendor_items v
) i
LEFT JOIN variant_admin a ON a.name = i.gname
""",
    "f1_status_filter": oracle.prefix("vendor_items")
    + """
SELECT status, CAST(count(*) AS BIGINT) AS n FROM vendor_items GROUP BY status
""",
    "j1_match_exact": oracle.prefix("match_exact") + "\nSELECT * FROM match_exact",
    "j2_match_partial": oracle.prefix("match_partial")
    + "\nSELECT * FROM match_partial",
    "j5_valid_skip_split": oracle.prefix("matched")
    + """
SELECT g.gname, g.grade_c,
       EXISTS (SELECT 1 FROM matched m WHERE m.gname = g.gname) AS is_valid
FROM groups g
""",
    "s3_filtered_scan": oracle.prefix("wholesale_apis")
    + """
SELECT * FROM wholesale_apis WHERE "database" = 'wholecell'
""",
    "s9_backfill": oracle.prefix("wholesale_apis")
    + """
SELECT _id, "vendorId", "appId", "appSecret",
       coalesce("database", 'wholecell') AS "database"
FROM wholesale_apis
""",
}

# name → (spark callable, oracle sql | None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    "sync_pipeline": (q_sync_pipeline, _O["sync_pipeline"]),
    "sync_summary": (q_sync_summary, _O["sync_summary"]),
    "sync_merge_resync": (q_sync_merge_resync, _O["sync_merge_resync"]),
    "p1_norm_name": (q_p1_norm_name, _O["p1_norm_name"]),
    "p3_uid_coalesce": (q_p3_uid_coalesce, _O["p3_uid_coalesce"]),
    "p4_cents_to_dollars": (q_p4_cents_to_dollars, _O["p4_cents_to_dollars"]),
    "p6_resolve_variant": (q_p6_resolve_variant, _O["p6_resolve_variant"]),
    "f1_status_filter": (q_f1_status_filter, _O["f1_status_filter"]),
    "j1_match_exact": (q_j1_match_exact, _O["j1_match_exact"]),
    "j2_match_partial": (q_j2_match_partial, _O["j2_match_partial"]),
    "j5_valid_skip_split": (q_j5_valid_skip_split, _O["j5_valid_skip_split"]),
    "s3_filtered_scan": (q_s3_filtered_scan, _O["s3_filtered_scan"]),
    "s9_backfill": (q_s9_backfill, _O["s9_backfill"]),
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

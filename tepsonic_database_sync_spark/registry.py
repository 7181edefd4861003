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


def q_s8_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/J4 — bulk upsert as full-outer-join with op audit column: state
    from even-id items, new batch from odd-id items (products.js:309-341)."""
    fx = build_fixtures(spark, sf_dir)
    vi, ap = fx["vendor_items"], fx["admin_products"]
    state = sync.sync_options(vi.filter(F.col("id") % 2 == 0), ap)
    new = sync.sync_options(vi.filter(F.col("id") % 2 == 1), ap)
    from tepsonic_database_sync_spark.operators.upsert import upsert_flagged

    return upsert_flagged(state, new, ["product_id", "grade", "color", "variant"])


def q_x1_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/F4 — per-vendor dispatch after backfill: non-wholecell vendors
    become error rows (products.js:383-395)."""
    from tepsonic_database_sync_spark.operators.upsert import dispatch_vendors

    fx = build_fixtures(spark, sf_dir)
    backfilled = fx["wholesale_apis"].withColumn(
        "database", F.coalesce(F.col("database"), F.lit("wholecell"))
    )
    return dispatch_vendors(backfilled)


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit (free-in-Spark basics, SURVEY §2.6): global top-100
    orders by total price, deterministic tiebreak on key."""
    from tepsonic_database_sync_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_window_topk_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer (row_number ≤ 3)."""
    from pyspark.sql import Window
    from tepsonic_database_sync_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: UNION DISTINCT of two label domains."""
    from tepsonic_database_sync_spark.io import load_table

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("v")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("v")
    )
    return c.union(o).distinct()


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT — customers who never placed an order."""
    from tepsonic_database_sync_spark.io import load_table

    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.subtract(o)


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-field escape hatch (SURVEY §1.4): parse the JSON props
    column on demand — the engine's version of Mongo's schemaless fields."""
    from tepsonic_database_sync_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window agg (batch form of the streaming operator)."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.windows import tumbling_counts

    return tumbling_counts(load_table(spark, sf_dir, "events"))


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window agg (1h window / 30m slide)."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.windows import sliding_counts

    return sliding_counts(load_table(spark, sf_dir, "events"))


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user (gaps-and-islands)."""
    from tepsonic_database_sync_spark.io import load_table
    from tepsonic_database_sync_spark.streaming.windows import sessionize

    return sessionize(load_table(spark, sf_dir, "events"))


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
    "s8_upsert": f"""
WITH state_options AS (
  {oracle.prefix("options", items_where="id % 2 = 0")}
  SELECT * FROM options
),
new_options AS (
  {oracle.prefix("options", items_where="id % 2 = 1")}
  SELECT * FROM options
)
SELECT
  coalesce(n.product_id, s.product_id) AS product_id,
  coalesce(n.grade, s.grade) AS grade,
  coalesce(n.color, s.color) AS color,
  coalesce(n.variant, s.variant) AS variant,
  CASE WHEN s.product_id IS NOT NULL AND n.product_id IS NOT NULL THEN 'update'
       WHEN n.product_id IS NOT NULL THEN 'insert' ELSE 'keep' END AS op,
  CAST(coalesce(s.stock, 0) + coalesce(n.stock, 0) AS BIGINT) AS stock,
  CAST(CASE WHEN s.price IS NULL THEN n.price
            WHEN n.price IS NULL THEN s.price
            ELSE least(s.price, n.price) END AS BIGINT) AS price,
  array_to_string(list_sort(str_split(concat_ws('|', s.uids, n.uids), '|')), '|') AS uids
FROM state_options s
FULL OUTER JOIN new_options n
  ON s.product_id = n.product_id AND s.grade = n.grade
 AND s.color = n.color AND s.variant = n.variant
""",
    "x1_dispatch": oracle.prefix("wholesale_apis")
    + """,
b AS (SELECT "vendorId", coalesce("database", 'wholecell') AS "database"
      FROM wholesale_apis)
SELECT "vendorId", "database",
       CASE WHEN "database" = 'wholecell' THEN NULL
            ELSE 'No sync function available for this database type' END AS error
FROM b
""",
    "topk_orders": """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
    "window_topk_per_cust": """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    "set_union": """
SELECT c_mktsegment AS v FROM customer
UNION
SELECT o_orderpriority AS v FROM orders
""",
    "set_except": """
SELECT c_custkey AS k FROM customer
EXCEPT
SELECT o_custkey AS k FROM orders
""",
    "events_json": """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
    "stream_tumbling": """
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
""",
    "stream_sliding": """
SELECT ws, event_type, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800 - k.k) * 1800 AS ws, event_type
  FROM events, (VALUES (0), (1)) k(k)
) GROUP BY ws, event_type
""",
    "stream_sessions": """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
f AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
n AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM f
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(min(es) AS BIGINT) AS session_start,
       CAST(max(es) AS BIGINT) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(es) - min(es) AS BIGINT) AS duration_secs
FROM n GROUP BY user_id, session_seq
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
    "s8_upsert": (q_s8_upsert, _O["s8_upsert"]),
    "x1_dispatch": (q_x1_dispatch, _O["x1_dispatch"]),
    "topk_orders": (q_topk_orders, _O["topk_orders"]),
    "window_topk_per_cust": (q_window_topk_per_cust, _O["window_topk_per_cust"]),
    "set_union": (q_set_union, _O["set_union"]),
    "set_except": (q_set_except, _O["set_except"]),
    "events_json": (q_events_json, _O["events_json"]),
    "stream_tumbling": (q_stream_tumbling, _O["stream_tumbling"]),
    "stream_sliding": (q_stream_sliding, _O["stream_sliding"]),
    "stream_sessions": (q_stream_sessions, _O["stream_sessions"]),
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

"""DuckDB oracle SQL building blocks.

Each constant mirrors, line for line, a Spark-side builder:

- ``FIX_VENDOR_ITEMS``  ↔ ``fixtures.vendor_items``
- ``FIX_ADMIN_PRODUCTS``↔ ``fixtures.admin_products``
- ``FIX_WHOLESALE_APIS``↔ ``fixtures.wholesale_apis``
- ``CTE_*``             ↔ the operators in ``operators/`` / ``plans/sync.py``

The driver runs these under DuckDB against the same parquet tables the
Spark queries read, and hash-compares results — so every expression here
must be *bit-identical* to the Spark semantics. Rules used throughout:

- money math in integer cents (BIGINT), never summed doubles;
- ``ROUND(x, 0)`` before any double→BIGINT cast (DuckDB casts round,
  Spark ANSI casts truncate — integral values sidestep the difference);
- aggregates explicitly CAST (DuckDB ``sum(int)`` yields HUGEINT);
- list outputs canonicalized to sorted ``'|'``-joined strings.

Tests in ``tests/test_oracle_parity.py`` enforce the parity for every
registered query before the driver ever sees it.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Fixture CTE bodies (mirror fixtures.py; FIXTURES.md §B)
# ---------------------------------------------------------------------------

FIX_VENDOR_ITEMS = """
SELECT
  CAST(l.l_orderkey * 10 + l.l_linenumber AS BIGINT) AS id,
  CASE WHEN l.l_returnflag = 'R' THEN 'Sold' ELSE 'Available' END AS status,
  CASE WHEN l.l_linenumber % 3 = 0 THEN NULL
       WHEN l.l_linenumber % 5 = 0 THEN ''
       ELSE 'ESN-' || CAST(l.l_orderkey * 10 + l.l_linenumber AS VARCHAR) END AS esn,
  CASE WHEN l.l_linenumber % 2 = 0 THEN NULL
       ELSE 'HEX-' || CAST(l.l_orderkey * 10 + l.l_linenumber AS VARCHAR) END AS hex_id,
  CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS total_price_paid,
  CASE WHEN l.l_linenumber = 7 THEN NULL
       ELSE 'SKU-' || CAST(l.l_partkey AS VARCHAR) END AS sku,
  CASE WHEN l.l_linenumber = 7 THEN NULL
       WHEN l.l_quantity < 2 THEN NULL ELSE l.l_linestatus END AS grade,
  CASE WHEN l.l_linenumber = 7 THEN NULL ELSE p.p_brand END AS manufacturer,
  CASE WHEN l.l_linenumber = 7 THEN NULL ELSE p.p_name END AS model,
  CASE WHEN l.l_linenumber = 7 THEN NULL
       WHEN l.l_partkey % 13 = 0 THEN NULL ELSE p.p_type END AS color,
  CASE WHEN l.l_linenumber = 7 THEN NULL
       WHEN l.l_partkey % 17 = 0 THEN ''
       WHEN l.l_linenumber = 4 THEN CAST(p.p_size AS VARCHAR) || ' GB'
       ELSE CAST(p.p_size AS VARCHAR) END AS capacity
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""

FIX_ADMIN_PRODUCTS = """
SELECT
  'admin-' || CAST(p_partkey AS VARCHAR) AS _id,
  CASE WHEN p_partkey % 11 = 0 THEN cased || ' (2024)' ELSE cased END AS name,
  CAST(p_size AS VARCHAR) || 'GB 4GB RAM, '
    || CAST(p_size * 2 AS VARCHAR) || 'GB 8GB RAM' AS storage
FROM (
  SELECT p_partkey, p_size,
         CASE WHEN p_partkey % 7 = 0 THEN upper(p_brand || ' ' || p_name)
              ELSE p_brand || ' ' || p_name END AS cased
  FROM part WHERE p_partkey % 5 <> 0
)
"""

FIX_WHOLESALE_APIS = """
SELECT * FROM (VALUES
  ('api-1', 'vendor-1', 'app-1', 'secret-1', 'wholecell'),
  ('api-2', 'vendor-2', 'app-2', 'secret-2', NULL),
  ('api-3', 'vendor-3', 'app-3', 'secret-3', 'other')
) AS t(_id, "vendorId", "appId", "appSecret", "database")
"""

# ---------------------------------------------------------------------------
# Pipeline CTE bodies (mirror operators/matching.py, operators/options.py,
# plans/sync.py). Composed by prefix() below.
# ---------------------------------------------------------------------------

# A1 group key: `${manufacturer||''} ${model||''}`.trim() + grade||'Unknown'
# (reference src/routes/products.js:58-79). Grouping sees ALL items — the
# Available filter applies only inside option building (products.js:136).
CTE_GROUPS = """
SELECT DISTINCT
  trim(coalesce(manufacturer, '') || ' ' || coalesce(model, '')) AS gname,
  coalesce(nullif(grade, ''), 'Unknown') AS grade_c
FROM vendor_items
"""

CTE_GNAMES = """
SELECT DISTINCT gname FROM groups
"""

# J1 exact case-insensitive match; findOne's arbitrary pick made
# deterministic via (name, _id) ordering (SURVEY.md §7 deltas).
CTE_MATCH_EXACT = """
SELECT gname, product_id FROM (
  SELECT g.gname, a._id AS product_id,
         row_number() OVER (PARTITION BY g.gname ORDER BY a.name, a._id) AS rn
  FROM gnames g JOIN admin_products a ON lower(g.gname) = lower(a.name)
) WHERE rn = 1
"""

# J2 substring fallback for misses with length > 3 (products.js:38-48).
CTE_MATCH_PARTIAL = """
SELECT gname, product_id FROM (
  SELECT g.gname, a._id AS product_id,
         row_number() OVER (PARTITION BY g.gname ORDER BY a.name, a._id) AS rn
  FROM gnames g JOIN admin_products a
    ON length(g.gname) > 3 AND contains(lower(a.name), lower(g.gname))
  WHERE NOT EXISTS (SELECT 1 FROM match_exact m WHERE m.gname = g.gname)
) WHERE rn = 1
"""

CTE_MATCHED = """
SELECT * FROM match_exact UNION ALL SELECT * FROM match_partial
"""

# Variant-resolution lookup is a *separate, exact, case-sensitive* probe
# ($in prefetch keyed by the raw group name, products.js:113-132,148) —
# NOT the fuzzy cascade. Duplicate admin names resolve "last wins" in the
# reference's Map; deterministically: max _id.
CTE_VARIANT_ADMIN = """
SELECT name, storage FROM (
  SELECT name, storage, row_number() OVER (PARTITION BY name ORDER BY _id DESC) AS rn
  FROM admin_products
) WHERE rn = 1
"""

# A2 option-source rows: Available items of matched groups, with resolved
# variant (P6/P7), filled color (P2), dollars (P4), uid (P3).
CTE_OPTS_SRC = """
SELECT
  m.product_id, i.grade_c, i.color_c, i.gname,
  CASE WHEN i.capacity IS NULL OR i.capacity = '' THEN 'Unknown'
       WHEN a.storage IS NOT NULL AND a.storage <> '' THEN coalesce(
         list_filter(str_split(a.storage, ', '),
                     o -> contains(o, replace(i.capacity, ' ', '')))[1],
         list_filter(str_split(a.storage, ', '), o -> contains(o, i.capacity))[1],
         'Unknown')
       ELSE i.capacity || 'GB 4GB RAM' END AS variant,
  CAST(ROUND(coalesce(i.total_price_paid, 0) / 100.0, 0) AS BIGINT) AS dollars,
  coalesce(nullif(i.esn, ''), nullif(i.hex_id, ''), nullif(i.sku, ''),
           'item_' || CAST(i.id AS VARCHAR)) AS uid
FROM (
  SELECT v.*,
         trim(coalesce(manufacturer, '') || ' ' || coalesce(model, '')) AS gname,
         coalesce(nullif(grade, ''), 'Unknown') AS grade_c,
         coalesce(nullif(color, ''), 'Unknown') AS color_c
  FROM vendor_items v WHERE status = 'Available'
) i
JOIN matched m ON i.gname = m.gname
LEFT JOIN variant_admin a ON a.name = i.gname
"""

# A2 aggregation to options (stock/price/discount/uniqueNumbers). price is
# min (deterministic stand-in for the reference's first-seen, SURVEY A2).
CTE_OPTIONS = """
SELECT product_id, grade_c AS grade, color_c AS color, variant,
       CAST(count(*) AS BIGINT) AS stock,
       CAST(min(dollars) AS BIGINT) AS price,
       CAST(min(dollars) AS BIGINT) AS discount,
       string_agg(uid, '|' ORDER BY uid) AS uids
FROM opts_src
GROUP BY product_id, grade_c, color_c, variant
"""

_CTE_ORDER = [
    ("vendor_items", FIX_VENDOR_ITEMS),
    ("admin_products", FIX_ADMIN_PRODUCTS),
    ("wholesale_apis", FIX_WHOLESALE_APIS),
    ("groups", CTE_GROUPS),
    ("gnames", CTE_GNAMES),
    ("match_exact", CTE_MATCH_EXACT),
    ("match_partial", CTE_MATCH_PARTIAL),
    ("matched", CTE_MATCHED),
    ("variant_admin", CTE_VARIANT_ADMIN),
    ("opts_src", CTE_OPTS_SRC),
    ("options", CTE_OPTIONS),
]


def prefix(*names: str, items_where: str | None = None) -> str:
    """Build a ``WITH`` clause containing the named CTEs plus everything
    they transitively need (order in ``_CTE_ORDER`` is already topological).

    ``items_where`` optionally restricts the vendor_items fixture (used by
    queries that pipeline a filtered item subset, e.g. the upsert demo).
    """
    want = set(names)
    # transitive closure by position: include every CTE up to the last wanted
    idx = max(i for i, (n, _) in enumerate(_CTE_ORDER) if n in want)
    parts = []
    for n, sql in _CTE_ORDER[: idx + 1]:
        if n == "vendor_items" and items_where:
            sql = f"SELECT * FROM ({sql}) WHERE {items_where}"
        parts.append(f"{n} AS ({sql})")
    return "WITH " + ",\n".join(parts)

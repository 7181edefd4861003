"""Reference-shaped fixture tables, derived deterministically from the
driver's TPC-H-ish tables (FIXTURES.md §B).

The reference processes four collections (SURVEY.md §1.2): vendor items
(REST payload), ``tep_admin_products`` (catalog), ``tep_vendor_products``
(output/state), ``tep_admin_wholesale_apis`` (control). These builders
derive the two *input* tables from ``lineitem ⋈ part`` / ``part`` using
only projections and joins — the same rows come out of the DuckDB oracle's
mirrored CTEs (``oracle.py``), with no randomness.

Edge-case rows (FIXTURES.md §C) are pinned via modular-arithmetic branches:
empty-string esn (falsy-coalesce, C1), ``"N GB"`` spaced capacity (C2),
NULL color / empty capacity, NULL ``product_variation`` rows
(``l_linenumber = 7``), case-only name differences (C: ``% 7`` upper) and
strict-substring admin names (``% 11`` suffix) for the match cascade, and
missing admin rows (``% 5``) for the semi/anti split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed "condition" ObjectId the reference hard-codes for every vendor
# product row (reference: src/routes/products.js:230).
FIXED_CONDITION_ID = "682f3e63402c8b0c279cba1e"


def vendor_items(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Flat vendor-item rows (FIXTURES.md §B1).

    The reference's nested ``product_variation.product.*`` struct is
    flattened here (manufacturer/model/color/capacity/grade/sku at top
    level) so every derived column stays oracle-comparable; the nested
    faithful shape is ``nest_vendor_items``.
    """
    li = lineitem.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_quantity",
        "l_returnflag", "l_linestatus",
    )
    p = part.select("p_partkey", "p_brand", "p_name", "p_type", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)

    item_id = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    # l_linenumber = 7 rows model a NULL product_variation (`?.` guards,
    # reference src/routes/products.js:61,117,138)
    novar = F.col("l_linenumber") == 7

    def var_field(c):
        return F.when(novar, F.lit(None).cast("string")).otherwise(c)

    return j.select(
        item_id.alias("id"),
        F.when(F.col("l_returnflag") == "R", F.lit("Sold"))
        .otherwise(F.lit("Available"))
        .alias("status"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None).cast("string"))
        .when(F.col("l_linenumber") % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("ESN-"), item_id.cast("string")))
        .alias("esn"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("HEX-"), item_id.cast("string")))
        .alias("hex_id"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("total_price_paid"),
        var_field(F.concat(F.lit("SKU-"), F.col("l_partkey").cast("string"))).alias("sku"),
        var_field(
            F.when(F.col("l_quantity") < 2, F.lit(None).cast("string")).otherwise(
                F.col("l_linestatus")
            )
        ).alias("grade"),
        var_field(F.col("p_brand")).alias("manufacturer"),
        var_field(F.col("p_name")).alias("model"),
        var_field(
            F.when(F.col("p_partkey") % 13 == 0, F.lit(None).cast("string")).otherwise(
                F.col("p_type")
            )
        ).alias("color"),
        var_field(
            F.when(F.col("p_partkey") % 17 == 0, F.lit(""))
            .when(
                F.col("l_linenumber") == 4,
                F.concat(F.col("p_size").cast("string"), F.lit(" GB")),
            )
            .otherwise(F.col("p_size").cast("string"))
        ).alias("capacity"),
    )


def nest_vendor_items(flat: DataFrame) -> DataFrame:
    """Faithful nested shape: ``product_variation.product.*`` struct rows
    (reference payload shape, src/routes/products.js:61-66,138-142)."""
    product = F.struct(
        F.col("manufacturer"), F.col("model"), F.col("color"), F.col("capacity")
    )
    variation = F.struct(product.alias("product"), F.col("grade"), F.col("sku"))
    return flat.select(
        "id",
        "status",
        "esn",
        "hex_id",
        "total_price_paid",
        F.when(
            F.col("manufacturer").isNull()
            & F.col("model").isNull()
            & F.col("grade").isNull()
            & F.col("sku").isNull(),
            F.lit(None),
        )
        .otherwise(variation)
        .alias("product_variation"),
    )


def admin_products(part: DataFrame) -> DataFrame:
    """Catalog rows (FIXTURES.md §B2): ``_id``, ``name``, flat ``storage``.

    ~80% of parts get a catalog row (``% 5 != 0`` — the missing 20%
    exercises the skip/anti path, reference src/routes/products.js:258);
    ``% 7`` rows are upper-cased (case-insensitive exact match,
    products.js:30); ``% 11`` rows get a ``" (2024)"`` suffix so the vendor
    name is a strict substring (partial-match fallback, products.js:38-48).
    """
    base = F.concat(F.col("p_brand"), F.lit(" "), F.col("p_name"))
    cased = F.when(F.col("p_partkey") % 7 == 0, F.upper(base)).otherwise(base)
    named = F.when(F.col("p_partkey") % 11 == 0, F.concat(cased, F.lit(" (2024)"))).otherwise(
        cased
    )
    return (
        part.filter(F.col("p_partkey") % 5 != 0)
        .select(
            F.concat(F.lit("admin-"), F.col("p_partkey").cast("string")).alias("_id"),
            named.alias("name"),
            F.concat(
                F.col("p_size").cast("string"),
                F.lit("GB 4GB RAM, "),
                (F.col("p_size") * 2).cast("string"),
                F.lit("GB 8GB RAM"),
            ).alias("storage"),
        )
    )


def wholesale_apis(spark: SparkSession) -> DataFrame:
    """Vendor control table (FIXTURES.md §B4): row 2 has a NULL ``database``
    (exercises the backfill, reference src/routes/products.js:370-380); row 3
    is a non-wholecell vendor (error summary row, products.js:388-393)."""
    rows = [
        ("api-1", "vendor-1", "app-1", "secret-1", "wholecell"),
        ("api-2", "vendor-2", "app-2", "secret-2", None),
        ("api-3", "vendor-3", "app-3", "secret-3", "other"),
    ]
    return spark.createDataFrame(
        rows, "_id string, vendorId string, appId string, appSecret string, database string"
    )


# One fixture set per (session, sf_dir): every registry query starts from the
# same two input tables, so they are persisted once and shared — the same way
# a real deployment caches its hot dimension/state tables instead of
# re-deriving them per query. Keyed by applicationId so a fresh session never
# sees another session's (possibly stopped) cached plans.
_FIXTURE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def build_fixtures(
    spark: SparkSession, sf_dir: str, cache: bool = True
) -> dict[str, DataFrame]:
    from tepsonic_database_sync_spark.io import load_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if cache and key in _FIXTURE_CACHE:
        return _FIXTURE_CACHE[key]

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vi = vendor_items(li, p)
    fx = {
        "vendor_items": vi,
        "vendor_items_nested": nest_vendor_items(vi),
        "admin_products": admin_products(p),
        "wholesale_apis": wholesale_apis(spark),
    }
    if cache:
        fx["vendor_items"] = fx["vendor_items"].persist()
        fx["admin_products"] = fx["admin_products"].persist()
        _FIXTURE_CACHE[key] = fx
    return fx


def invalidate_fixture_cache(spark: SparkSession | None = None) -> int:
    """Unpersist and drop cached fixture tables (all sessions, or just
    ``spark``'s). Counterpart of ``plans.sync.invalidate_match_cache`` —
    together they release every session-scoped persisted handle the
    registry relies on."""
    app_id = spark.sparkContext.applicationId if spark is not None else None
    released = 0
    for key in list(_FIXTURE_CACHE):
        if app_id is None or key[0] == app_id:
            fx = _FIXTURE_CACHE[key]
            for name in ("vendor_items", "admin_products"):
                try:
                    fx[name].unpersist()
                except Exception:
                    pass  # session already stopped
            del _FIXTURE_CACHE[key]
            released += 1
    return released

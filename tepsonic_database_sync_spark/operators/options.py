"""Option aggregation & merge — SURVEY.md §2.5 (A1-A4).

The reference builds, per product group, a map of (color, variant) →
{stock, price, discount, uniqueNumbers} (createSelectedOptionsForWholecell,
src/routes/products.js:83-191), then on re-sync merges with the stored
options (mergeSelectedOptions, products.js:194-223). Both are plain
grouped aggregations in Spark — the per-group loops and Maps exist in the
reference only because JS lacks a relational pipeline.

Scale note: one ``groupBy`` = one shuffle on the grouping key. Partial
aggregation (map-side combine) is automatic for count/min/sum; for
``collect_list`` Spark still combines per-partition lists, so the shuffle
moves pre-grouped arrays, not raw rows.

Documented deviations (SURVEY.md §7): option price is ``min`` (the
reference keeps the first-seen price, which is input-order-dependent and
non-deterministic under parallelism); ``uniqueNumbers`` keeps duplicates
faithfully (``collect_list``; despite the name, the reference never
dedupes — products.js:185-187, 209-212) and is canonicalized to a sorted
array so results are order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.functions.normalize import (
    cents_to_dollars,
    fill_unknown,
    norm_name,
    resolve_variant,
    uid_coalesce,
)


def with_group_keys(items: DataFrame) -> Column:
    """A1 — annotate items with the reference's group keys
    (groupItemsByProductAndCondition, products.js:58-79): the raw
    (case-sensitive) normalized name and the grade with 'Unknown' default.
    Grouping sees ALL items; the Available filter comes later."""
    return items.withColumn(
        "gname", norm_name(F.col("manufacturer"), F.col("model"))
    ).withColumn("grade_c", fill_unknown(F.col("grade")))


def group_sizes(items_keyed: DataFrame) -> DataFrame:
    """A1 materialized as counts per (gname, grade_c)."""
    return items_keyed.groupBy("gname", "grade_c").agg(
        F.count("*").alias("n_items")
    )


def option_source_rows(
    items_keyed: DataFrame,
    matched: DataFrame,
    vadmin: DataFrame,
    extra_cols: tuple = (),
) -> DataFrame:
    """Per-item option attributes for Available items of matched groups:
    resolved variant (P6/P7), filled color (P2), dollars (P4), uid (P3).
    ``vadmin`` is the exact-name variant lookup (operators.matching.variant_admin).

    ``extra_cols``: additional Column expressions to carry through — lets
    callers enrich ONCE and split afterward (e.g. the upsert demo's
    state/new halves) instead of running the join pipeline per split."""
    avail = items_keyed.filter(F.col("status") == "Available")
    enriched = (
        avail.join(matched, "gname")
        .join(F.broadcast(vadmin), avail.gname == vadmin.name, "left")
        .drop("name")
    )
    return enriched.select(
        "product_id",
        "grade_c",
        fill_unknown(F.col("color")).alias("color_c"),
        "gname",
        resolve_variant(F.col("capacity"), F.col("storage")).alias("variant"),
        cents_to_dollars(F.col("total_price_paid")).alias("dollars"),
        uid_coalesce(
            F.col("esn"), F.col("hex_id"), F.col("sku"), F.col("id")
        ).alias("uid"),
        *extra_cols,
    )


def aggregate_options(
    opts_src: DataFrame, flat_uids: bool = True, extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """A2 — (product, grade, color, variant) → stock/price/discount/uids
    (products.js:164-190). ``flat_uids=True`` canonicalizes uniqueNumbers
    to a sorted '|'-joined string for oracle comparison; ``False`` keeps
    the faithful array shape.

    ``extra_keys``: additional grouping columns carried through the output
    — lets callers aggregate several logical batches (e.g. the upsert
    demo's state/new halves) in ONE grouped pass / one shuffle, then split
    the already-aggregated (tiny) result, instead of running a separate
    shuffle per batch."""
    uids = F.array_sort(F.collect_list("uid"))
    agg = opts_src.groupBy(
        "product_id", "grade_c", "color_c", "variant", *extra_keys
    ).agg(
        F.count("*").cast("long").alias("stock"),
        F.min("dollars").cast("long").alias("price"),
        (F.array_join(uids, "|") if flat_uids else uids).alias("uids"),
    )
    return agg.select(
        F.col("product_id"),
        F.col("grade_c").alias("grade"),
        F.col("color_c").alias("color"),
        "variant",
        *extra_keys,
        "stock",
        "price",
        F.col("price").alias("discount"),
        "uids",
    )


def merge_options(existing: DataFrame, new: DataFrame) -> DataFrame:
    """A3 — mergeSelectedOptions (products.js:194-223): union on
    (product, grade, color, variant); stock sums, uniqueNumbers concatenate
    (duplicates preserved), price takes the min, discount follows price.
    Options present on only one side pass through unchanged — exactly the
    Map-union semantics. Deliberately NOT idempotent (re-running a sync
    double-counts, products.js:208 — by reference design).

    Expects the flat shape from ``aggregate_options(flat_uids=True)``.
    """
    both = existing.unionByName(new)
    return (
        both.groupBy("product_id", "grade", "color", "variant")
        .agg(
            F.sum("stock").cast("long").alias("stock"),
            F.min("price").cast("long").alias("price"),
            F.array_join(
                F.array_sort(F.flatten(F.collect_list(F.split(F.col("uids"), "\\|")))),
                "|",
            ).alias("uids"),
        )
        .select(
            "product_id",
            "grade",
            "color",
            "variant",
            "stock",
            "price",
            F.col("price").alias("discount"),
            "uids",
        )
    )


def merge_options_idempotent(existing: DataFrame, new: DataFrame) -> DataFrame:
    """The engine's opt-in IDEMPOTENT merge mode (SURVEY.md §7): dedupe on
    uniqueNumbers so re-syncing the same payload is a no-op — stock is the
    count of distinct unit ids, price still min. ``merge(x, x) == merge(x,
    empty)`` by construction (the faithful mode deliberately double-counts;
    reference products.js:208)."""
    both = existing.unionByName(new)
    uids_set = F.array_sort(
        F.array_distinct(F.flatten(F.collect_list(F.split(F.col("uids"), "\\|"))))
    )
    return (
        both.groupBy("product_id", "grade", "color", "variant")
        .agg(
            F.min("price").cast("long").alias("price"),
            uids_set.alias("__uids"),
        )
        .select(
            "product_id",
            "grade",
            "color",
            "variant",
            F.size("__uids").cast("long").alias("stock"),
            "price",
            F.col("price").alias("discount"),
            F.array_join(F.col("__uids"), "|").alias("uids"),
        )
    )


def stock_totals(options: DataFrame) -> DataFrame:
    """A4 — total stock per product row (products.js:329-332)."""
    return options.groupBy("product_id", "grade").agg(
        F.sum("stock").cast("long").alias("total_stock"),
        F.count("*").cast("long").alias("n_options"),
    )

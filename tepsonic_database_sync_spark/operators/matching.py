"""Name-match joins — SURVEY.md §2.4 (J1-J5).

The heart of the reference: fuzzy name lookup of vendor product groups
against the admin catalog. The reference runs one unindexable
case-insensitive regex ``findOne`` per group, sequentially awaited
(src/routes/products.js:246-260) — a per-group collection scan. Here the
whole cascade collapses into two set-oriented joins:

- J1: equi-join on ``lower(name)`` — Catalyst broadcasts the catalog side
  automatically (it is the small dimension), reproducing the reference's
  hand-rolled ``$in``-prefetch-plus-hash-map (products.js:113-132) at any
  scale.
- J2: substring-containment theta-join for J1 misses — executes as a
  BroadcastNestedLoopJoin while the catalog broadcasts. For a
  both-sides-large catalog (100 TB design point) swap in the MinHash-LSH
  blocked variant from ``operators.dedup`` as a pre-filter; the semantics
  here stay the contract.

``findOne`` returns an *arbitrary* first match; a parallel engine cannot
reproduce "arbitrary" deterministically, so the engine defines the match
as the minimum ``(name, _id)`` — documented deviation (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pick_first(
    df: DataFrame,
    part_col: str,
    order: list[str],
    descending: bool = False,
) -> DataFrame:
    """Deterministic first row per ``part_col`` group under ``order``
    (all-ascending, or all-descending with ``descending=True``) — r17:
    a map-side-combined ``min/max(struct(order…, rest…))`` arg-extremum
    instead of a row_number window. Identical output at every call
    site: the order keys always include the unique product id, so the
    extremum is total and the payload tiebreak fields are never
    reached; candidate fan-out collapses on the map side instead of
    shuffling and sorting every candidate row."""
    others = [c for c in df.columns if c != part_col and c not in order]
    agg = df.groupBy(part_col).agg(
        (F.max if descending else F.min)(
            F.struct(
                *[F.col(c) for c in order], *[F.col(c) for c in others]
            )
        ).alias("__k")
    )
    return agg.select(
        *[
            F.col(c) if c == part_col else F.col(f"__k.{c}").alias(c)
            for c in df.columns
        ]
    )


def match_exact(gnames: DataFrame, admin: DataFrame) -> DataFrame:
    """J1 — case-insensitive exact name match (products.js:29-31).

    ``gnames``: one column ``gname``. Returns (gname, product_id).
    """
    g, a = gnames.alias("g"), F.broadcast(admin).alias("a")
    j = g.join(a, F.lower(F.col("g.gname")) == F.lower(F.col("a.name")), "inner").select(
        F.col("g.gname").alias("gname"),
        F.col("a._id").alias("product_id"),
        F.col("a.name").alias("__aname"),
    )
    return _pick_first(j, "gname", ["__aname", "product_id"]).drop("__aname")


def match_partial(
    misses: DataFrame, admin: DataFrame, blocked: bool = True
) -> DataFrame:
    """J2 — substring containment fallback, guarded by ``len > 3``
    (products.js:38-48). Returns (gname, product_id).

    ``blocked=True`` (default) runs the q-gram-blocked equi-join plan —
    see ``match_partial_blocked``; exact same output, hash-joinable.
    ``blocked=False`` keeps the direct theta-join (BroadcastNestedLoopJoin),
    the simplest faithful plan, fine while the catalog broadcasts AND the
    distinct-miss side is small.
    """
    if blocked:
        return match_partial_blocked(misses, admin)
    g = misses.filter(F.length("gname") > 3).alias("g")
    a = F.broadcast(admin).alias("a")
    j = g.join(
        a, F.contains(F.lower(F.col("a.name")), F.lower(F.col("g.gname"))), "inner"
    ).select(
        F.col("g.gname").alias("gname"),
        F.col("a._id").alias("product_id"),
        F.col("a.name").alias("__aname"),
    )
    return _pick_first(j, "gname", ["__aname", "product_id"]).drop("__aname")


_BLOCK_Q = 4  # sound: the len>3 guard guarantees every candidate has a 4-gram


def match_partial_blocked(misses: DataFrame, admin: DataFrame) -> DataFrame:
    """J2 as an exact q-gram-blocked EQUI-join — the 100 TB plan.

    A substring-containment predicate is not hash-joinable, so the direct
    plan is a nested-loop scan: O(|misses| × |catalog|) ``contains`` calls,
    quadratic blow-up when both sides grow. Blocking restores a shuffle/
    broadcast hash join with zero false negatives:

      contains(lower(a.name), lower(g.gname))  ⇒  the first ``q`` chars of
      ``g.gname`` appear verbatim somewhere in ``a.name``  ⇒  equality on
      that q-gram blocks the pair.

    Catalog side: explode each name into its distinct lowercase q-grams
    (|name| rows each, bounded — names are short); miss side: one prefix
    q-gram per name (the len>3 guard makes it total). Equi-join on the gram,
    then verify the true ``contains`` predicate and keep the deterministic
    first match. Candidate fan-out is |gram collisions|, not |catalog|.
    """
    g = (
        misses.filter(F.length("gname") > 3)
        .select(
            F.col("gname"),
            F.lower(F.col("gname")).alias("__lg"),
            F.substring(F.lower(F.col("gname")), 1, _BLOCK_Q).alias("__gram"),
        )
        .alias("g")
    )
    # __la is materialized AS A COLUMN before the gram transform (r15
    # lambda-capture audit): lower(name) captured inside the transform
    # lambda re-evaluates per gram position — O(len²) chars per name
    # (bounded here by short product names, but the same defect class
    # as the r14 text-family gram builder; see grams_expr's contract)
    pre = admin.select(
        F.col("_id").alias("product_id"),
        F.col("name").alias("__aname"),
        F.lower(F.col("name")).alias("__la"),
    )
    grams = pre.select(
        "product_id",
        "__aname",
        "__la",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.length("__la") - _BLOCK_Q + 1, F.lit(1)),
                    ),
                    lambda i: F.col("__la").substr(i, F.lit(_BLOCK_Q)),
                )
            )
        ).alias("__gram"),
    ).alias("a")
    j = (
        g.join(grams, "__gram")
        .filter(F.contains(F.col("a.__la"), F.col("g.__lg")))
        .select("gname", "product_id", "__aname")
    )
    return _pick_first(j, "gname", ["__aname", "product_id"]).drop("__aname")


def match_cascade(gnames: DataFrame, admin: DataFrame) -> DataFrame:
    """J1 → anti → J2 → union: the full findExistingProduct cascade
    (products.js:23-51). Returns (gname, product_id) for matched names."""
    exact = match_exact(gnames, admin)
    misses = gnames.join(exact.select("gname"), "gname", "left_anti")
    partial = match_partial(misses, admin)
    return exact.unionByName(partial)


def valid_skip_split(
    groups: DataFrame, matched: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """J5 — semi/anti split of (gname, grade) groups into valid vs skipped
    (products.js:246-260; the anti count feeds ``skippedProducts``)."""
    valid = groups.join(matched.select("gname"), "gname", "left_semi")
    skipped = groups.join(matched.select("gname"), "gname", "left_anti")
    return valid, skipped


def variant_admin(admin: DataFrame) -> DataFrame:
    """The $in-prefetch lookup table for variant resolution: exact
    case-sensitive name → storage, duplicate names resolved "last wins"
    (Map overwrite, products.js:129-132) → deterministic max ``_id``
    (r17: as a map-side-combined ``max(struct(_id, storage))`` argmax —
    same pick as the previous ``_id DESC`` row_number window, ``_id``
    is unique so the tiebreak field is never reached)."""
    agg = admin.select("name", "storage", "_id").groupBy("name").agg(
        F.max(F.struct(F.col("_id"), F.col("storage").alias("s"))).alias(
            "__k"
        )
    )
    return agg.select("name", F.col("__k.s").alias("storage"))


def delete_variants(s: Column) -> Column:
    """The SymSpell depth-1 deletion neighborhood of ``s``: the string
    itself plus every delete-one-character variant (distinct). Guarded
    for the empty string (Spark's sequence(1, 0) is DESCENDING, not
    empty — the lm_score trap).

    ``s`` MUST be a column reference, never an expression — it is read
    per deletion position inside the transform lambda, and a captured
    expression re-evaluates per position (the O(len²) lambda-capture
    class; this parameter is on the guard test's column-contract
    allowlist, tests/test_lambda_capture_guard.py)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.lit(2147483647)),
        ),
    )
    return F.when(
        F.length(s) >= 1, F.array_distinct(F.array_append(dels, s))
    ).otherwise(F.array(s))


def match_fuzzy(
    probes: DataFrame,
    catalog: DataFrame,
    probe_id: str,
    probe_col: str,
    cat_id: str,
    cat_col: str,
) -> DataFrame:
    """Edit-distance-1 name matching via SymSpell deletion-neighborhood
    blocking — the typo-tolerant tier of the match cascade (the
    reference stops at exact + substring, products.js:29-48; one-char
    vendor typos fall through both).

    Soundness: two strings with levenshtein ≤ 1 always share a key in
    their depth-1 deletion neighborhoods (equality → the string itself;
    substitution at i → both delete position i; insert/delete → the
    shorter string is in the longer one's delete set), so an EQUI-join
    on the variant key has zero false negatives and the explicit
    ``levenshtein ≤ 1`` verify removes the false positives.

    Scale shape: each side fans out ×(len+1) variants (names are short,
    so bounded), candidates arrive by hash join on the variant key —
    never an all-pairs product — and pairs are DISTINCT'd before the
    single levenshtein verification per pair. Returns
    (probe_id, probe_col, cat_id, matched, dist).
    """
    p = probes.select(
        F.col(probe_id).alias("__pid"),
        F.col(probe_col).alias("__probe"),
        F.explode(delete_variants(F.col(probe_col))).alias("__key"),
    )
    c = catalog.select(
        F.col(cat_id).alias("__cid"),
        F.col(cat_col).alias("__cand"),
        F.explode(delete_variants(F.col(cat_col))).alias("__key"),
    )
    pairs = p.join(c, "__key").select("__pid", "__probe", "__cid", "__cand").distinct()
    return pairs.filter(
        F.levenshtein("__probe", "__cand") <= 1
    ).select(
        F.col("__pid").alias(probe_id),
        F.col("__probe").alias(probe_col),
        F.col("__cid").alias(cat_id),
        F.col("__cand").alias("matched"),
        F.levenshtein("__probe", "__cand").cast("long").alias("dist"),
    )

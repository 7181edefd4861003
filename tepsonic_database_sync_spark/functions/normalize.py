"""Scalar expression helpers — SURVEY.md §2.2 (P1-P8).

Every helper is a pure Column expression built from ``pyspark.sql.functions``
builtins: JVM-side, whole-stage-codegen'd, zero Python UDFs. That is the
point — the reference's host-language helpers (template strings, ``||``
coalescing, ``Math.round``) all map to Catalyst expressions, so at 100 TB
none of this logic crosses the Python serialization wall.

Documented semantic decisions (SURVEY.md §7 "semantics deltas"):

- JS ``||`` skips falsy values (``""``, ``0``); SQL ``coalesce`` only skips
  NULL. Where the reference coalesces strings we wrap with ``nullif(x, '')``
  to reproduce the falsy-skip exactly (``falsy_coalesce``).
- JS ``Math.round`` is half-toward-+infinity; Spark ``round`` is HALF_UP
  (away from zero). They agree for all non-negative inputs — prices are
  non-negative — so ``round`` is used (NOT ``bround``/HALF_EVEN, which
  would diverge on exact halves).
- JS ``String.replace(" ", "")`` replaces only the FIRST space; we replace
  all spaces. Identical for capacities with at most one space (the only
  shapes the reference handles: ``"128"`` / ``"128 GB"``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_name(manufacturer: Column | str, model: Column | str) -> Column:
    """P1 — ``\\`${manufacturer || ""} ${model || ""}\\`.trim()``.

    Reference: src/routes/products.js:24-26 (and 63-65, 117-118, 145-147 —
    the same normalization occurs four times).
    """
    m = F.coalesce(F.col(manufacturer) if isinstance(manufacturer, str) else manufacturer, F.lit(""))
    mo = F.coalesce(F.col(model) if isinstance(model, str) else model, F.lit(""))
    return F.trim(F.concat(m, F.lit(" "), mo))


def fill_unknown(col: Column | str, default: str = "Unknown") -> Column:
    """P2 — ``x || "Unknown"`` (falsy-aware: empty string also falls back).

    Reference: src/routes/products.js:66 (grade), 141 (color).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(c, F.lit("")), F.lit(default))


def falsy_coalesce(*cols: Column) -> Column:
    """JS ``a || b || c`` for string operands: skips NULL *and* ``""``."""
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])


def uid_coalesce(esn: Column, hex_id: Column, sku: Column, item_id: Column) -> Column:
    """P3 — ``esn || hex_id || sku || `item_${id}```.

    Reference: src/routes/products.js:185-187. The last arm never misses, so
    the result is non-null.
    """
    return F.coalesce(
        falsy_coalesce(esn, hex_id, sku),
        F.concat(F.lit("item_"), item_id.cast("string")),
    )


def cents_to_dollars(cents: Column) -> Column:
    """P4 — ``Math.round((Number(x) || 0) / 100)`` → LongType dollars.

    Reference: src/routes/products.js:168-170. ``Number(x) || 0`` maps to
    ``coalesce(x, 0)`` (0 is falsy in JS but ``0 || 0 == 0`` — identical).
    ``round`` (HALF_UP) matches ``Math.round`` for non-negative cents; the
    division result at exact ``.5`` boundaries is IEEE-exact (``x.5`` is
    representable), so the rounding branch is deterministic and engine-
    portable.
    """
    return F.round(F.coalesce(cents, F.lit(0)).cast("double") / 100.0, 0).cast("long")


def resolve_variant(capacity: Column, storage: Column) -> Column:
    """P6 + P7 — resolve a capacity like ``"128"``/``"128 GB"`` against an
    admin storage spec like ``"128GB 4GB RAM, 256GB 8GB RAM"``.

    Faithful to reference src/routes/products.js:90-111 (findMatchingStorageSpec)
    and 150-162 (caller fallbacks):

    1. no capacity (NULL/``""``)              → ``"Unknown"``
    2. capacity but no storage spec           → ``"{capacity}GB 4GB RAM"``
    3. split spec on ``", "``; first option containing the space-stripped
       capacity; else first option containing the raw capacity; else
       ``"Unknown"``.

    Pure array expressions (``split``/``filter``/``get``) — no UDF. ``F.get``
    returns NULL out-of-bounds (ANSI-safe, unlike ``element_at``).
    """
    stripped = F.replace(capacity, F.lit(" "), F.lit(""))
    opts = F.split(storage, ", ")
    first_stripped = F.get(F.filter(opts, lambda o: F.contains(o, stripped)), 0)
    first_raw = F.get(F.filter(opts, lambda o: F.contains(o, capacity)), 0)
    spec_match = F.coalesce(first_stripped, first_raw, F.lit("Unknown"))
    no_capacity = capacity.isNull() | (capacity == "")
    no_storage = storage.isNull() | (storage == "")
    return (
        F.when(no_capacity, F.lit("Unknown"))
        .when(no_storage, F.concat(capacity, F.lit("GB 4GB RAM")))
        .otherwise(spec_match)
    )

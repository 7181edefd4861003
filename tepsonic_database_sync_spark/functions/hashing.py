"""Portable hashing primitives.

``h60`` — a 60-bit integer hash from the first 15 hex chars of md5 —
is the engine's cross-engine workhorse: Spark (``conv``) and DuckDB
(``CAST('0x…' AS BIGINT)``) produce identical values, so MinHash /
SimHash / fingerprint operators stay oracle-checkable. 60 bits keeps
every product/sum far from BIGINT overflow under ANSI mode.

In the hot path at scale this is still all JVM-side codegen (md5 +
string ops) — no Python. For pure-Spark (non-oracle) uses ``F.xxhash64``
is cheaper; operators take a ``hash_fn`` override where it matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_salted(col: Column, salt: int) -> Column:
    """Salted variant — the engine's "k independent hash functions" for
    MinHash: re-hash with a salt prefix instead of linear permutations
    (a*h+b mod p), which would overflow 64-bit integer math."""
    return h60(F.concat(F.lit(f"{salt}#"), col))


H60_DUCKDB = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60_sql(expr: str) -> str:
    """The DuckDB-side twin of ``h60`` for oracle composition."""
    return H60_DUCKDB.format(expr=expr)


# --- k-wise universal hash family over a 31-bit base hash ------------------
#
# MinHash needs k independent hash functions per shingle. Hashing k times
# with md5 costs k full digests per shingle (the dominant cost at scale);
# instead: ONE md5 → reduce to 31 bits → k affine maps (a·h + b) mod P.
# All intermediates stay < 2^62, exact under ANSI mode and identical in
# DuckDB. Coefficients are md5-derived so both engines can reproduce them.

MERSENNE31 = 2147483647  # 2^31 - 1 (prime)


def _md5_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def affine_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k affine maps (a ∈ [1, P-1])."""
    return [
        (_md5_int(f"A{i}") % (MERSENNE31 - 1) + 1, _md5_int(f"B{i}") % MERSENNE31)
        for i in range(k)
    ]


def h31(col: Column) -> Column:
    """31-bit base hash: h60 reduced mod 2^31-1."""
    return h60(col) % MERSENNE31

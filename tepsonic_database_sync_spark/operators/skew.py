"""Skew mitigation — salting (SURVEY.md §7 / 100 TB design point).

AQE's skew-join splitting handles most runtime skew; salting is the
library-level tool for *aggregation* skew (one hot group key melting an
executor) and for joins AQE can't split (e.g., a hot broadcast-miss key).

``salted_two_phase_agg``: groupBy(key, salt) partial → groupBy(key)
final. The hot key's rows spread across ``n_salts`` tasks in phase 1;
phase 2 combines ``n_salts`` pre-aggregated rows per key — O(keys·salts)
instead of O(rows) through the final shuffle. Results are identical to a
direct groupBy for any commutative-associative aggregate set (asserted
in tests against the unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def row_salt(n_salts: int) -> Column:
    """Per-ROW salt in ``[0, n_salts)``: ``pmod(monotonically_increasing_id,
    n_salts)``.

    ``monotonically_increasing_id`` is (partition_id << 33) + row offset,
    so consecutive rows of ANY key — including byte-identical duplicate
    rows, which a content hash necessarily collapses onto one salt —
    round-robin across all salts (ADVICE r6: the content-hash salt could
    not spread the one skew shape salting exists for). The expression is
    nondeterministic under recomputation, which is safe here twice over:
    Spark marks the stage INDETERMINATE and rolls back whole stages on
    fetch failure rather than mixing old and new shuffle output
    (SPARK-25341), and every salt assignment yields the same join/agg
    result — the salt never reaches the output."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def _reject_salt_collision(*dfs: DataFrame) -> None:
    """A pre-existing ``__salt`` column would be silently overwritten by
    ``withColumn`` (ADVICE r6) — make the contract explicit instead."""
    for df in dfs:
        if _SALT in df.columns:
            raise ValueError(
                f"input already has a {_SALT!r} column; rename it before "
                "salting (the operator would silently overwrite it)"
            )


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    sum_cols: tuple[str, ...] = (),
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-tolerant aggregation: counts + sums per ``key``.

    The salt is ``row_salt`` — a per-row round-robin that spreads even
    byte-identical duplicate rows of a hot key (see its docstring for
    why nondeterminism is safe: count/sum are commutative-associative,
    so the result is identical for every salt assignment).
    """
    _reject_salt_collision(df)
    phase1 = (
        df.withColumn(_SALT, row_salt(n_salts))
        .groupBy(key, "__salt")
        .agg(
            F.count("*").alias("__c"),
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("__c").cast("long").alias(count_alias),
        *[F.sum(f"__s_{c}").cast("long").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: spread a hot key across ``n_salts`` tasks.

    The LARGE side tags each row with ``row_salt`` — a per-row
    round-robin that varies WITHIN a key, never a function of the key
    alone (a key-derived salt would send every row of the hot key to the
    same task, spreading nothing; the earlier ``salted_join_keys`` helper
    had exactly that bug and was replaced by this operator) and not a
    content hash either (byte-identical duplicate rows would all land on
    one salt — ADVICE r6). The SMALL side replicates
    each row to all ``n_salts`` values; joining on ``(key, salt)`` then
    yields exactly the plain join's rows (asserted in tests, broadcast
    disabled, against the unsalted plan).

    Cost model: n_salts× replication of the small side's shuffle volume
    buys a 1/n_salts cap on any single key's share of a task — the right
    trade when one key melts an executor and AQE's skew split can't
    reach the join (e.g. a non-shuffle-join stage boundary). ``how``
    supports large-side-preserving joins only (inner/left/semi/anti):
    a RIGHT or FULL join would preserve every unmatched (key, salt)
    REPLICA of the small side — up to n_salts null-extended duplicates
    per dim row — so those are rejected."""
    allowed = {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins, not {how!r}: "
            "right/full joins would emit one row per unmatched small-side "
            "salt replica"
        )
    _reject_salt_collision(large, small)
    lg = large.withColumn(_SALT, row_salt(n_salts))
    sm = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lg.join(sm, [key, _SALT], how).drop(_SALT)


def skew_profile(df: DataFrame, key: str, top_k: int = 20) -> DataFrame:
    """Key-distribution diagnostic — run BEFORE a big join/agg to decide
    whether it needs salting/AQE skew handling at all: the top-k hottest
    key values with their share of rows and their heat relative to a
    perfectly uniform distribution.

    Returns ``(key_value string, cnt, total_rows, n_keys,
    share_permille, skew_permille)`` for the ``top_k`` most frequent
    keys (ties broken by key value for determinism);
    ``skew_permille = 1000·cnt·n_keys / total`` — 1000 means exactly
    uniform, 50000 means this key is 50× hotter than uniform (the
    threshold where a 1000-executor shuffle starts melting one task).

    Plan shape: one map-side-combined groupBy on the key; the global
    (total, n_keys) pair is a single-row aggregate of THOSE counts,
    broadcast back; top-k compiles to TakeOrderedAndProject (no global
    sort). NULL keys profile like any other value (rendered as the
    string 'NULL') — a null-heavy join column is the most common skew
    bug in the wild.
    """
    counts = df.groupBy(F.col(key)).agg(F.count("*").cast("long").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    key_str = F.coalesce(F.col(key).cast("string"), F.lit("NULL"))
    return (
        counts.select(key_str.alias("key_value"), "cnt")
        .crossJoin(F.broadcast(stats))  # single-row stats fan-in
        .select(
            "key_value",
            "cnt",
            "total_rows",
            "n_keys",
            F.floor(F.lit(1000) * F.col("cnt") / F.col("total_rows"))
            .cast("long")
            .alias("share_permille"),
            F.floor(
                F.lit(1000) * F.col("cnt") * F.col("n_keys") / F.col("total_rows")
            )
            .cast("long")
            .alias("skew_permille"),
        )
        .orderBy(F.col("cnt").desc(), "key_value")
        .limit(top_k)
    )

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    sum_cols: tuple[str, ...] = (),
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-tolerant aggregation: counts + sums per ``key``.

    The salt is a deterministic spread (hash of a uniform row attribute
    mod n_salts via ``spark_partition_id``-free math so results stay
    engine-independent): here ``monotonically_increasing_id`` is avoided
    too — we salt on ``pmod(hash(all grouping-independent cols)…)`` being
    overkill, a simple modulo of an existing uniform column suffices and
    keeps the plan pure-columnar. Callers pass data where ``__salt_src``
    exists or rely on the default row-hash salt.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
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

    The LARGE side tags each row with a salt that varies WITHIN a key —
    a hash of the whole row, never of the key alone (a key-derived salt
    would send every row of the hot key to the same task, spreading
    nothing; the earlier ``salted_join_keys`` helper had exactly that
    bug and was replaced by this operator). The SMALL side replicates
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
    lg = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts))
    )
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lg.join(sm, [key, "__salt"], how).drop("__salt")

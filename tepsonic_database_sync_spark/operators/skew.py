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


def salted_join_keys(key_col: Column, n_salts: int) -> tuple[Column, Column]:
    """Building blocks for a salted join: the skewed (large) side tags each
    row with one random-ish salt; the small side explodes to all salts.
    Returns (large_side_salt, small_side_salts_array)."""
    large = F.pmod(F.xxhash64(key_col), F.lit(n_salts))
    small = F.sequence(F.lit(0), F.lit(n_salts - 1))
    return large, small

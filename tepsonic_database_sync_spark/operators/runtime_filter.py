"""Explicit runtime-filter semi-join reduction.

The reference joins its fetched vendor feed against the (much larger)
admin catalog one lookup at a time (products.js:285's
`Admin.findOne({...})` per item); the relational form is a join whose
probe side is mostly misses when the driving set is selective.  At
100 TB the killer cost is shuffling the ENTIRE fact side just to drop
most of it inside the join.  ``bloom_semi_reduce`` moves that drop in
front of the shuffle: build a Bloom filter over the (filtered) dim
side's join keys, pre-filter the fact side map-side, then run the real
join over the survivors.

Bloom filters never produce false negatives, so the reduced fact is a
superset of the true semi-join and the post-reduction join result is
EXACTLY the plain join result — which is what the oracle hash checks.
False positives only cost shuffle bytes, bounded by the filter geometry
(same ``BLOOM_BITS_PER_GRAM``/``BLOOM_K`` math as
``dedup.contamination_flags_bloom``, ~2e-4 at the defaults).

Scale shape
-----------
- The bitset is built by a distributed ``bit_or`` over the dim keys —
  never a driver-side structure; at 32 bits/key a 100M-key dim is a
  ~400 MB exact broadcast but a ~50 MB bitset, and the word table the
  probes actually touch broadcasts in KB-to-MB.
- The fact side probes via k=4 broadcast joins on the word index — pure
  map-side work, NO fact shuffle until after the reduction.
- Spark's own AQE runtime bloom filter
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers the
  single-stage case automatically; this operator is the explicit form —
  reusable across stages/queries, oracle-checkable, and independent of
  optimizer heuristics (which bail out on size estimates Spark cannot
  see through, e.g. after a Python-backed stage).

The one driver-side action is the dim-key count that sizes m (bounded
metadata over the already-small dim side, same pattern as the bloom
decontamination sizing count, dedup.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tepsonic_database_sync_spark.operators.dedup import (
    BLOOM_K,
    _bloom_pos,
    _with_bloom_hashes,
    bloom_bitset,
)

BLOOM_BITS_PER_KEY = 32


def bloom_semi_reduce(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    bits_per_key: int = BLOOM_BITS_PER_KEY,
) -> DataFrame:
    """Return ``fact`` rows whose ``fact_key`` passes a Bloom filter
    built from ``dim``'s distinct ``dim_key`` values.

    The result is a deterministic superset of the true semi-join (no
    false negatives) and a subset of ``fact``; follow with the real join
    to obtain exact results. Schema is unchanged.
    """
    helper = {"g", "h1", "h2"} | {
        c for i in range(BLOOM_K) for c in (f"pos{i}", f"w{i}", f"bits{i}")
    }
    clash = helper & set(fact.columns)
    if clash:
        raise ValueError(f"fact columns collide with probe helpers: {clash}")

    keys = (
        dim.select(F.col(dim_key).cast("string").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = max(keys.count(), 1)
    m_bits = max(1024, 1 << math.ceil(math.log2(bits_per_key * n)))
    words = bloom_bitset(keys, m_bits)

    probe = _with_bloom_hashes(
        fact.withColumn("g", F.col(fact_key).cast("string")), m_bits
    )
    hit = F.lit(True)
    for i in range(BLOOM_K):
        probe = probe.withColumn(f"pos{i}", _bloom_pos(i, m_bits)).withColumn(
            f"w{i}", F.expr(f"CAST(pos{i} div 64 AS INT)")
        )
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        probe = probe.join(F.broadcast(wi), f"w{i}", "left")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 64 AS INT))"
        )
        hit = hit & (
            F.coalesce(F.col(f"bits{i}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    return probe.filter(hit).drop(*helper)

"""Checkpoint lifecycle management (r17 optimization round).

``Dataset.localCheckpoint`` persists the frame's partitions (memory,
spilling to disk) and TRUNCATES lineage — the blocks are then the only
copy of the data. Spark never frees them proactively: release waits for
the Python wrapper to be garbage-collected, the py4j finalizer to drop
the JVM reference, and the ContextCleaner's weak-reference sweep to
notice — which in practice means superseded iteration states (k-core
peels, star-contraction rounds, BPE merge rounds) accumulate for the
lifetime of the session. Measured locally (guide §5 "unpersist when
done"): one 1M-row checkpoint pins ~100 MB; an 8-round k-core leaks
~9 frames per run, and a full 135-query bench session accumulates GBs
of dead blocks whose GC/eviction pressure bleeds into every later
query. At cluster scale the same leak evicts useful blocks and forces
spill on busy executors.

``free_local_checkpoint`` releases the storage behind a checkpointed
DataFrame that is PROVABLY superseded — nothing may reference it
afterwards (the lineage is truncated, so the data is unrecoverable by
design). Iterative operators call it on round N's frame once round
N+1's checkpoint has materialized. It is a deliberate no-op when the
frame is not a checkpoint leaf (callers can pass loop state that
started life as a plain plan without tracking which round created it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the block storage behind a localCheckpoint'd DataFrame.

    Only call on frames that are strictly superseded: the checkpoint's
    blocks are the only copy of the data, so any later action on ``df``
    (or a plan built on it) will fail after this. No-op when ``df``'s
    logical plan is not a ``LogicalRDD`` checkpoint leaf, and on any
    py4j/internal failure (freeing is an optimization, never a
    correctness dependency).
    """
    try:
        jlog = df._jdf.queryExecution().logical()
        if jlog.getClass().getSimpleName() != "LogicalRDD":
            return
        jlog.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — freeing must never break the query
        pass

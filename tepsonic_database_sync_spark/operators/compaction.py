"""Small-file compaction planning for partitioned datasets.

A 100 TB table ingested incrementally accumulates small files — the
classic lakehouse problem: scan parallelism explodes, footer/open costs
dominate, min/max pruning degrades. The fix is periodic compaction:
group each partition's files into target-sized output bins and rewrite
bin by bin (Delta OPTIMIZE / Iceberg rewrite_data_files). This module
is the PLANNING half as a pure relational operator — deterministic,
oracle-checkable, and cheap enough to run on every sync cycle.

``compaction_plan`` assigns every file a bin via the prefix-sum rule:
bin = (running_bytes_before_this_file) DIV target — i.e. greedy
first-fit in a stable order. Bins can exceed the target by at most one
file (the standard greedy guarantee); a file larger than the target
gets a bin of its own.

Scale shape: ONE window per partition key ordered by the stable file id
— the frame is the file LISTING (metadata, ~10⁴-10⁶ rows per partition
at the extreme), never data bytes. The rewrite executor then reads each
bin's files and writes one output file per bin; only the planning is in
scope here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Plan compaction bins for a file listing.

    ``files``: one row per file with its partition, a stable unique file
    id (the ordering key — listings must plan deterministically), and
    its size. Returns the input keys plus:

    - ``bin``      — output-file index within the partition,
    - ``bin_bytes``— running size of the file's bin *through this file*
      (the last file of each bin carries the bin's total),
    - ``needs_compaction`` — FALSE iff the file sits alone in its bin at
      ≥ target size already (rewriting it would be wasted IO — the
      executor skips those bins).
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        files.select(
            partition_col,
            file_col,
            F.col(bytes_col).cast("long").alias(bytes_col),
        )
        .withColumn("__cum", F.sum(bytes_col).over(w).cast("long"))
        .withColumn("__before", (F.col("__cum") - F.col(bytes_col)).cast("long"))
        .withColumn("bin", F.expr(f"__before div {target_bytes}").cast("long"))
    )
    wb = Window.partitionBy(partition_col, "bin")
    return (
        binned.withColumn(
            "bin_bytes",
            (F.col("__cum") - F.min("__before").over(wb)).cast("long"),
        )
        .withColumn("__bin_n", F.count("*").over(wb).cast("long"))
        .withColumn(
            "needs_compaction",
            ~(
                (F.col("__bin_n") == 1)
                & (F.col(bytes_col) >= target_bytes)
            ),
        )
        .select(
            partition_col,
            file_col,
            bytes_col,
            "bin",
            "bin_bytes",
            "needs_compaction",
        )
    )

"""SparkSession factory.

The reference bootstraps one Node process + lazily-connected Mongo client
(reference: src/routes/products.js:10-18, src/index.js:18-33). The engine
equivalent is a single SparkSession with settings chosen for correctness
against the DuckDB oracle (UTC timestamps) and for scale (AQE handles
skew/coalescing at runtime; shuffle partitions sized to cores locally —
on a real cluster leave it to AQE's coalescing with a higher initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "tepsonic_database_sync_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    Local mode is a single JVM; on a cluster the same settings apply except
    ``master`` comes from the environment. AQE is enabled so that at 100 TB
    scale the runtime re-plans: shuffle-partition coalescing, skew-join
    splitting, and dynamic broadcast conversion all depend on it.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND
        # isnotnull(arr)` from every explode(), and predicate pushdown
        # then substitutes the array ALIAS through the projections below
        # — duplicating the entire array-building expression chain
        # (tokenize → shingle zip_with; gram transforms) into a Filter
        # at the scan, where it re-evaluates per row with the common
        # subexpressions re-expanded (measured r18 at sf0.1: the MinHash
        # signature pass 4.9 s → 0.65 s once excluded; the guide §4.4
        # filter-duplication trap, hit by expressions instead of UDFs).
        # The filter's only benefit is pruning empty-array rows BEFORE
        # the Generate — explode already skips them — and enabling scan
        # pushdown for STORED array columns, which no table in this
        # engine has. Scale-honest: the duplicated chain doubles
        # scan-stage CPU at any corpus size.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

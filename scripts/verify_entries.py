"""Oracle-verify a NAMED SUBSET of registry entries (driver_sim's exact
comparison rule) at one or more SF dirs.

Usage: python scripts/verify_entries.py entry [entry ...] [--sf DIR ...]
Defaults to sf0.001 and sf0.01. Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry

args = sys.argv[1:]
sfs: list[str] = []
names: list[str] = []
i = 0
while i < len(args):
    if args[i] == "--sf":
        sfs.append(args[i + 1]); i += 2
    else:
        names.append(args[i]); i += 1
if not sfs:
    sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

spark = build_session(app_name="verify_entries", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
qs, os_ = registry.queries(), registry.oracle_sql()

fails = []
for sf in sfs:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, sf).toPandas()
            want = con.execute(os_[name]).df()
            got = got[sorted(got.columns)].sort_values(
                by=sorted(got.columns), kind="mergesort"
            ).reset_index(drop=True)
            want = want[sorted(want.columns)].sort_values(
                by=sorted(want.columns), kind="mergesort"
            ).reset_index(drop=True)
            ok = (
                list(got.columns) == list(want.columns)
                and len(got) == len(want)
                and got.equals(want)
            )
            print(
                f"  {name} @ {os.path.basename(sf)}: "
                f"{'MATCH' if ok else 'MISMATCH'} ({len(got)} rows, "
                f"{time.time()-t0:.1f}s)",
                flush=True,
            )
            if not ok:
                fails.append((name, sf))
        except Exception as ex:  # noqa: BLE001
            print(f"  {name} @ {sf}: ERROR {type(ex).__name__}: {ex}", flush=True)
            fails.append((name, sf))

print(f"\n{'FAIL: ' + str(fails) if fails else 'ALL MATCH'}")
sys.exit(1 if fails else 0)

"""Check NAMED registry entries against their DuckDB oracles at one or
more SF dirs — the driver_sim compare for a targeted subset, used while
iterating on an operator (the full sweep takes ~12 minutes; this takes
seconds per entry).

Usage:
    python scripts/check_entries.py NAME[,NAME...] [SF_DIR ...]
    (default SF dir: /root/testdata/sf0.01)

Exit 0 iff every named entry matches at every SF."""

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def main() -> None:
    names = sys.argv[1].split(",")
    sfs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    spark = build_session(app_name="check_entries")
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = registry.queries(), registry.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    bad = []
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            got = qs[name](spark, sf).toPandas()
            if name not in os_:
                print(f"{sf} {name}: rows-only {len(got)}")
                continue
            want = con.execute(os_[name]).df()
            got = (
                got[sorted(got.columns)]
                .sort_values(by=sorted(got.columns), kind="mergesort")
                .reset_index(drop=True)
            )
            want = (
                want[sorted(want.columns)]
                .sort_values(by=sorted(want.columns), kind="mergesort")
                .reset_index(drop=True)
            )
            ok = (
                list(got.columns) == list(want.columns)
                and len(got) == len(want)
                and got.equals(want)
            )
            print(
                f"{sf} {name}: {'MATCH' if ok else 'MISMATCH'}"
                f" ({len(got)} rows, {time.time() - t0:.1f}s)"
            )
            if not ok:
                bad.append((sf, name))
                print(got.head(3))
                print(want.head(3))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

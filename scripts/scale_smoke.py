"""Scale-stress smoke: run the flagship pipeline on synthetically
amplified fact data (lineitem × N with shifted keys) and report how wall
time grows. The point is shape, not absolute numbers: the sync pipeline
must scale ~linearly in fact rows (catalog-bounded join sides, one
aggregation pass) — a quadratic regression (e.g. an accidental cross
join) shows up immediately as super-linear growth.

Writes nothing outside /tmp; testdata stays read-only.

Usage: python scripts/scale_smoke.py [factors...]   (default: 1 2 4 8)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark.fixtures import admin_products, vendor_items
from tepsonic_database_sync_spark.io import load_table
from tepsonic_database_sync_spark.plans.sync import sync_options

SF = "/root/testdata/sf0.1"


def amplified(spark, factor: int):
    """lineitem × factor with order keys shifted per copy (distinct item
    ids, same join/grouping distribution — amplifies rows, not skew)."""
    li = load_table(spark, SF, "lineitem")
    p = load_table(spark, SF, "part")
    shift = 10_000_000
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return vendor_items(out, p), admin_products(p)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = build_session(app_name="scale_smoke")
    spark.range(1).count()
    results = []
    for f in factors:
        vi, ap = amplified(spark, f)
        t0 = time.time()
        sync_options(vi, ap).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results.append((f, dt))
        base = results[0][1]
        print(
            f"factor {f:2d}: {dt:6.2f}s  rows≈{600_000*f:>9,}  "
            f"vs linear×{f}: {dt/(base*f):.2f}"
        )


if __name__ == "__main__":
    main()

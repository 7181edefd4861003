"""Quiet min-of-5 adjudication probe for the iterative-graph family
(VERDICT r14 item 3: pagerank read 5.38 s official vs 3.87 r13 with
untouched code while calib_pre showed contention). Runs the bench's
exact _run_once protocol — noop sink, min-of-N, System.gc between
runs — with the calibration probe before and after, on one family."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from tepsonic_database_sync_spark import registry
from tepsonic_database_sync_spark.session import build_session

import bench

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "pagerank", "bfs_hops", "graph_components", "label_propagation",
    "kcore", "triangle_stats",
]
RUNS = int(os.environ.get("RUNS", "5"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(app_name="graph_probe", cpus=32)
    spark.range(1).count()
    qs = registry.queries()
    calib_pre = bench._calibration(spark)
    out = {}
    for name in NAMES:
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            bench._run_once(spark, name, qs, SF)
            times.append(round(time.time() - t0, 3))
            spark.sparkContext._jvm.System.gc()
        out[name] = {"min": min(times), "all": times}
    calib_post = bench._calibration(spark)
    print(json.dumps({
        "calib_pre": round(calib_pre, 3),
        "calib_post": round(calib_post, 3),
        "sf": SF, "runs": RUNS, "queries": out,
    }, indent=1))


if __name__ == "__main__":
    main()

"""Isolated per-query profiler (r17 optimization round).

Usage: python scripts/profile_query.py <entry> [<entry> ...] [--runs N]
       [--sf DIR] [--plan-dir plans/r17] [--suffix before|after]

For each named registry entry: capture .explain("formatted") to
<plan-dir>/<entry>_<suffix>.txt, then time the query with the noop sink
(guide §1.4) min-of-N (same warm rule as bench.py) and print one line
per entry.  Runs QUIET (nothing else on the box) or the numbers are
meaningless — this VM shows 2-3x CPU-steal spikes.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs, sf_dir, plan_dir, suffix = 3, "/root/testdata/sf0.1", None, "before"
    final = False
    conf: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--final":
            final = True; i += 1
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1); conf[k] = v; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--plan-dir":
            plan_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(app_name="profile_query", extra_conf=conf or None)
    spark.range(1).count()
    qs = registry.queries()

    for name in names:
        df = qs[name](spark, sf_dir)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            if final:
                # execute THIS DataFrame's own QueryExecution so AQE
                # rewrites the plan in place; explain() then shows the
                # final adaptive plan (isFinalPlan=true) with runtime
                # join strategies and reused exchanges visible
                df.collect()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        best, all_runs = float("inf"), []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
            spark.sparkContext._jvm.System.gc()
        print(f"PROFILE {name}: warm={best:.3f}s runs={all_runs}", flush=True)


if __name__ == "__main__":
    main()

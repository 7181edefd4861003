"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the no-op sink (full compute, no
driver-side row transfer), after a warm-up of the session on a trivial
action. Headline set = the flagship pipeline plus the heaviest operators.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry

# ordered cheap → heavy; covers the reference spine + every extension family
HEADLINE = [
    "j2_match_partial",
    "p6_resolve_variant",
    "stream_sessions",
    "text_stats",
    "events_json",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "sync_summary",
    "sync_pipeline",
    "sync_merge_resync",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # generous heap: the collect_list-heavy sync queries otherwise leave
    # GC pressure that skews timings of later headline queries
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(app_name="bench", cpus=cpus)
    spark.range(1).count()  # JVM warm-up

    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # stabilize: don't let one query's GC debt bill the next one
        spark.sparkContext._jvm.System.gc()

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

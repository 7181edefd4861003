"""Capture .explain('formatted') for every HEADLINE registry entry.

Usage: python scripts/capture_plans.py <outdir> <suffix> [entry ...]
With no entries given, captures all of bench.py's HEADLINE list (minus
match_cascade, which is a fixture rebuild, not a registry query).
NOTE: entries whose builders run driver-side fixpoint loops (star
contraction, k-means) execute real jobs during construction — this
script is for PLAN capture, not timing.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tepsonic_database_sync_spark.session import build_session
from tepsonic_database_sync_spark import registry
import bench

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:] or [n for n in bench.HEADLINE if n != "match_cascade"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
spark = build_session(app_name="capture_plans")
qs = registry.queries()
os.makedirs(outdir, exist_ok=True)

for name in names:
    try:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"PLAN {name}: ok", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"PLAN {name}: ERROR {type(ex).__name__}: {ex}", flush=True)

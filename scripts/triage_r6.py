"""Round-6 per-query isolation timer (guide §1.4): min-of-N noop-sink
shots in a fresh process with the bench session config, /proc/stat
steal ticks bracketing every shot.

Usage: TRIAGE_QUERIES=a,b TRIAGE_TRIALS=3 python scripts/triage_r6.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = os.environ.get("TRIAGE_QUERIES", "grid_stats").split(",")
TRIALS = int(os.environ.get("TRIAGE_TRIALS", "3"))


def steal_ticks() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    import __spark_entry__ as entry_mod
    from geotools_spark.session import get_spark

    spark = get_spark("triage-r6")
    queries = entry_mod.queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    for name in TARGETS:  # warm-up: codegen + worker spin-up per shape
        spark.sparkContext.setJobDescription(f"warm:{name}")
        materialize(queries[name](spark, SF_DIR))

    shots: dict[str, list] = {n: [] for n in TARGETS}
    for _ in range(TRIALS):
        for name in TARGETS:
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"shot:{name}")
            s0 = steal_ticks()
            t0 = time.perf_counter()
            materialize(queries[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            shots[name].append({"sec": round(dt, 3), "steal": steal_ticks() - s0})

    print(json.dumps({
        "sf_dir": SF_DIR,
        "results": {
            n: {"min": min(s["sec"] for s in shots[n]), "shots": shots[n]}
            for n in TARGETS
        },
    }))


if __name__ == "__main__":
    main()

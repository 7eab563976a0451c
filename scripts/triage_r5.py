"""Round-5 regression triage (VERDICT r04 #1): quantile_filter,
grid_skew_quantiles, normalize_heights read 1.37-1.41x slower in
BENCH_r04 than r03. gridstats.py / salting.py / session.py are
byte-identical between the r3 and r4 trees (git diff empty), so for
the two quantile queries the only possible causes are the timing-rule
change, in-suite context (GC / cache state from neighbors), or host
steal. This script isolates: each target query is timed min-of-N
interleaved shots in a FRESH process with the exact bench session
config, with /proc/stat steal deltas bracketing every shot.

Usage: python scripts/triage_r5.py [repo_root] > out.json
Run it once on the current tree and once on a worktree of the r3
commit; compare mins.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# executor python workers import geotools_spark via PYTHONPATH, not the
# driver's sys.path — point them at the same tree
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = os.environ.get(
    "TRIAGE_QUERIES", "quantile_filter,grid_skew_quantiles,normalize_heights"
).split(",")
TRIALS = int(os.environ.get("TRIAGE_TRIALS", "5"))


def steal_ticks() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    import __spark_entry__ as entry_mod
    from geotools_spark.session import get_spark

    spark = get_spark("triage")
    queries = entry_mod.queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: codegen + python worker spin-up for each plan shape
    for name in TARGETS:
        materialize(queries[name](spark, SF_DIR))

    shots: dict[str, list] = {n: [] for n in TARGETS}
    for _ in range(TRIALS):
        for name in TARGETS:
            spark.sparkContext._jvm.System.gc()
            s0 = steal_ticks()
            t0 = time.perf_counter()
            materialize(queries[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            shots[name].append({"sec": round(dt, 3), "steal": steal_ticks() - s0})

    out = {
        "repo": REPO,
        "sf_dir": SF_DIR,
        "trials": TRIALS,
        "results": {
            n: {
                "min": min(s["sec"] for s in shots[n]),
                "median": sorted(s["sec"] for s in shots[n])[len(shots[n]) // 2],
                "max": max(s["sec"] for s in shots[n]),
                "shots": shots[n],
            }
            for n in TARGETS
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

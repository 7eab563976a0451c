"""Hot-cell wall-time evidence for the normalize_heights salted split
(VERDICT r04 #2 done-criterion: wall flat as the hot-cell share grows).

One cell holds a fixed 5k-point ground set and a GROWING non-ground
population; the rest of the points spread over 256 cold cells. The
unsplit path runs the hot cell as ONE Python task (its wall grows with
the hot population); the split path (explicit split_target forces the
probe) spreads the interpolation across k sub-tasks that each
re-triangulate the same 5k-point TIN — so its wall is bounded by
tri_time + interp/k.

Boundary of the win (documented in BENCH.md): the split duplicates the
triangulation, so a GROUND-heavy hot cell stays bounded by its own
Delaunay build; the interpolation half is what parallelizes. That is
the common regime (non-ground >> ground per cell).

Usage: python scripts/bench_hotcell.py > /tmp/hotcell.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_N = [200_000, 800_000, 1_600_000]
TRIALS = int(os.environ.get("HOTCELL_TRIALS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from geotools_spark.operators.terrain import normalize_heights
    from geotools_spark.session import get_spark

    spark = get_spark("hotcell-ab")
    res = 100.0  # one cell = one 100x100 patch

    def fixture(hot_n: int):
        # cold background: 256 cells of 2k non-ground + 500 ground each
        cold = spark.range(256 * 2500).selectExpr(
            "id as pid",
            f"CAST((CAST(id % 16 AS DOUBLE) + pmod(xxhash64(id, 1), 1000) / 1000.0) * {res} AS DOUBLE) AS x",
            f"CAST((CAST(CAST(id / 16 AS BIGINT) % 16 AS DOUBLE) + pmod(xxhash64(id, 2), 1000) / 1000.0) * {res} AS DOUBLE) AS y",
            "CAST(10.0 + pmod(xxhash64(id, 3), 500) / 100.0 AS DOUBLE) AS z",
            "CASE WHEN id % 5 = 0 THEN 2 ELSE 1 END AS cls",
        )
        # hot cell at (20, 20): 5k ground + hot_n non-ground
        hot = spark.range(hot_n + 5000).selectExpr(
            "id + 10000000 AS pid",
            f"CAST((20.0 + pmod(xxhash64(id, 4), 1000) / 1000.0) * {res} AS DOUBLE) AS x",
            f"CAST((20.0 + pmod(xxhash64(id, 5), 1000) / 1000.0) * {res} AS DOUBLE) AS y",
            "CAST(10.0 + pmod(xxhash64(id, 6), 500) / 100.0 AS DOUBLE) AS z",
            "CASE WHEN id < 5000 THEN 2 ELSE 1 END AS cls",
        )
        return cold.unionByName(hot).localCheckpoint(eager=True)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"trials": TRIALS, "points": []}
    for hot_n in HOT_N:
        pts = fixture(hot_n)
        variants = {
            "unsplit": lambda: run(
                normalize_heights(pts, res=res, rings=1, max_splits=1,
                                  split_target=1 << 60)
            ),
            "split": lambda: run(
                normalize_heights(pts, res=res, rings=1,
                                  split_target=50_000, max_splits=32)
            ),
        }
        for fn in variants.values():
            fn()  # warm-up
        times = {k: [] for k in variants}
        for _ in range(TRIALS):
            for k, fn in variants.items():
                t0 = time.perf_counter()
                fn()
                times[k].append(round(time.perf_counter() - t0, 3))
        rec = {"hot_n": hot_n}
        for k in variants:
            rec[k + "_min"] = min(times[k])
            rec[k + "_all"] = times[k]
        out["points"].append(rec)
        pts.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

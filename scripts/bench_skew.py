"""Skew A/B for the two-phase salted aggregation (VERDICT r04 #8).

The salted path (operators/salting.salted_cell_stats) exists and is
plan-pinned (2 exchanges), but its payoff was asserted, never measured.
This script measures it: the sf0.1 point table is re-keyed so a chosen
fraction ``p`` of rows lands in ONE hot cell (the rest keep their real
cells), then the plain one-shuffle ``cell_stats`` and the two-phase
``salted_cell_stats`` aggregate the same frame — min-of-N wall clock
each, interleaved, AQE on (the same session config as bench.py).

Note what the hot cell stresses at local[32]: ONE reducer task gets p
of all rows while 4095 cells share the rest — the exact shape one hot
key has at cluster scale. AQE's skew handling does NOT split aggregate
shuffles (only joins), so the plain path serializes; the salted path
spreads the hot cell over n_salts partial aggregates and re-combines.

Usage: python scripts/bench_skew.py > /tmp/skew.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("SKEW_TRIALS", "3"))
SHARES = [0.0, 0.2, 0.5, 0.8]


def main() -> None:
    from pyspark.sql import functions as F

    from geotools_spark.operators.gridstats import cell_stats
    from geotools_spark.operators.salting import salted_cell_stats
    from geotools_spark.session import get_spark
    from geotools_spark.testkit import derive

    spark = get_spark("skew-ab")
    stats = ("count", "min", "max", "mean", "stddev")

    def skewed(p: float):
        pts = derive.cells_df(spark, SF_DIR).select(
            "pid", "z", "cell_col", "cell_row"
        )
        if p > 0:
            hot = F.pmod(F.xxhash64("pid"), F.lit(1_000_000)) < int(p * 1_000_000)
            pts = pts.withColumn(
                "cell_col", F.when(hot, F.lit(0)).otherwise(F.col("cell_col"))
            ).withColumn(
                "cell_row", F.when(hot, F.lit(0)).otherwise(F.col("cell_row"))
            )
        # pin the input so both paths aggregate the identical frame and
        # neither pays the derivation inside its timed window
        return pts.localCheckpoint(eager=True)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"sf_dir": SF_DIR, "trials": TRIALS, "rows": None, "points": []}
    for p in SHARES:
        pts = skewed(p)
        out["rows"] = pts.count()
        plain_fn = lambda: run(cell_stats(pts, stats=stats))
        salted_fn = lambda: run(salted_cell_stats(pts, stats=stats))
        plain_fn(); salted_fn()  # warm-up both plan shapes
        plain, salted = [], []
        for _ in range(TRIALS):
            t0 = time.perf_counter(); plain_fn(); plain.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); salted_fn(); salted.append(time.perf_counter() - t0)
        out["points"].append(
            {
                "hot_share": p,
                "plain_min": round(min(plain), 3),
                "salted_min": round(min(salted), 3),
                "plain_all": [round(t, 3) for t in plain],
                "salted_all": [round(t, 3) for t in salted],
            }
        )
        pts.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

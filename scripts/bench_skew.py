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
SHARES = [
    float(s)
    for s in os.environ.get("SKEW_SHARES", "0.0,0.2,0.5,0.8").split(",")
]


def main() -> None:
    from pyspark.sql import functions as F

    from geotools_spark.operators.gridstats import cell_stats
    from geotools_spark.operators.salting import (
        exact_quantiles_by_value,
        salted_cell_stats,
    )
    from geotools_spark.session import get_spark
    from geotools_spark.testkit import derive

    spark = get_spark("skew-ab")
    stats = ("count", "min", "max", "mean", "stddev")

    mult = int(os.environ.get("SKEW_MULT", "16"))

    def skewed(p: float):
        pts = derive.cells_df(spark, SF_DIR).select(
            "pid", "z", "cell_col", "cell_row"
        )
        if mult > 1:
            # replicate to ~10M rows: at plain sf0.1 (600k) even an 80%
            # hot cell sorts in tens of ms — the skew has to carry real
            # volume before one reducer's collect_list dominates
            pts = pts.withColumn(
                "_r", F.explode(F.sequence(F.lit(1), F.lit(mult)))
            ).withColumn("pid", F.col("pid") * mult + F.col("_r")).drop("_r")
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

    stats_hol = stats + ("median",)
    out = {"sf_dir": SF_DIR, "trials": TRIALS, "rows": None, "points": []}
    for p in SHARES:
        pts = skewed(p)
        out["rows"] = pts.count()
        variants = {
            # algebraic: map-side partial aggregation already combines a
            # hot cell's rows per map task — the reduce side sees
            # ~n_tasks partials, so salting should NOT pay here
            "alg_plain": lambda: run(cell_stats(pts, stats=stats)),
            "alg_salted": lambda: run(salted_cell_stats(pts, stats=stats)),
            # holistic (median): collect_list has NO partial combine —
            # the hot reducer receives hot_share of ALL rows; this is
            # where a two-phase path has to earn its exchanges
            "hol_plain": lambda: run(cell_stats(pts, stats=stats_hol)),
            # salted list-merge: balances the SORT but phase 2 still
            # re-materializes the hot cell's full list on one reducer
            # (it OOMs first at 38M rows — see BENCH.md); the real
            # scale path for holistic is by-VALUE below
            "hol_salted": lambda: run(salted_cell_stats(pts, stats=stats_hol)),
            # by-value: groupBy(cell, z).count() partial-combines like an
            # algebraic agg; reducer state is O(distinct z), never the
            # row list — the 100 TB-safe holistic plan
            "hol_byvalue": lambda: run(exact_quantiles_by_value(pts)),
        }
        only = os.environ.get("SKEW_VARIANTS")
        if only:
            keep = set(only.split(","))
            variants = {k: v for k, v in variants.items() if k in keep}
        for fn in variants.values():
            fn()  # warm-up each plan shape
        times = {k: [] for k in variants}
        for _ in range(TRIALS):
            for k, fn in variants.items():
                t0 = time.perf_counter()
                fn()
                times[k].append(round(time.perf_counter() - t0, 3))
        rec = {"hot_share": p}
        for k in variants:
            rec[k + "_min"] = min(times[k])
            rec[k + "_all"] = times[k]
        out["points"].append(rec)
        pts.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

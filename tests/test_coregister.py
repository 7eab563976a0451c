"""M20 co-registration: greedy max-count chain walk + shift apply."""

import pytest
from pyspark.sql import functions as F

from geotools_spark.operators.coregister import apply_shifts, coregister_shifts


def _diffs(spark, rows):
    return spark.createDataFrame(rows, "rid0 string, rid1 string, count long, mean double")


def test_chain_sums_means_to_root(spark):
    # c -> b -> a (root); b offset +2 vs a, c offset +3 vs b
    # mean(a - b) = -2, mean(b - c) = -3
    d = _diffs(spark, [("a", "b", 100, -2.0), ("b", "c", 80, -3.0)])
    shifts = coregister_shifts(d, root="a")
    assert shifts["a"] == 0.0
    assert shifts["b"] == pytest.approx(-2.0)
    assert shifts["c"] == pytest.approx(-5.0)  # -3 + -2 along the chain


def test_greedy_follows_max_count_without_backtracking(spark):
    # c has two edges: to b (count 90) and to a (count 50). Greedy takes
    # b; b reaches a. Chain c->b->a, NOT the direct c->a edge.
    d = _diffs(
        spark,
        [("a", "b", 100, -2.0), ("b", "c", 90, -3.0), ("a", "c", 50, -99.0)],
    )
    shifts = coregister_shifts(d, root="a")
    assert shifts["c"] == pytest.approx(-5.0)  # not -99


def test_dead_end_yields_no_shift(spark):
    # d only connects forward to e (since edges point later->earlier,
    # e->d exists but d has no outgoing) -> d unreachable to root a
    d = _diffs(spark, [("a", "b", 10, 1.0), ("d", "e", 10, 4.0)])
    shifts = coregister_shifts(d, root="a")
    assert "e" not in shifts or shifts.get("e") is None or "d" not in shifts
    assert "b" in shifts


def test_apply_shifts(spark):
    pts = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("x", 1.0)], "raster_id string, z double"
    )
    out = {r.raster_id: r.z for r in apply_shifts(pts, {"a": 0.0, "b": 2.5}).collect()}
    assert out == {"a": 1.0, "b": 3.5, "x": 1.0}


def test_end_to_end_with_distributed_diffs(spark):
    """Two shifted copies of one surface: recovered shift re-aligns."""
    from geotools_spark.operators.raster import raster_pair_diff_stats

    base = spark.range(256).select(
        (F.col("id") % 16).alias("cell_col"),
        F.floor(F.col("id") / 16).alias("cell_row"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    shifted = base.withColumn("value", F.col("value") + 4.0)
    rasters = base.withColumn("raster_id", F.lit("a")).unionByName(
        shifted.withColumn("raster_id", F.lit("b"))
    )
    classes = base.select("cell_col", "cell_row", F.lit(0).alias("cls"))
    d = raster_pair_diff_stats(rasters, classes).groupBy("rid0", "rid1").agg(
        F.sum("count").alias("count"),
        (F.sum(F.col("mean") * F.col("count")) / F.sum("count")).alias("mean"),
    )
    shifts = coregister_shifts(d, root="a")
    assert shifts["b"] == pytest.approx(-4.0)  # b + (-4) == a


def test_csv_roundtrip(spark, tmp_path):
    """S8/S9: header CSV source/sink roundtrip."""
    from geotools_spark.sources.csvio import read_xyz_csv, write_stats_csv

    src = spark.createDataFrame(
        [(1.5, 2.5, 3.5), (4.0, 5.0, 6.0)], "x double, y double, z double"
    )
    p = str(tmp_path / "xyz")
    write_stats_csv(src, p)
    back = read_xyz_csv(spark, p)
    assert {(r.x, r.y, r.z) for r in back.collect()} == {
        (1.5, 2.5, 3.5),
        (4.0, 5.0, 6.0),
    }

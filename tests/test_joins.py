"""PIP / radius / kNN join operators vs small brute-force oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geotools_spark.operators.neighbors import (
    idw,
    knn_join,
    knn_kth_dist_bound_ok,
    radius_cell_join,
)
from geotools_spark.operators.pip import pip_join, ray_cast
from geotools_spark.sources.datagen import fixture_polygons

CONCAVE = np.array(
    [(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 3.0), (4.0, 3.0),
     (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
)


def test_ray_cast_concave():
    xs = np.array([0.5, 2.0, 2.0, 2.0, 5.0])
    ys = np.array([2.0, 0.5, 2.0, 3.5, 2.0])
    # (2,2) sits in the concave notch -> outside
    assert ray_cast(xs, ys, CONCAVE).tolist() == [True, True, False, True, False]


def test_pip_join_inner_and_semi(spark):
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 22.05, 5.0), (3, 60.0, 60.0), (4, 20.0, 28.0),
         (5, 14.0, 28.0)],
        "pid int, x double, y double",
    )
    polys = fixture_polygons(spark)
    inner = pip_join(pts, polys, res=8.0, how="inner")
    got = {(r.pid, r.poly_id) for r in inner.collect()}
    # pid 4 is in the concave polygon's notch -> NOT inside; pid 5 is in
    # the C's left bar -> inside poly 4
    assert got == {(1, 1), (2, 2), (5, 4)}
    semi = pip_join(pts, polys, res=8.0, how="left_semi")
    assert {r.pid for r in semi.collect()} == {1, 2, 5}
    assert semi.columns == pts.columns  # clip preserves schema


def test_radius_join_matches_bruteforce(spark):
    rows = [(float(i % 7) + 0.3, float(i % 5) + 0.7, float(i)) for i in range(40)]
    pts = spark.createDataFrame(rows, "x double, y double, z double")
    rj = radius_cell_join(pts, radius=1.5, res=1.0)
    got = {
        ((r.cell_col, r.cell_row), r.z) for r in rj.collect()
    }
    want = set()
    for x, y, z in rows:
        for cc in range(-2, 10):
            for cr in range(-2, 8):
                if (x - (cc + 0.5)) ** 2 + (y - (cr + 0.5)) ** 2 <= 2.25:
                    want.add(((cc, cr), z))
    assert got == want


def test_knn_matches_bruteforce(spark):
    qrows = [(i, float((i * 37) % 19) + 0.21, float((i * 53) % 17) + 0.43)
             for i in range(15)]
    srows = [(j, float((j * 29) % 19) + 0.11, float((j * 41) % 17) + 0.59,
              float(j % 9)) for j in range(300)]
    q = spark.createDataFrame(qrows, "qid int, qx double, qy double")
    s = spark.createDataFrame(srows, "sid int, x double, y double, z double")
    knn = knn_join(q, s, k=4, res=2.0, rings=2)
    assert knn_kth_dist_bound_ok(knn, k=4, res=2.0, rings=2)
    got = {
        (r.qid, r.knn_rank): r.sid for r in knn.collect()
    }
    sdf = pd.DataFrame(srows, columns=["sid", "x", "y", "z"])
    for qid, qx, qy in qrows:
        d = np.sqrt((sdf.x - qx) ** 2 + (sdf.y - qy) ** 2)
        order = sorted(zip(d, sdf.sid))
        for rank in range(1, 5):
            assert got[(qid, rank)] == order[rank - 1][1], (qid, rank)


def test_idw_exact_hit(spark):
    knn = spark.createDataFrame(
        [(1, 0.0, 7.0), (1, 2.0, 9.0), (2, 1.0, 4.0), (2, 2.0, 8.0)],
        "qid int, dist double, z double",
    )
    out = {r.qid: r.idw for r in idw(knn, query_id="qid").collect()}
    assert out[1] == 7.0  # exact hit short-circuit
    expected = (4.0 / 1.0 + 8.0 / 4.0) / (1.0 / 1.0 + 1.0 / 4.0)
    assert out[2] == pytest.approx(expected, rel=1e-12)

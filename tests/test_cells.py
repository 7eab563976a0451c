"""Cell-key kernels vs a pure-Python Morton oracle."""

import pytest
from pyspark.sql import functions as F

from geotools_spark.functions.cells import (
    morton_key,
    morton_parent,
    snap_bounds,
    with_cell,
)


def _morton_py(x: int, y: int) -> int:
    out = 0
    for b in range(32):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton_matches_oracle(spark):
    df = (
        spark.range(500)
        .withColumn("cx", (F.col("id") * 2654435761) % 100000)
        .withColumn("cy", (F.col("id") * 40503 + 17) % 100000)
        .withColumn("z", morton_key(F.col("cx"), F.col("cy")))
    )
    for row in df.collect():
        assert row.z == _morton_py(row.cx, row.cy)


def test_morton_parent_prefix(spark):
    df = (
        spark.range(100)
        .withColumn("cx", (F.col("id") * 7919) % 4096)
        .withColumn("cy", (F.col("id") * 104729) % 4096)
        .withColumn("z", morton_key(F.col("cx"), F.col("cy")))
        .withColumn("zp", morton_parent(F.col("z"), 3))
    )
    for row in df.collect():
        assert row.zp == _morton_py(row.cx >> 3, row.cy >> 3)


def test_snap_bounds():
    assert snap_bounds(0.4, 0.6, 1.9, 4.2, 1.0) == (0.0, 0.0, 2.0, 5.0)
    assert snap_bounds(-0.5, 0.0, 2.0, 4.0, 2.0) == (-2.0, 0.0, 2.0, 4.0)


@pytest.mark.parametrize("yflip", [False, True])
def test_with_cell_conventions(spark, yflip):
    df = spark.createDataFrame([(0.5, 0.5), (1.5, 4.5)], "x double, y double")
    out = with_cell(df, minx=0.0, miny=0.0, res=1.0, cols=2, rows=5, yflip=yflip, zkey=True)
    rows = {(r.x, r.y): r for r in out.collect()}
    r0 = rows[(0.5, 0.5)]
    r1 = rows[(1.5, 4.5)]
    if yflip:
        # lasgrid convention: rows count from the top (src/lasgrid.cpp:313-314)
        assert (r0.cell_col, r0.cell_row) == (0, 4)
        assert (r1.cell_col, r1.cell_row) == (1, 0)
    else:
        assert (r0.cell_col, r0.cell_row) == (0, 0)
        assert (r1.cell_col, r1.cell_row) == (1, 4)
    assert r0.cell == r0.cell_row * 2 + r0.cell_col

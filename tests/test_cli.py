"""CLI surface: each subcommand is a thin wrapper over an oracled
operator; these tests pin the wiring (flags reach the operator, output
lands where asked) on sf0.001, not the semantics (the operators' own
oracles do that)."""

import os

import pytest

from geotools_spark import cli


@pytest.fixture(scope="module")
def points_path(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("cli"))
    out = os.path.join(td, "points")
    assert cli.main(["derive", "/root/testdata/sf0.001", out]) == 0
    return out


def test_cli_pointstats_grid(spark, points_path, tmp_path):
    out = str(tmp_path / "grid")
    rc = cli.main([
        "pointstats", points_path, out,
        "--resolution", "2", "--type", "count,mean,stddev",
        "--cls", "1,2",
    ])
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() > 0
    assert {"cell_col", "cell_row", "count", "mean", "stddev"} <= set(
        df.columns
    )


def test_cli_lasmerge_bounds_and_header(spark, points_path, tmp_path):
    out = str(tmp_path / "merged")
    hdr = str(tmp_path / "hdr")
    rc = cli.main([
        "lasmerge", f"{points_path},{points_path}", out,
        "--bounds", "0,0,50,50", "--header-out", hdr,
    ])
    assert rc == 0
    merged = spark.read.parquet(out)
    n_one = spark.read.parquet(points_path).filter(
        "x >= 0 and x <= 50 and y >= 0 and y <= 50"
    ).count()
    assert merged.count() == 2 * n_one  # two copies, same bounds filter
    h = spark.read.parquet(hdr).first()
    assert h.n_points == 2 * n_one and h.maxx <= 50.0


def test_cli_pointnormalize(spark, points_path, tmp_path):
    out = str(tmp_path / "norm")
    assert cli.main([
        "pointnormalize", points_path, out, "--resolution", "4",
    ]) == 0
    df = spark.read.parquet(out)
    assert "z_norm" in df.columns and df.count() > 0


def test_cli_unknown_tool_rejected():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate", "a", "b"])


def test_cli_pointzonalstats(spark, points_path, tmp_path):
    # zones: long-form raster covering the cell grid at res=4
    zones = str(tmp_path / "zones")
    spark.sql(
        "SELECT CAST(c AS BIGINT) AS cell_col, CAST(r AS BIGINT) AS cell_row,"
        " CAST((c + r) % 3 AS INT) AS zone_id"
        " FROM (SELECT explode(sequence(0, 31)) AS c)"
        " LATERAL VIEW explode(sequence(0, 31)) t AS r"
    ).write.parquet(zones)
    out = str(tmp_path / "zstats")
    rc = cli.main([
        "pointzonalstats", points_path, out,
        "--zones", zones, "--resolution", "4",
    ])
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() > 0 and {"zone_id", "cls", "mean"} <= set(df.columns)


def test_cli_las2csrs_and_lasvalidate(spark, points_path, tmp_path):
    shifted = str(tmp_path / "pts_utm")
    spark.read.parquet(points_path).selectExpr(
        "pid", "x * 1000.0 + 440000.0 AS x", "y * 1000.0 + 6480000.0 AS y",
        "z",
    ).write.parquet(shifted)
    out = str(tmp_path / "csrs")
    assert cli.main(["las2csrs", shifted, out]) == 0
    df = spark.read.parquet(out)
    assert df.count() > 0

    stations = str(tmp_path / "stations")
    spark.read.parquet(points_path).filter("pid % 97 = 0").selectExpr(
        "pid AS qid", "x AS qx", "y AS qy", "z AS qz"
    ).write.parquet(stations)
    vout = str(tmp_path / "validated")
    assert cli.main([
        "lasvalidate", points_path, vout,
        "--stations", stations, "--radius", "1.5",
    ]) == 0
    assert spark.read.parquet(vout).count() > 0


def test_cli_lasclip(spark, points_path, tmp_path):
    polys = str(tmp_path / "polys")
    spark.createDataFrame(
        [(1, [{"x": 0.0, "y": 0.0}, {"x": 30.0, "y": 0.0},
              {"x": 30.0, "y": 30.0}, {"x": 0.0, "y": 30.0}])],
        "poly_id int, ring array<struct<x:double,y:double>>",
    ).write.parquet(polys)
    out = str(tmp_path / "clipped")
    assert cli.main([
        "lasclip", points_path, out, "--polygons", polys,
    ]) == 0
    df = spark.read.parquet(out)
    # the box is a strict subset of the extent: some points clipped away
    n_all = spark.read.parquet(points_path).count()
    assert 0 < df.count() < n_all
    assert df.filter("x > 30.0 or y > 30.0").count() == 0


def test_cli_pointstats_exact_max_bound_clamps(spark, tmp_path):
    """A point exactly on the snapped max bound must land in the last
    cell, not overflow the grid (yflip would otherwise map it to row
    -1)."""
    src = str(tmp_path / "edge_pts")
    spark.createDataFrame(
        [(0, 0.5, 0.5, 1.0, 1), (1, 8.0, 8.0, 2.0, 1)],
        "pid long, x double, y double, z double, cls int",
    ).write.parquet(src)
    out = str(tmp_path / "edge_grid")
    assert cli.main([
        "pointstats", src, out, "--resolution", "4", "--type", "count",
    ]) == 0
    df = spark.read.parquet(out)
    assert df.agg({"count": "sum"}).first()[0] == 2  # nothing dropped
    assert df.filter("cell_row < 0 or cell_col < 0").count() == 0


def test_cli_lasmerge_applies_filters(spark, points_path, tmp_path):
    out = str(tmp_path / "merged_f")
    assert cli.main([
        "lasmerge", points_path, out, "--cls", "2",
    ]) == 0
    df = spark.read.parquet(out)
    assert df.count() > 0 and df.filter("cls <> 2").count() == 0

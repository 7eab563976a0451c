"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship interleaved-document pipeline; ``queries``
exposes one callable per implemented operator (SURVEY.md §2) and
``oracle_sql`` the DuckDB-equivalent ANSI SQL. Geospatial columns are
derived deterministically from ``lineitem`` by shared expression strings
(geotools_spark.testkit.derive) so Spark and DuckDB compute identical
values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotools_spark.functions.cells import with_cell
from geotools_spark.operators import gridstats
from geotools_spark.operators.spans import (
    POINT_SEP,
    explode_spans,
    parse_point_spans,
)
from geotools_spark.testkit import derive

SF0001 = "/root/testdata/sf0.001"

GRID_STATS = (
    "count",
    "min",
    "max",
    "sum",
    "mean",
    "variance",
    "stddev",
    "pvariance",
    "pstddev",
    "median",
    "density",
)
_GRID_ALIASES = {
    "count": "cnt",
    "min": "zmin",
    "max": "zmax",
    "sum": "zsum",
    "mean": "zmean",
    "variance": "zvar",
    "stddev": "zstd",
    "pvariance": "zpvar",
    "pstddev": "zpstd",
    "median": "zmed",
    "density": "dens",
}
_ROUNDED = {"zsum", "zmean", "zvar", "zstd", "zpvar", "zpstd", "zmed"}


def _select_grid(out: DataFrame) -> DataFrame:
    cols = [F.col("cell_col"), F.col("cell_row")]
    for stat, alias in _GRID_ALIASES.items():
        c = F.col(stat)
        if alias in _ROUNDED:
            c = F.round(c, 6)
        cols.append(c.alias(alias))
    return out.select(*cols)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the interleaved document table from sf0.001
    points, explode spans, decode point payloads, assign hierarchical
    cell keys, and grid-aggregate — the reference's pointstats pipeline
    (src/pointstats.cpp:274-379) over the input_hint table shape."""
    pts = derive.points_df(spark, SF0001)
    span_text = F.concat_ws(
        POINT_SEP,
        F.format_string("%.3f", F.col("x")),
        F.format_string("%.3f", F.col("y")),
        F.format_string("%.2f", F.col("z")),
        F.col("intensity").cast("string"),
        F.col("return_num").cast("string"),
        F.col("num_returns").cast("string"),
        F.col("cls").cast("string"),
        F.col("scan_angle").cast("string"),
        F.format_string("%.1f", F.col("gps_time")),
        F.lit("0"),
    )
    span = F.struct(
        F.lit("text").alias("kind"),
        span_text.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        (F.col("pid") % 1000).cast("int").alias("offset"),
    )
    docs = (
        pts.select(F.format_string("doc%06d", F.col("pid") % 500).alias("doc_id"),
                   F.col("pid"), span.alias("span"))
        .groupBy("doc_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(pid, span))), p -> p.span)")
             .alias("spans"))
    )
    points = parse_point_spans(explode_spans(docs))
    cells = with_cell(points, minx=0.0, miny=0.0, res=1.0, cols=64, zkey=True)
    out = gridstats.cell_stats(
        cells, value="z", group=("zkey", "cell_col", "cell_row"),
        stats=("count", "min", "max", "mean", "stddev"), res=1.0,
    )
    return out.orderBy("zkey")


def _q_grid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = derive.cells_df(spark, sf_dir)
    return _select_grid(gridstats.cell_stats(cells, stats=GRID_STATS, res=1.0))


def _q_grid_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = derive.cells_df(spark, sf_dir)
    cells = gridstats.point_filters(cells, cls_set=(1, 2, 3), scan_angle_max=15)
    out = gridstats.cell_stats(cells, stats=("count", "mean", "min", "max"), res=1.0)
    return out.select(
        "cell_col",
        "cell_row",
        F.col("count").alias("cnt"),
        F.round("mean", 6).alias("zmean"),
        F.col("min").alias("zmin"),
        F.col("max").alias("zmax"),
    )


def _q_grid_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = derive.cells_df(spark, sf_dir)
    return gridstats.cell_stats(
        cells, stats=("count", "quantiles"), res=1.0, quantile_num=4
    ).select(
        "cell_col",
        "cell_row",
        F.col("count").alias("cnt"),
        *[F.col(f"q{i}") for i in range(6)],
    )


def _q_gap_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = derive.cells_df(spark, sf_dir)
    out = gridstats.gap_fraction(cells)
    return out.select(
        "cell_col",
        "cell_row",
        *[F.round(c, 6).alias(c) for c in ("gap_bla", "gap_blb", "gap_ir", "gap_rr", "gap_fr")],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "grid_stats": _q_grid_stats,
        "grid_filtered": _q_grid_filtered,
        "grid_quantiles": _q_grid_quantiles,
        "gap_fraction": _q_gap_fraction,
    }


_CELLS_CTE = (
    f"WITH pts AS ({derive.POINTS_CTE}), "
    "cells AS (SELECT *, CAST(FLOOR(x) AS BIGINT) AS cell_col, "
    "CAST(FLOOR(y) AS BIGINT) AS cell_row FROM pts)"
)


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["grid_stats"] = f"""
    {_CELLS_CTE}
    SELECT cell_col, cell_row,
      CAST(COUNT(*) AS DOUBLE) AS cnt,
      MIN(z) AS zmin,
      MAX(z) AS zmax,
      ROUND(SUM(z), 6) AS zsum,
      ROUND(AVG(z), 6) AS zmean,
      ROUND(CASE WHEN COUNT(*) <= 1 THEN 0.0 ELSE VAR_SAMP(z) END, 6) AS zvar,
      ROUND(CASE WHEN COUNT(*) <= 1 THEN 0.0 ELSE STDDEV_SAMP(z) END, 6) AS zstd,
      ROUND(VAR_POP(z), 6) AS zpvar,
      ROUND(STDDEV_POP(z), 6) AS zpstd,
      ROUND(MEDIAN(z), 6) AS zmed,
      CAST(COUNT(*) AS DOUBLE) AS dens
    FROM cells GROUP BY cell_col, cell_row
    """

    sqls["grid_filtered"] = f"""
    {_CELLS_CTE}
    SELECT cell_col, cell_row,
      CAST(COUNT(*) AS DOUBLE) AS cnt,
      ROUND(AVG(z), 6) AS zmean,
      MIN(z) AS zmin,
      MAX(z) AS zmax
    FROM cells
    WHERE cls IN (1, 2, 3) AND ABS(scan_angle) <= 15
    GROUP BY cell_col, cell_row
    """

    q_exprs = ", ".join(
        "vals[CAST(CEIL(({i} / 5.0) * (cnt - 1)) AS INT) + 1] AS q{i}".format(i=i)
        for i in range(6)
    )
    sqls["grid_quantiles"] = f"""
    {_CELLS_CTE},
    packed AS (
      SELECT cell_col, cell_row, CAST(COUNT(*) AS DOUBLE) AS cnt,
             LIST(z ORDER BY z) AS vals
      FROM cells GROUP BY cell_col, cell_row)
    SELECT cell_col, cell_row, cnt, {q_exprs} FROM packed
    """

    di = "CAST(intensity AS DOUBLE)"
    gnd = "cls = 2"
    first = "num_returns > 0 AND return_num = 1"
    last = "num_returns > 0 AND return_num = num_returns"
    single = "num_returns = 1"
    inter = "num_returns > 2 AND return_num > 1 AND return_num < num_returns"
    sqls["gap_fraction"] = f"""
    {_CELLS_CTE},
    sums AS (
      SELECT cell_col, cell_row,
        SUM({di}) AS total_i,
        SUM(CASE WHEN {gnd} THEN {di} ELSE 0 END) AS gnd_i,
        SUM(CASE WHEN cls < 2 THEN {di} ELSE 0 END) AS all_bla,
        SUM(CASE WHEN ({gnd}) AND ({single}) THEN {di} ELSE 0 END) AS gnd_single,
        SUM(CASE WHEN ({gnd}) AND ({last}) THEN {di} ELSE 0 END) AS gnd_last,
        SUM(CASE WHEN {first} THEN {di} ELSE 0 END) AS first_i,
        SUM(CASE WHEN {single} THEN {di} ELSE 0 END) AS single_i,
        SUM(CASE WHEN {inter} THEN {di} ELSE 0 END) AS inter_i,
        SUM(CASE WHEN {last} THEN {di} ELSE 0 END) AS last_i,
        SUM(CASE WHEN NOT ({gnd}) THEN {di} ELSE 0 END) AS canopy_i,
        CAST(SUM(CASE WHEN NOT ({gnd}) THEN 1 ELSE 0 END) AS DOUBLE) AS canopy_n,
        CAST(COUNT(*) AS DOUBLE) AS total_n,
        CAST(SUM(CASE WHEN ({first}) AND NOT ({gnd}) THEN 1 ELSE 0 END) AS DOUBLE)
          AS first_canopy_n,
        CAST(SUM(CASE WHEN {first} THEN 1 ELSE 0 END) AS DOUBLE) AS first_n
      FROM cells GROUP BY cell_col, cell_row)
    SELECT cell_col, cell_row,
      ROUND(CASE WHEN all_bla != 0 THEN 1.0 - SQRT(gnd_i / all_bla)
                 ELSE -9999.0 END, 6) AS gap_bla,
      ROUND(CASE WHEN total_i = 0 THEN -9999.0
                 WHEN ((first_i + single_i) / total_i
                       + SQRT((inter_i + last_i) / total_i)) = 0 THEN -9999.0
                 ELSE (gnd_single / total_i + SQRT(gnd_last / total_i))
                      / ((first_i + single_i) / total_i
                         + SQRT((inter_i + last_i) / total_i)) END, 6) AS gap_blb,
      ROUND(CASE WHEN total_i != 0 THEN canopy_i / total_i ELSE -9999.0 END, 6) AS gap_ir,
      ROUND(CASE WHEN total_n != 0 THEN canopy_n / total_n ELSE -9999.0 END, 6) AS gap_rr,
      ROUND(CASE WHEN first_n != 0 THEN first_canopy_n / first_n ELSE -9999.0 END, 6)
        AS gap_fr
    FROM sums
    """
    return sqls

"""Deterministic geo-column derivation shared by Spark and the DuckDB
oracle.

The driver's correctness gate compares our Spark queries against ANSI
SQL run by DuckDB over the same parquet tables (TESTDATA.md). Those
tables carry no spatial columns, so every geospatial query derives
points from ``lineitem`` with integer-exact arithmetic. The SAME
expression strings are used via ``selectExpr`` on the Spark side and
inside a CTE on the DuckDB side — identical inputs, identical IEEE
results, no cross-engine drift.

x, y land in [0, 64): with res=1.0 that is a 64x64 grid, ~15 points per
cell at sf0.01. z = l_quantity (integral doubles -> exact sums).
"""

from __future__ import annotations

# Expressions valid in BOTH Spark SQL and DuckDB.
POINT_EXPRS = (
    # unique row id: (orderkey, linenumber, partkey, suppkey) is unique in
    # the driver testdata; ranges (sf0.1): orderkey<150000, linenumber<=7,
    # partkey<20000, suppkey<1000 -> fits comfortably in int64
    "((l_orderkey * 8 + l_linenumber) * 20000 + l_partkey) * 1000 + l_suppkey AS pid",
    "CAST((l_orderkey * 7919 + l_partkey * 104729 + l_linenumber * 7001) % 64000 AS DOUBLE)"
    " / 1000.0 AS x",
    "CAST((l_orderkey * 104729 + l_suppkey * 7919 + l_linenumber * 9001) % 64000 AS DOUBLE)"
    " / 1000.0 AS y",
    "l_quantity AS z",
    "CAST(l_partkey % 8 AS INTEGER) AS cls",
    "CAST(l_suppkey % 61 - 30 AS INTEGER) AS scan_angle",
    "CAST((l_orderkey * 13 + l_linenumber) % 5 + 1 AS INTEGER) AS return_num",
    "CAST(5 AS INTEGER) AS num_returns",
    "CAST((l_partkey * 17) % 256 AS INTEGER) AS intensity",
    "CAST(l_orderkey % 1000 AS DOUBLE) * 10.0 + CAST(l_linenumber AS DOUBLE) AS gps_time",
)

POINTS_CTE = "SELECT " + ", ".join(POINT_EXPRS) + " FROM lineitem"

# Cell assignment (K1, res=1.0, origin 0, no y-flip) — valid in both.
CELL_EXPRS = (
    "CAST(FLOOR(x) AS BIGINT) AS cell_col",
    "CAST(FLOOR(y) AS BIGINT) AS cell_row",
)


def points_df(spark, sf_dir: str):
    """Derived point table on the Spark side. The testdata parquet is a
    single row group (one scan task), so spread it across the cluster
    before the expression derivation — values are unchanged, DuckDB
    parity unaffected."""
    from geotools_spark.operators.partitioning import spread

    return spread(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ).selectExpr(*POINT_EXPRS)


def cells_df(spark, sf_dir: str):
    return points_df(spark, sf_dir).selectExpr("*", *CELL_EXPRS)

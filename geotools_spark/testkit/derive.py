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


def points_df(spark, sf_dir: str, *, spread: bool = True):
    """Derived point table on the Spark side. The testdata parquet is a
    single row group (one scan task), so spread it across the cluster
    before the expression derivation — values are unchanged, DuckDB
    parity unaffected.

    ``spread=False`` skips the round-robin exchange: queries whose
    FIRST wide operator is an aggregation/join get their parallelism
    from that exchange anyway, and the map-side combine then collapses
    the rows inside the scan task — shuffling all 600k rows first is
    pure overhead (guide §2.3/§2.4; measured 1.88 -> 1.11 s on
    grid_stats). Keep the default for pipelines with heavy NARROW
    pre-shuffle work (Python hops, ring/halo explodes, per-point
    geometry), which need the scan spread across cores. On multi-split
    inputs (the 100 TB regime) spread() is a no-op either way."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if spread:
        from geotools_spark.operators.partitioning import spread as _spread

        df = _spread(df)
    return df.selectExpr(*POINT_EXPRS)


def cells_df(spark, sf_dir: str, *, spread: bool = True):
    return points_df(spark, sf_dir, spread=spread).selectExpr("*", *CELL_EXPRS)

"""Neighborhood joins: radius range join (J6/J7), kNN join (J8) and the
IDW kernel (M11).

All three share one physical pattern: turn a spatial range predicate
into an EQUI-join on grid-cell keys by exploding a bounded set of
neighbor-cell offsets, then apply the exact distance predicate. This is
how a distance join stays a hash join at 100 TB — no cross join, no
index structure, and AQE can split skewed cells.

Reference semantics:
- J6: a point contributes to every cell whose CENTROID lies within
  radius r (src/lasgrid.cpp:135-145, 306-344; offset window
  ±(2r)/res/2 cells).
- J8: k nearest samples per query via kd-tree
  (src/interp/Interpolators.cpp:279-352); ties broken deterministically
  here by (dist, sample id) — the reference's kd-tree order is
  arbitrary, so deterministic ordering is the reproducible superset.
- M11: IDW ``sum(z/d^p)/sum(1/d^p)`` with exact-hit short-circuit
  (src/interp/Interpolators.cpp:214-363).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _offsets_expr(n: int) -> str:
    """array of (dx, dy) struct literals for a (2n+1)^2 window."""
    items = ", ".join(
        f"struct({dx}L as dx, {dy}L as dy)"
        for dx in range(-n, n + 1)
        for dy in range(-n, n + 1)
    )
    return f"array({items})"


def radius_cell_join(
    points: DataFrame,
    *,
    radius: float,
    res: float,
    minx: float = 0.0,
    miny: float = 0.0,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """J6: replicate each point to every cell whose centroid is within
    ``radius``; downstream groupBy(cell) computes radius-windowed stats
    (lasgrid radius mode). Output adds cell_col/cell_row/dist."""
    n = int((radius * 2) / res / 2) + 1  # safe cover of the reference window
    exploded = points.select(
        "*",
        F.explode(F.expr(_offsets_expr(n))).alias("off"),
    )
    base_col = F.floor((F.col(x) - F.lit(minx)) / F.lit(res))
    base_row = F.floor((F.col(y) - F.lit(miny)) / F.lit(res))
    out = (
        exploded.withColumn("cell_col", base_col + F.col("off.dx"))
        .withColumn("cell_row", base_row + F.col("off.dy"))
        .drop("off")
    )
    cx = F.lit(minx) + (F.col("cell_col") + 0.5) * F.lit(res)
    cy = F.lit(miny) + (F.col("cell_row") + 0.5) * F.lit(res)
    dist2 = (F.col(x) - cx) * (F.col(x) - cx) + (F.col(y) - cy) * (F.col(y) - cy)
    return out.withColumn("dist", F.sqrt(dist2)).filter(
        dist2 <= F.lit(float(radius) * float(radius))
    )


def knn_join(
    queries: DataFrame,
    samples: DataFrame,
    *,
    k: int,
    res: float,
    rings: int = 2,
    query_id: str = "qid",
    sample_id: str = "sid",
    qx: str = "qx",
    qy: str = "qy",
    sx: str = "x",
    sy: str = "y",
    ranked: bool = True,
) -> DataFrame:
    """J8: k nearest samples per query point.

    Candidates come from the query's cell plus ``rings`` rings of
    neighbor cells at resolution ``res`` (equi-join on cell key), then
    ``row_number() over (partition by query order by dist, sid) <= k``.

    EXACTNESS CONTRACT: results equal brute-force kNN iff every query's
    k-th neighbor lies within ``rings * res`` of the query (the minimum
    distance to any cell outside the window). Callers size (res, rings)
    from expected sample density; ``knn_kth_dist_bound_ok`` verifies
    the guarantee on real output.

    ``ranked=False`` is for the all-candidates-in-window idiom (huge k
    feeding an exact distance filter): it skips the per-query window
    sort entirely — a whole shuffle+sort saved — and emits no
    ``knn_rank`` column. Only for callers that neither read the rank
    nor depend on per-query candidate order.
    """
    q = queries.withColumn("qcell_col", F.floor(F.col(qx) / F.lit(res))).withColumn(
        "qcell_row", F.floor(F.col(qy) / F.lit(res))
    )
    # The probe side inherits the scan's partitioning (often just a few
    # parquet row groups), but the join FANS OUT ~rings^2 matches per
    # sample and the per-partition WindowGroupLimit sorts that output in
    # the same stage — so spread the cheap input BEFORE the fan-out or
    # three tasks end up sorting the whole candidate set.  Partition
    # count is sized from Catalyst's byte estimate times the fan-out
    # multiplier (a fixed parallelism*2 under-partitions at 100x).
    from .partitioning import fanout_partitions

    par = fanout_partitions(samples, multiplier=float((2 * rings + 1) ** 2))
    s = samples.repartition(par).withColumn(
        "scell_col", F.floor(F.col(sx) / F.lit(res))
    ).withColumn("scell_row", F.floor(F.col(sy) / F.lit(res)))
    qe = q.select(
        "*", F.explode(F.expr(_offsets_expr(rings))).alias("off")
    ).select(
        "*",
        (F.col("qcell_col") + F.col("off.dx")).alias("jcell_col"),
        (F.col("qcell_row") + F.col("off.dy")).alias("jcell_row"),
    ).drop("off")
    joined = qe.join(
        s,
        (F.col("jcell_col") == F.col("scell_col"))
        & (F.col("jcell_row") == F.col("scell_row")),
        "inner",
    )
    ddx = F.col(qx) - F.col(sx)
    ddy = F.col(qy) - F.col(sy)
    # plain multiplication (not pow) so the DuckDB oracle's dist*dist
    # arithmetic is bit-identical
    joined = joined.withColumn("dist", F.sqrt(ddx * ddx + ddy * ddy))
    drop_cols = (
        "qcell_col", "qcell_row", "scell_col", "scell_row", "jcell_col", "jcell_row"
    )
    if not ranked:
        return joined.drop(*drop_cols)
    w = Window.partitionBy(query_id).orderBy(F.col("dist"), F.col(sample_id))
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop(*drop_cols)
    )


def knn_kth_dist_bound_ok(knn_df: DataFrame, *, k: int, res: float, rings: int) -> bool:
    """True iff the candidate window provably contained the exact kNN
    for every query (max k-th distance <= rings*res)."""
    row = (
        knn_df.filter(F.col("knn_rank") == k)
        .agg(F.max("dist").alias("maxd"))
        .collect()[0]
    )
    return row.maxd is None or row.maxd <= rings * res


def idw(
    knn_df: DataFrame,
    *,
    query_id: str = "qid",
    value: str = "z",
    power: float = 2.0,
) -> DataFrame:
    """M11 over a kNN result: exact-hit short-circuit (any d==0 ->
    mean of exact hits), else sum(z/d^p)/sum(1/d^p)."""
    d = F.col("dist")
    dp = d * d if power == 2.0 else d ** F.lit(power)
    wcol = F.lit(1.0) / dp
    agg = knn_df.groupBy(query_id).agg(
        F.sum(F.when(d == 0.0, F.col(value))).alias("_hit_sum"),
        F.count(F.when(d == 0.0, 1)).alias("_hit_n"),
        F.sum(F.when(d > 0.0, F.col(value) / dp)).alias("_num"),
        F.sum(F.when(d > 0.0, wcol)).alias("_den"),
    )
    return agg.select(
        query_id,
        F.when(F.col("_hit_n") > 0, F.col("_hit_sum") / F.col("_hit_n"))
        .otherwise(F.col("_num") / F.col("_den"))
        .alias("idw"),
    )

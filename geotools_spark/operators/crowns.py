"""W9: tree-crown delineation by region growing from treetop seeds
(src/treetops.cpp:279-408), plus the composed 3-stage treetops
pipeline (smooth -> tops -> crowns; reference stages at
src/treetops.cpp:143-148, 150-277, 279-408 with a SpatiaLite table as
the inter-stage IR — here the stages chain as DataFrames).

Semantics reproduced:
- D8 neighbors; accept neighbor cell v iff v is valid, v < node z
  (strict monotone descent), v >= min_height, v / top_z >=
  height_fraction, and squared CELL distance to the top <= radius^2 —
  the reference compares cell deltas against the radius as-is
  (src/treetops.cpp:381-386), so radius is effectively in cells;
  quirk kept (parameter named radius_cells).
- A cell joins at most one crown. The reference assigns contested
  cells by FIFO arrival in its per-strip queue; the Spark rounds are
  synchronous BFS waves, and within a wave contested cells resolve
  deterministically to the smallest top_id (documented deviation —
  affects only equidistant boundary cells between crowns).

Physical shape: bounded frontier iteration — at most
ceil(radius_cells) rounds since each wave advances one cell; each
round is one equi-join frontier x raster + an anti-join against the
assigned set, with localCheckpoint to cut lineage. At 100 TB both
joins key on the cell key and AQE handles the shrinking frontier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D8 = "array(" + ", ".join(
    f"struct({dx}L as dx, {dy}L as dy)"
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    if (dx, dy) != (0, 0)
) + ")"


def tree_crowns(
    raster: DataFrame,
    tops: DataFrame,
    *,
    min_height: float,
    height_fraction: float,
    radius_cells: float,
    value: str = "value",
) -> DataFrame:
    """Grow crowns from ``tops`` (top_id, cell_col, cell_row, z) over
    the smoothed CHM ``raster``. Returns (cell_col, cell_row, top_id)
    for every crown cell (tops included)."""
    r2 = float(radius_cells) * float(radius_cells)
    # materialize the CHM once — the loop would otherwise recompute the
    # entire upstream raster pipeline on every iteration's join
    rast = raster.select(
        F.col("cell_col").alias("ncol"),
        F.col("cell_row").alias("nrow"),
        F.col(value).alias("_v"),
    ).localCheckpoint(eager=True)
    assigned = tops.select(
        "cell_col",
        "cell_row",
        "top_id",
        F.col("z").alias("_z"),
        F.col("cell_col").alias("_tc"),
        F.col("cell_row").alias("_tr"),
        F.col("z").alias("_tz"),
    ).localCheckpoint(eager=True)
    frontier = assigned
    for _ in range(int(math.ceil(radius_cells)) + 1):
        cand = frontier.select(
            "top_id", "_z", "_tc", "_tr", "_tz",
            F.explode(F.expr(_D8)).alias("off"),
            (F.col("cell_col") + F.col("off.dx")).alias("ncol"),
            (F.col("cell_row") + F.col("off.dy")).alias("nrow"),
        ).drop("off")
        dc = F.col("ncol") - F.col("_tc")
        dr = F.col("nrow") - F.col("_tr")
        cand = (
            cand.join(rast, ["ncol", "nrow"], "inner")
            .filter(
                F.col("_v").isNotNull()
                & (F.col("_v") < F.col("_z"))
                & (F.col("_v") >= F.lit(float(min_height)))
                & ((F.col("_v") / F.col("_tz")) >= F.lit(float(height_fraction)))
                & ((dc * dc + dr * dr) <= F.lit(r2))
            )
        )
        # one winner per cell: smallest top_id (deterministic)
        winners = cand.groupBy("ncol", "nrow").agg(
            F.min_by(
                F.struct("top_id", "_v", "_tc", "_tr", "_tz"), F.col("top_id")
            ).alias("w")
        ).select(
            F.col("ncol").alias("cell_col"),
            F.col("nrow").alias("cell_row"),
            F.col("w.top_id").alias("top_id"),
            F.col("w._v").alias("_z"),
            F.col("w._tc").alias("_tc"),
            F.col("w._tr").alias("_tr"),
            F.col("w._tz").alias("_tz"),
        )
        frontier = winners.join(
            assigned.select("cell_col", "cell_row"), ["cell_col", "cell_row"], "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        assigned = assigned.unionByName(frontier).localCheckpoint(eager=True)
    return assigned.select("cell_col", "cell_row", "top_id")


def treetops_pipeline(
    chm: DataFrame,
    *,
    cols: int,
    rows: int,
    smooth_sigma: float = 0.8,
    smooth_size: int = 3,
    tops_window: int = 3,
    min_height: float,
    height_fraction: float = 0.65,
    radius_cells: float = 10.0,
) -> tuple[DataFrame, DataFrame]:
    """The 3-stage reference pipeline: gaussian smooth -> local-maxima
    treetops -> crown growing. Returns (tops, crown_cells)."""
    from geotools_spark.operators.raster import gaussian_smooth, local_maxima

    smoothed = gaussian_smooth(
        chm, sigma=smooth_sigma, size=smooth_size, cols=cols, rows=rows
    ).withColumnRenamed("smoothed", "value")
    tops = local_maxima(
        smoothed, window=tops_window, min_height=min_height, cols=cols, rows=rows
    )
    crowns = tree_crowns(
        smoothed,
        tops,
        min_height=min_height,
        height_fraction=height_fraction,
        radius_cells=radius_cells,
    )
    return tops, crowns

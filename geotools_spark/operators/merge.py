"""U1/A17/S3: point-file union with bounds filter and header stats
(reference: lasmerge — src/lasmerge.cpp:26-130; header recompute also
in lasclip, src/lasclip.cpp:139-196).

The reference concatenates N LAS files, drops points outside the
requested bounds, and rewrites the header with recomputed bounds,
total count, and the counts-by-return histogram (returns 1..5). Spark:
``unionByName`` + a conjunctive range predicate (pushed to the scan)
+ one aggregate row. The histogram is a pivoted conditional count —
pure map-side partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_points(
    dfs: Sequence[DataFrame],
    *,
    bounds: tuple[float, float, float, float] | None = None,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """U1: concatenate point tables; optional 2-D bounds containment
    (src/lasmerge.cpp:82-85 — inclusive min, inclusive max, matching
    Bounds::contains include/util.hpp:135-139)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    if bounds is not None:
        minx, miny, maxx, maxy = bounds
        out = out.filter(
            (F.col(x) >= minx) & (F.col(x) <= maxx)
            & (F.col(y) >= miny) & (F.col(y) <= maxy)
        )
    return out


def header_stats(
    points: DataFrame,
    *,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    return_num: str = "return_num",
    max_returns: int = 5,
) -> DataFrame:
    """A17/S3: one header row — total count, bounds, counts-by-return
    histogram r1..r{max_returns} (src/lasmerge.cpp:68-97)."""
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.min(x).alias("minx"),
        F.max(x).alias("maxx"),
        F.min(y).alias("miny"),
        F.max(y).alias("maxy"),
        F.min(z).alias("minz"),
        F.max(z).alias("maxz"),
    ]
    for r in range(1, max_returns + 1):
        aggs.append(
            F.count(F.when(F.col(return_num) == r, 1)).alias(f"r{r}")
        )
    return points.agg(*aggs)

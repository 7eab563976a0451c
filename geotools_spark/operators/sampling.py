"""Guarded driver-side sample collection.

planar/kriging/natural-neighbour collect their SAMPLE side by contract
(the reference interpolates one tile's samples at a time — e.g.
src/interp/Interpolators.cpp:140-206 builds a sample-sized dense
system), but a mis-use at 100 TB would silently OOM the driver.  The
guard caps the collect with a ``limit(max+1)`` probe — one job, bounded
driver memory, and a clear error instead of an executor-to-driver
flood.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame

#: default cap on driver-collected sample rows (~48 MB of float64 xyz)
MAX_SAMPLE_ROWS = int(os.environ.get("GEOTOOLS_SPARK_MAX_SAMPLE_ROWS", "2000000"))


def collect_capped(
    df: DataFrame, cols, *, max_rows: int | None = None, what: str = "side"
) -> list:
    """Collect ``df[cols]`` to the driver, raising if it exceeds the
    cap BEFORE materializing it all (``limit(cap+1)`` probe — bounded
    driver memory, one job)."""
    cap = MAX_SAMPLE_ROWS if max_rows is None else int(max_rows)
    rows = df.select(*cols).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what} exceeds the driver-collect cap ({cap} rows): this "
            "operator materializes it on the driver by contract; reduce "
            "the side or raise GEOTOOLS_SPARK_MAX_SAMPLE_ROWS explicitly"
        )
    return rows


def collect_sample_xyz(
    samples: DataFrame, cols: tuple[str, str, str], *, max_rows: int | None = None
) -> np.ndarray:
    """Collect (x, y, z) sample rows to the driver, raising if the side
    exceeds ``max_rows`` BEFORE materializing it all."""
    cap = MAX_SAMPLE_ROWS if max_rows is None else int(max_rows)
    rows = samples.select(*cols).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"sample side exceeds the driver-collect cap ({cap} rows): "
            "this operator solves a sample-sized dense system on the "
            "driver by contract; pre-aggregate or tile the samples, or "
            "raise GEOTOOLS_SPARK_MAX_SAMPLE_ROWS explicitly"
        )
    return np.array([[r[0], r[1], r[2]] for r in rows], dtype=np.float64).reshape(-1, 3)

"""M1-M5: the las2csrs datum/epoch transform as a Spark operator.

The reference's existence proof that this math is columnar: it loads
points into three parallel arrays and runs tight loops over them
(src/las2csrs.cpp:560-573). Here the same kernels (NumPy, vectorized)
run inside ``mapInPandas`` — Arrow batches in, Arrow batches out, no
per-row Python. The ~0.7 MB velocity grid rides an explicit Spark
broadcast so a 1000-executor run ships it once per executor, not once
per task.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (API symmetry)

from geotools_spark.functions.transforms import Las2CsrsTransform

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "nad83v6vg.npz")


def load_shift_grid(path: str | None = None):
    """NAD83v6VG velocity grid (NRCAN public product; mm/yr, 3 bands)
    from the packaged fixture — extracted from the public GeoTIFF with
    geotools_spark.sources.tiff (reference loads the same grid via
    GDAL, src/las2csrs.cpp:96-136). The .npz fixture ships with the
    package; if it is absent, a rebuild requires the source GeoTIFF via
    $GEOTOOLS_SPARK_VGRID_TIFF (no hardcoded machine paths), and the
    rebuilt grid is cached best-effort for later sessions."""
    target = path or _DATA
    if not os.path.exists(target):
        source_tiff = os.environ.get("GEOTOOLS_SPARK_VGRID_TIFF")
        if not source_tiff:
            raise FileNotFoundError(
                f"velocity-grid fixture missing at {target} and "
                "GEOTOOLS_SPARK_VGRID_TIFF is not set; point it at a "
                "NAD83v6VG GeoTIFF to rebuild the cache"
            )
        from geotools_spark.sources.tiff import read_strip_tiff

        grid, transform = read_strip_tiff(source_tiff)
        try:
            os.makedirs(os.path.dirname(target), exist_ok=True)
            # atomic publish: concurrent sessions must never observe a
            # half-written zip (np.load would raise BadZipFile)
            tmp = f"{target}.{os.getpid()}.tmp"
            np.savez_compressed(
                tmp, grid=grid.astype(np.float32), transform=np.asarray(transform)
            )
            os.replace(f"{tmp}.npz" if os.path.exists(f"{tmp}.npz") else tmp, target)
        except OSError:
            pass
        return grid.astype(np.float64), tuple(transform)
    with np.load(target) as z:
        return z["grid"].astype(np.float64), tuple(z["transform"])


def las2csrs(
    df: DataFrame,
    *,
    ffrom: str,
    efrom: float,
    eto: float,
    fsrid: int,
    tsrid: int,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    grid_path: str | None = None,
) -> DataFrame:
    """Transform point coordinates from ``ffrom``@``efrom`` (UTM
    ``fsrid``) to NAD83(CSRS)@``eto`` (UTM ``tsrid``), replacing the
    x/y/z columns; all other columns pass through unchanged.

    Matches src/las2csrs.cpp:408-504 within ~1 mm of the NRCAN TRX
    golden cases (tests/test_csrs.py)."""
    spark = df.sparkSession
    grid, gt = load_shift_grid(grid_path)
    bc = spark.sparkContext.broadcast((grid, gt))
    args = dict(ffrom=ffrom, efrom=efrom, eto=eto, fsrid=fsrid, tsrid=tsrid)
    schema = df.schema

    def _transform(batches):
        g, t = bc.value
        tr = Las2CsrsTransform(g, t, **args)
        for pdf in batches:
            xo, yo, zo = tr(
                pdf[x].to_numpy(dtype=np.float64),
                pdf[y].to_numpy(dtype=np.float64),
                pdf[z].to_numpy(dtype=np.float64),
            )
            out = pdf.copy()
            out[x] = xo
            out[y] = yo
            out[z] = zo
            yield out

    return df.mapInPandas(_transform, schema)

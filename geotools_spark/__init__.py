"""geotools_spark — a PySpark-native spatial analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference C++ toolkit ``zxgdll/geotools`` (LiDAR gridding statistics,
zonal statistics, point-in-polygon clipping, kNN interpolation, raster
algebra, mosaicking, hydrological ops) as idiomatic Spark DataFrame
pipelines over an interleaved text+media document table.

Design notes
------------
- Everything is declarative ``pyspark.sql`` — Catalyst/AQE do predicate
  pushdown, column pruning and skew handling; the engine adds only what
  Spark does not give for free: hierarchical cell keys, halo/neighbor
  exchange for focal ops, broadcast geometry kernels, and two-phase
  salted aggregation for hot cells.
- Python touches data only through Arrow-vectorized pandas UDFs
  (never row-at-a-time Python UDFs).
- Exact numeric parity rules of the reference (nodata sentinel -9999,
  n<=1 variance -> 0, ceil-index quantiles, median tie rule) are encoded
  as explicit, tested flags — see ``operators/gridstats.py``.
"""

__version__ = "0.1.0"

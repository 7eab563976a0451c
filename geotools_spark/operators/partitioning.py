"""CPU-aware partitioning for Python-heavy stages.

AQE's partition coalescing sizes post-shuffle partitions by BYTES
(spark.sql.adaptive.advisoryPartitionSizeInBytes). That is the right
call for JVM whole-stage-codegen operators, but it starves stages whose
cost is CPU in a Python worker: a per-cell Delaunay over 600k points is
~25 MB of shuffle data — AQE happily coalesces it to a couple of
partitions and the entire triangulation workload runs on two cores
(measured 2x end-to-end on the bench; the same effect at cluster scale
idles all but a handful of executors).

The fix is declared at the operator, where the cost model is known: an
explicit ``repartition(n, *keys)`` pins a hash partitioning that AQE
does not re-coalesce, and the downstream groupBy recognizes it as
satisfying its required distribution — no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1, *, narrow: bool | None = None) -> DataFrame:
    """Round-robin repartition to cluster parallelism when the input
    arrives in fewer partitions — single-row-group parquet files (and
    any small compacted table) scan as ONE task, and every narrow
    transformation downstream (span explode, expression derivation,
    shuffle write) inherits that. No-op when the source is already
    wide, so a large multi-split scan pays nothing.

    ``narrow`` lets the caller declare the source shape (True: always
    spread, False: never) without a plan probe.  When None, we probe
    ``df.rdd`` — an analysis round-trip, and unavailable under Spark
    Connect, in which case we conservatively spread (the repartition is
    the whole point at small partition counts; a wide source under
    Connect should pass ``narrow=False``)."""
    par = df.sparkSession.sparkContext.defaultParallelism * factor
    if narrow is False:
        return df
    if narrow is None:
        try:
            if df.rdd.getNumPartitions() >= par:
                return df
        except Exception:
            pass  # Spark Connect: no RDD API — fall through and spread
    return df.repartition(par)


def cpu_partition(df: DataFrame, *keys: str, factor: int = 2) -> DataFrame:
    """Hash-repartition on ``keys`` to ``factor`` x cluster parallelism
    so a downstream Python-heavy groupBy runs one task per core with a
    few groups each (straggler slack), regardless of how few bytes the
    shuffle carries."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    if keys:
        from pyspark.sql import functions as F

        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also measures the BASELINE.json headline metric — interleaved-document
spatial-join/tile-assignment throughput (docs/sec) — on the synthetic
input_hint table, and (when SPARK_GRAFT_SCALING=1) the two-parallelism
scaling run used for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _materialize(df) -> int:
    """Force full execution; cheapest full-pipeline action."""
    return df.write.format("noop").mode("overwrite").save() or 0


def flagship_docs_pipeline(spark, n_docs: int):
    """The headline interleaved pipeline: synth docs -> span explode ->
    point decode -> hierarchical cell keys -> grid stats + media tile
    assignment counts."""
    from pyspark.sql import functions as F

    from geotools_spark.functions.cells import with_cell
    from geotools_spark.operators import gridstats
    from geotools_spark.operators.spans import (
        explode_spans,
        parse_media_spans,
        parse_point_spans,
    )
    from geotools_spark.sources.datagen import synthetic_documents

    docs = synthetic_documents(spark, n_docs, partitions=max(spark.sparkContext.defaultParallelism, 4))
    spans = explode_spans(docs)
    pts = with_cell(
        parse_point_spans(spans), minx=0.0, miny=0.0, res=1.0, cols=64, zkey=True
    )
    grid = gridstats.cell_stats(
        pts, value="z", group=("zkey", "cell_col", "cell_row"),
        stats=("count", "min", "max", "mean", "stddev"),
    )
    tiles = parse_media_spans(spans).groupBy("level", "tile_x", "tile_y").agg(
        F.count("*").alias("n_media")
    )
    return grid, tiles


def main() -> None:
    import __spark_entry__ as entry_mod
    from geotools_spark.session import get_spark

    spark = get_spark("geotools-spark-bench")
    timings: dict[str, float] = {}

    # warm the JVM/parquet footer caches outside the timed region
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline docs/sec metric on the interleaved table
    t0 = time.perf_counter()
    grid, tiles = flagship_docs_pipeline(spark, N_BENCH_DOCS)
    _materialize(grid)
    _materialize(tiles)
    flagship_sec = time.perf_counter() - t0
    timings["flagship_interleaved"] = round(flagship_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "docs_per_sec": round(N_BENCH_DOCS / flagship_sec, 1),
        "bench_docs": N_BENCH_DOCS,
        "cores": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.exit(0)

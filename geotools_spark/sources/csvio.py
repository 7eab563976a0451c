"""S8/S9: CSV source/sink (reference: header-driven CSV reader with
quoting, include/csv.hpp:26-139; Util::loadXYZSamples
include/util.hpp:269-274; stats-table CSV sinks
src/pointzonalstats.cpp:567-600, src/rasterstats.cpp:247-266).

Spark's csv datasource already covers the reference's quoting/header
semantics; these wrappers pin the schemas the reference uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xyz_csv(spark: SparkSession, path: str) -> DataFrame:
    """Util::loadXYZSamples: header-driven x,y,z sample file."""
    df = spark.read.csv(path, header=True, inferSchema=False)
    return df.select(
        F.col("x").cast("double"),
        F.col("y").cast("double"),
        F.col("z").cast("double"),
    )


def write_stats_csv(df: DataFrame, path: str) -> None:
    """Stats-table sink (id,cls,count,...,q0..qn) — one header, quoted
    where needed, matching the reference CSV shape."""
    df.write.mode("overwrite").option("header", True).csv(path)

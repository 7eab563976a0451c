"""Physical-plan quality gates: the properties that make the engine
scale are asserted here so they cannot regress silently.

- filters/column pruning reach the parquet scan (PushedFilters /
  ReadSchema),
- small sides broadcast (polygons, zones, segments),
- the grid-aggregation hot path stays inside whole-stage codegen with
  map-side partial aggregation and NO Python (BatchEvalPython /
  ArrowEvalPython absent),
- distributed top-k compiles to TakeOrderedAndProject (no global
  single-partition sort).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from geotools_spark.testkit import derive

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_pruning_reach_parquet_scan(spark):
    pts = derive.points_df(spark, SF).filter(F.col("l_orderkey") % 1 == 0)
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 25.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = formatted(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan
    # column pruning: ReadSchema carries only the two needed columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs


def test_grid_stats_is_pure_jvm_with_partial_agg(spark):
    df = entry_mod.queries()["grid_stats"](spark, SF)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # partial aggregation (map-side combine) before the shuffle; the
    # holistic median forces ObjectHashAggregate (collect_list), which
    # is still JVM-side with partials — codegen is asserted on the
    # algebraic path below
    assert "partial" in plan.lower()
    assert plan.count("Exchange") <= 2  # one shuffle for the agg


def test_algebraic_grid_stats_whole_stage_codegen(spark):
    from geotools_spark.operators.gridstats import cell_stats

    cells = derive.cells_df(spark, SF)
    df = cell_stats(cells, stats=("count", "min", "max", "mean", "variance"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pure algebraic agg: codegen-capable HashAggregate (not the
    # object-based fallback), map-side partials, exactly one shuffle,
    # vectorized parquet scan
    assert "HashAggregate" in plan and "ObjectHashAggregate" not in plan
    assert "partial_" in plan
    # exactly one AGG shuffle (hash on the cell key); the scan-side
    # round-robin spread of the single-row-group input is allowed and
    # must never hash-shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") <= 2
    assert "Batched: true" in plan


def test_pip_join_broadcasts_polygons(spark):
    df = entry_mod.queries()["pip_join"](spark, SF)
    assert "BroadcastHashJoin" in plan_of(df) or "BroadcastNestedLoopJoin" in plan_of(df)


def test_pip_clip_no_unbounded_broadcast(spark):
    # VERDICT r01 #3: the clip must never force a broadcast of the
    # O(points-inside-polygons) hit set.  The current plan has no join
    # on that side at all (dedup on point id); the only broadcast
    # allowed is the small candidate-cells table.
    df = entry_mod.queries()["pip_clip"](spark, SF)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # no semi-join against a hit-id set survives in the plan (the small
    # candidate-cells table keeps its legitimate broadcast Inner join)
    assert "LeftSemi" not in logical, logical
    # the clip is keyed by an aggregation-style dedup on the point id
    assert "Deduplicate" in logical or "Aggregate" in logical


def test_zone_lookup_broadcasts_zones(spark):
    df = entry_mod.queries()["zonal_stats"](spark, SF)
    assert "Broadcast" in plan_of(df)


def test_cosine_topk_uses_take_ordered(spark):
    df = entry_mod.queries()["cosine_topk"](spark, SF)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_salted_agg_two_exchanges_only(spark):
    from geotools_spark.operators.salting import salted_cell_stats

    cells = derive.cells_df(spark, SF)
    df = salted_cell_stats(cells, stats=("count", "mean"), n_salts=8)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    # phase-1 and phase-2 shuffles, nothing more
    assert plan.count("Exchange") <= 3


def test_checkpointed_table_partition_pruning(spark, tmp_path):
    from geotools_spark.plans import lineage

    grid = derive.cells_df(spark, SF).groupBy("cell_col", "cell_row").count()
    grid = grid.withColumn("part_key", (F.col("cell_col") / 16).cast("int"))
    lineage.checkpointed_write(grid, str(tmp_path / "t"), part_col="part_key", run_id="r")
    rd = lineage.read_table(spark, str(tmp_path / "t")).filter(F.col("part_key") == 2)
    plan = formatted(rd)
    # the partition filter lands in PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan
    assert "part_key" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_ivf_probe_scan_hits_partition_filters(spark, tmp_path):
    """The IVF serving scan must prune at file listing: the isin(cell)
    probe filter lands in PartitionFilters on the parquet scan, not in
    a post-scan Filter — at 100 TB this is the difference between
    reading nprobe/nlist of the corpus and reading all of it."""
    from geotools_spark.operators.similarity import build_ivf_index, ivf_probe_scan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(v) for v in emb.filter(F.col("vec_id") == 0).first().embedding]
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, nlist=8)
    cand, probes = ivf_probe_scan(spark, idx, qvec, nprobe=3)
    plan = formatted(cand)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "cell" in pf and "IN" in pf.upper(), pf


def test_flight_segment_derivation_no_single_partition_exchange(spark):
    """The flight-line segment build must never serialize the time
    stream through one reducer: the sessionize windows are partitioned
    by the time bucket, so no Exchange SinglePartition appears."""
    from geotools_spark.operators.reclass import bucketed_time_intervals

    pts = derive.points_df(spark, SF).filter(F.col("cls") == 0)
    plan = plan_of(bucketed_time_intervals(pts, gap=25.0))
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(_b" in plan  # per-bucket windows


def test_exact_dedup_shuffles_on_hash_not_text(spark):
    """exact_dedup's window Exchange must partition on xxhash64(text)
    (8-byte comparator), never on the raw document text — at 100 TB
    the shuffle would otherwise hash/compare multi-KB strings."""
    from geotools_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(exact_dedup(docs))
    import re

    ex = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert ex, plan
    assert "xxhash64(text" in plan  # the key is computed pre-shuffle
    for ln in ex:
        # key is the projected 8-byte long (_w0#..L), never raw text
        m = re.search(r"hashpartitioning\((\w+)#\d+(L?)", ln)
        assert m and m.group(1) != "text" and m.group(2) == "L", ln
    # still JVM-only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_spans_plan_is_jvm_only_with_partial_aggs(spark):
    """Substring dedup must stay in whole-stage codegen: span hashing
    happens in the projection (no Python eval), the (hash, doc) agg is
    partial+final (map-side combine on boilerplate), and no span
    STRINGS reach a shuffle (exchanges carry the xxhash64 longs)."""
    df = entry_mod.queries()["dup_spans"](spark, SF)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial" in plan.lower()
    assert "xxhash64" in plan  # hash computed before the first exchange


def test_pq_ann_plan_is_jvm_only_take_ordered(spark):
    """PQ ANN's serving shape: the encode + ADC scoring is pure JVM
    expression work (no Python eval anywhere), and both the candidate
    cut and the final top-k compile to TakeOrderedAndProject — per-
    partition local top-k, no global single-partition sort."""
    df = entry_mod.queries()["ann_pq"](spark, SF)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "Exchange SinglePartition" not in plan


def test_lsh_ann_join_no_single_partition(spark):
    """Batch ANN join plan: equi-join on bucket id (no cartesian
    product), rank window partitioned by query id — no global
    single-partition stage, no Python eval."""
    df = entry_mod.queries()["ann_lsh_join"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

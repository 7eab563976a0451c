"""Interpolator registry: avg/loess correctness, dispatch, documented
natural-neighbour Sibson properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotools_spark.operators.interpolate import REGISTRY, interpolate


@pytest.fixture(scope="module")
def sampleset(spark):
    rs = np.random.RandomState(21)
    xy = rs.uniform(0, 20, (300, 2))
    z = 3.0 + 0.4 * xy[:, 0] - 0.25 * xy[:, 1]
    rows = [
        (i, float(xy[i, 0]), float(xy[i, 1]), float(z[i])) for i in range(len(xy))
    ]
    return spark.createDataFrame(rows, "sid long, x double, y double, z double")


@pytest.fixture(scope="module")
def queryset(spark):
    return spark.createDataFrame(
        [(0, 5.0, 5.0), (1, 10.0, 10.0), (2, 15.0, 7.0)],
        "qid long, qx double, qy double",
    )


def plane(qx, qy):
    return 3.0 + 0.4 * qx - 0.25 * qy


def test_loess_recovers_plane(spark, sampleset, queryset):
    out = {r.qid: r.value for r in interpolate("loess", queryset, sampleset, bandwidth=4.0, res=2.0).collect()}
    want = {0: plane(5, 5), 1: plane(10, 10), 2: plane(15, 7)}
    for qid, v in out.items():
        assert v == pytest.approx(want[qid], abs=1e-9)  # degree-1 fit is exact on a plane


def test_avg_is_knn_mean(spark, sampleset, queryset):
    from geotools_spark.operators.neighbors import knn_join

    out = {r.qid: r.value for r in interpolate("avg", queryset, sampleset, k=5, res=2.0).collect()}
    knn = knn_join(queryset, sampleset, k=5, res=2.0, rings=2)
    want = {r.qid: r["avg(z)"] for r in knn.groupBy("qid").agg(F.avg("z")).collect()}
    for qid in want:
        assert out[qid] == pytest.approx(want[qid])


def test_idw_and_kriging_dispatch(spark, sampleset, queryset):
    for name in ("idw", "kriging", "planar"):
        out = interpolate(name, queryset, sampleset, res=2.0).collect()
        assert len(out) == 3
        for r in out:
            assert r.value == pytest.approx(plane(*{0: (5, 5), 1: (10, 10), 2: (15, 7)}[r.qid]), abs=1.5)


def test_natural_neighbour_linear_precision(spark, sampleset, queryset):
    # Sibson interpolation has linear precision: exact on a planar field
    # for hull-interior queries (all three queries are interior here).
    out = {r.qid: r.value for r in interpolate("natural_neighbour", queryset, sampleset).collect()}
    want = {0: plane(5, 5), 1: plane(10, 10), 2: plane(15, 7)}
    for qid, v in out.items():
        assert v == pytest.approx(want[qid], abs=1e-9)


def test_natural_neighbour_kernel_properties():
    from geotools_spark.functions.geometry import natural_neighbour

    rs = np.random.RandomState(11)
    xy = rs.uniform(0, 10, (12, 2))
    z = rs.uniform(0, 5, 12)
    s = np.column_stack([xy, z])
    # exactness at sample sites
    vals, loc = natural_neighbour(s, xy)
    assert loc.all() and np.allclose(vals, z)
    # Monte-Carlo pixel-count Sibson oracle at an interior point:
    # old cell = nearest sample, stolen = pixels captured by the query
    qpt = np.array([[5.1, 4.7]])
    v, l = natural_neighbour(s, qpt)
    assert l[0]
    g = np.linspace(0, 10, 801)
    gx, gy = np.meshgrid(g, g)
    p = np.column_stack([gx.ravel(), gy.ravel()])
    dold = ((p[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    owner = dold.argmin(1)
    stolen_mask = ((p - qpt[0]) ** 2).sum(-1) < dold.min(1)
    stolen = np.bincount(owner[stolen_mask], minlength=12).astype(float)
    v_mc = (stolen / stolen.sum()) @ z
    assert v[0] == pytest.approx(v_mc, abs=5e-3)
    # convexity: result within the z-range of the samples
    assert z.min() - 1e-12 <= v[0] <= z.max() + 1e-12
    # hull-exterior queries are unlocated (documented deviation)
    vals_out, loc_out = natural_neighbour(s, np.array([[50.0, 50.0]]))
    assert not loc_out[0] and np.isnan(vals_out[0])


def test_natural_neighbour_mc_oracle_randomized():
    # ADVICE r01 (high): unoriented Delaunay triangles made Sibson
    # stolen-area pieces partially cancel (weights went negative) while
    # the single fixed query point above stayed benign by luck.  Pin the
    # fix with many random configs x random interior query points against
    # the Monte-Carlo pixel-count oracle.
    from geotools_spark.functions.geometry import natural_neighbour

    g = np.linspace(0, 10, 601)
    gx, gy = np.meshgrid(g, g)
    p = np.column_stack([gx.ravel(), gy.ravel()])
    for seed in range(8):
        rs = np.random.RandomState(100 + seed)
        n = rs.randint(8, 25)
        xy = rs.uniform(0, 10, (n, 2))
        z = rs.uniform(0, 5, n)
        s = np.column_stack([xy, z])
        # interior query: perturb the centroid of a random triangle
        qpt = xy[rs.choice(n, 3, replace=False)].mean(axis=0, keepdims=True)
        v, loc = natural_neighbour(s, qpt)
        if not loc[0]:
            continue  # degenerate pick (collinear): hull gate bailed
        dold = ((p[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        owner = dold.argmin(1)
        stolen_mask = ((p - qpt[0]) ** 2).sum(-1) < dold.min(1)
        stolen = np.bincount(owner[stolen_mask], minlength=n).astype(float)
        if stolen.sum() == 0:
            continue
        v_mc = (stolen / stolen.sum()) @ z
        assert v[0] == pytest.approx(v_mc, abs=2e-2), f"seed={seed}"
        # convexity of Sibson weights: value inside the sample z-range
        assert z.min() - 1e-9 <= v[0] <= z.max() + 1e-9, f"seed={seed}"


def test_unknown_name(spark, sampleset, queryset):
    with pytest.raises(ValueError):
        interpolate("cubic", queryset, sampleset)

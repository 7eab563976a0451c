"""lasreclass family: class remap (F7), flight-line assignment (J9),
direction-flip detection (W8) vs a literal transcription of the
reference queue algorithm (src/lasreclass.cpp:163-250)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotools_spark.operators.merge import header_stats, merge_points
from geotools_spark.operators.reclass import (
    assign_flight_line,
    class_remap,
    direction_flip_reclass,
)
from geotools_spark.operators.sessions import merge_intervals


def test_class_remap_identity_when_unmapped(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "cls int")
    out = {r.cls for r in class_remap(df, {1: 11, 3: 2}).collect()}
    assert out == {0, 11, 2, 4, 5}  # 3->2 merges with existing 2


def test_assign_flight_line(spark):
    segs = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 30.0)], "seg_id long, m_start double, m_end double"
    )
    pts = spark.createDataFrame(
        [(0, 5.0), (1, 10.0), (2, 15.0), (3, 20.0)], "pid int, gps_time double"
    )
    out = {r.pid: r.line_id for r in assign_flight_line(pts, segs).collect()}
    assert out == {0: 1, 1: 1, 2: 0, 3: 2}  # inclusive ends, 0 = no line


def test_flight_segments_matches_global_gap_rule(spark):
    """Bucketed derivation == the global sorted-gap rule, including
    sessions that straddle bucket boundaries and duplicate times."""
    from geotools_spark.operators.reclass import flight_segments

    # gap rule 5.0, bucket width 10.0 -> several boundary-straddling runs
    times = [0.0, 1.0, 1.0, 4.0, 8.5, 12.0, 14.0,   # one run across 0/10
             31.0, 33.0,                            # isolated run in bucket 3
             39.0, 41.0, 44.0, 58.0]                # run across 3/4; lone tail
    df = spark.createDataFrame([(t,) for t in times], "gps_time double")
    segs = sorted(
        (r.seg_id, r.m_start, r.m_end)
        for r in flight_segments(df, gap=5.0, bucket_width=10.0).collect()
    )
    # global rule: split where sorted gap > 5.0 (after 14: 17, after 33: 6)
    assert segs == [(1, 0.0, 14.0), (2, 31.0, 33.0), (3, 39.0, 44.0), (4, 58.0, 58.0)]
    # empty input -> empty segment frame with the contract schema
    empty = flight_segments(df.filter("gps_time < -1"), gap=5.0)
    assert empty.count() == 0
    assert empty.schema.simpleString() == (
        "struct<seg_id:bigint,m_start:double,m_end:double>"
    )


def _reference_recover_edges(xs, ys, ts, cls, limit=20, gap=0.4):
    """Literal transcription of recoverEdges (src/lasreclass.cpp:215-250)."""
    from collections import deque

    out = cls.copy()
    pq0, pq1 = deque(), deque()
    last = 0.0

    def direction(q):
        i0, i1 = q[0], q[-1]
        d = math.atan2(ys[i1] - ys[i0], xs[i1] - xs[i0])
        while d < 0:
            d += 2 * math.pi
        while d > 2 * math.pi:
            d -= 2 * math.pi
        return d

    for i in range(len(xs)):
        t = ts[i]
        if last == 0.0:
            last = t
        elif t - last > gap:
            last = t
            pq0.clear()
            pq1.clear()
        pq0.append(i)
        if len(pq0) <= limit:
            continue
        pq1.append(pq0.popleft())
        if len(pq1) == limit:
            if abs(abs(direction(pq0)) - abs(direction(pq1))) > math.pi * 0.75:
                for j in list(pq0) + list(pq1):
                    out[j] = 31
                pq0.clear()
                pq1.clear()
            else:
                pq1.popleft()
    return out


def _flight_path(n=200, flip_at=100):
    """Straight east flight that U-turns west at flip_at."""
    xs, ys, ts = [], [], []
    x = 0.0
    for i in range(n):
        step = 1.0 if i < flip_at else -1.0
        x += step
        xs.append(x)
        ys.append(float(i % 3) * 0.01)
        ts.append(100.0 + i * 0.01)
    return np.array(xs), np.array(ys), np.array(ts)


def test_direction_flip_matches_reference_transcription(spark):
    xs, ys, ts = _flight_path()
    cls = np.ones(len(xs), dtype=int)
    want = _reference_recover_edges(xs, ys, ts, cls)
    rows = [
        (1, float(xs[i]), float(ys[i]), float(ts[i]), 1) for i in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "line_id int, x double, y double, gps_time double, cls int")
    out = direction_flip_reclass(df)
    got = {
        round(r.gps_time, 4): r.cls for r in out.collect()
    }
    assert len(got) == len(xs)
    n31 = 0
    for i in range(len(xs)):
        assert got[round(ts[i], 4)] == want[i], i
        n31 += want[i] == 31
    assert n31 >= 40  # the U-turn was actually flagged


def test_direction_flip_time_gap_resets(spark):
    xs, ys, ts = _flight_path(n=120, flip_at=60)
    ts = ts.copy()
    ts[55:] += 10.0  # gap right before the turn: queues flush, flip masked until refill
    cls = np.ones(len(xs), dtype=int)
    want = _reference_recover_edges(xs, ys, ts, cls)
    rows = [(1, float(xs[i]), float(ys[i]), float(ts[i]), 1) for i in range(len(xs))]
    df = spark.createDataFrame(rows, "line_id int, x double, y double, gps_time double, cls int")
    got = {round(r.gps_time, 4): r.cls for r in direction_flip_reclass(df).collect()}
    for i in range(len(xs)):
        assert got[round(ts[i], 4)] == want[i], i


def test_merge_and_header_stats(spark):
    a = spark.createDataFrame(
        [(0.0, 0.0, 1.0, 1), (5.0, 5.0, 2.0, 2)], "x double, y double, z double, return_num int"
    )
    b = spark.createDataFrame(
        [(9.0, 9.0, 3.0, 1), (20.0, 1.0, 4.0, 5)], "x double, y double, z double, return_num int"
    )
    merged = merge_points([a, b], bounds=(0.0, 0.0, 10.0, 10.0))
    assert merged.count() == 3  # (20,1) outside
    h = header_stats(merged).collect()[0]
    assert h.n_points == 3
    assert (h.minx, h.maxx, h.miny, h.maxy) == (0.0, 9.0, 0.0, 9.0)
    assert (h.r1, h.r2, h.r5) == (2, 1, 0)

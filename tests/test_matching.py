"""Snap-to-nearest-segment map matching (operators/matching.py)."""

import math
import random

import pytest

from open_vector_tile_spark.operators.matching import snap_to_segments


def _py_snap(points, segments, radius, k=1):
    """Brute-force reference: {pid: [(seg_id, t, dist), ...]} (k nearest)."""
    out = {}
    for pid, x, y in points:
        cands = []
        for sid, x1, y1, x2, y2 in segments:
            dx, dy = x2 - x1, y2 - y1
            len2 = dx * dx + dy * dy
            if len2 == 0.0:
                t = 0.0
            else:
                t = min(max(((x - x1) * dx + (y - y1) * dy) / len2, 0.0), 1.0)
            ex, ey = x - (x1 + t * dx), y - (y1 + t * dy)
            d2 = ex * ex + ey * ey
            if d2 <= radius * radius:
                cands.append((d2, sid, t))
        cands.sort()
        if cands:
            out[pid] = [(sid, t, math.sqrt(d2)) for d2, sid, t in cands[:k]]
    return out


def _dfs(spark, points, segments):
    p = spark.createDataFrame(points, "pid long, x double, y double")
    s = spark.createDataFrame(
        segments, "seg_id long, x1 double, y1 double, x2 double, y2 double"
    )
    return p, s


def test_parity_known(spark):
    segments = [(1, 0.0, 0.0, 10.0, 0.0), (2, 0.0, 5.0, 10.0, 5.0)]
    points = [(1, 5.0, 1.0), (2, -3.0, 4.0), (3, 5.0, 2.5), (4, 50.0, 50.0)]
    p, s = _dfs(spark, points, segments)
    got = {
        r["pid"]: (r["seg_id"], r["t"], r["dist"])
        for r in snap_to_segments(p, s, radius=6.0).collect()
    }
    want = {pid: v[0] for pid, v in _py_snap(points, segments, 6.0).items()}
    assert set(got) == set(want) == {1, 2, 3}
    for pid in want:
        assert got[pid][0] == want[pid][0]
        assert got[pid][1] == pytest.approx(want[pid][1], abs=1e-12)
        assert got[pid][2] == pytest.approx(want[pid][2], abs=1e-12)
    # equidistant point snaps to the lower seg_id
    assert got[3][0] == 1


def test_zero_length_segment(spark):
    p, s = _dfs(spark, [(1, 1.0, 1.0)], [(7, 4.0, 5.0, 4.0, 5.0)])
    rows = snap_to_segments(p, s, radius=10.0).collect()
    assert len(rows) == 1
    assert rows[0]["seg_id"] == 7
    assert rows[0]["t"] == 0.0
    assert rows[0]["dist"] == pytest.approx(5.0, abs=1e-12)


@pytest.mark.slow
def test_randomized_parity_and_determinism(spark):
    rng = random.Random(7)
    points = [
        (i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(200)
    ]
    segments = []
    for i in range(40):
        x1, y1 = rng.uniform(0, 100), rng.uniform(0, 100)
        segments.append(
            (i, x1, y1, x1 + rng.uniform(-8, 8), y1 + rng.uniform(-8, 8))
        )
    p, s = _dfs(spark, points, segments)
    for k in (1, 3):
        got = {}
        for r in snap_to_segments(p, s, radius=9.0, k=k).collect():
            got.setdefault(r["pid"], []).append((r["seg_id"], r["t"], r["dist"]))
        want = _py_snap(points, segments, 9.0, k=k)
        assert set(got) == set(want)
        for pid in want:
            ws = want[pid]
            gs = got[pid]
            assert len(gs) == len(ws)
            # driver returns rows unsorted across pids; within pid compare
            # by rank (window emits rank order but collect may interleave)
            gs_sorted = sorted(gs, key=lambda v: (v[2], v[0]))
            for (gsid, gt, gd), (wsid, wt, wd) in zip(gs_sorted, ws):
                assert gsid == wsid
                assert gt == pytest.approx(wt, abs=1e-12)
                assert gd == pytest.approx(wd, abs=1e-12)
    # bit-stable across partitionings
    a = sorted(map(tuple, snap_to_segments(p, s, radius=9.0).collect()))
    b = sorted(
        map(tuple, snap_to_segments(p.repartition(7), s, radius=9.0).collect())
    )
    assert a == b


def test_cover_guard_and_validation(spark):
    p, s = _dfs(spark, [(1, 0.0, 0.0)], [(1, 0.0, 0.0, 1e6, 1e6)])
    with pytest.raises(Exception, match="cover exceeds"):
        snap_to_segments(p, s, radius=1.0, max_cells_per_segment=16).collect()
    with pytest.raises(ValueError):
        snap_to_segments(p, s, radius=0.0)
    with pytest.raises(ValueError):
        snap_to_segments(p, s, radius=1.0, k=0)


def test_shuffle_join_path_matches_broadcast(spark):
    rng = random.Random(3)
    points = [(i, rng.uniform(0, 50), rng.uniform(0, 50)) for i in range(80)]
    segments = [
        (i, rng.uniform(0, 50), rng.uniform(0, 50), rng.uniform(0, 50), rng.uniform(0, 50))
        for i in range(10)
    ]
    p, s = _dfs(spark, points, segments)
    a = sorted(
        map(tuple, snap_to_segments(p, s, radius=60.0, cell_size=20.0).collect())
    )
    b = sorted(
        map(
            tuple,
            snap_to_segments(
                p, s, radius=60.0, cell_size=20.0, broadcast_segments=False
            ).collect(),
        )
    )
    assert a == b

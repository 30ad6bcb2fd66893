"""Segment-intersection self-join: cell prefilter + exact integer predicate."""

from __future__ import annotations

import random

import pytest

from open_vector_tile_spark.operators.geometry import segment_intersection_join


def _py_intersects(s, t):
    (ax, ay, bx, by), (cx, cy, dx, dy) = s, t

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    def on_seg(px, py, qx, qy, rx, ry):
        return min(px, qx) <= rx <= max(px, qx) and min(py, qy) <= ry <= max(py, qy)

    d1 = orient(cx, cy, dx, dy, ax, ay)
    d2 = orient(cx, cy, dx, dy, bx, by)
    d3 = orient(ax, ay, bx, by, cx, cy)
    d4 = orient(ax, ay, bx, by, dx, dy)
    if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
        (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
    ):
        return True
    if d1 == 0 and on_seg(cx, cy, dx, dy, ax, ay):
        return True
    if d2 == 0 and on_seg(cx, cy, dx, dy, bx, by):
        return True
    if d3 == 0 and on_seg(ax, ay, bx, by, cx, cy):
        return True
    if d4 == 0 and on_seg(ax, ay, bx, by, dx, dy):
        return True
    return False


def _run(spark, segs, **kw):
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    return sorted(
        (r.seg_a, r.seg_b) for r in segment_intersection_join(df, **kw).collect()
    )


def _brute(segs):
    return sorted(
        (i, j)
        for i in range(len(segs))
        for j in range(i + 1, len(segs))
        if _py_intersects(segs[i], segs[j])
    )


def test_known_cases(spark):
    segs = [
        (0, 0, 10, 10),   # 0: crosses 1
        (0, 10, 10, 0),   # 1
        (20, 20, 30, 20), # 2: touches 3 at an endpoint
        (30, 20, 30, 30), # 3
        (40, 0, 50, 0),   # 4: collinear overlap with 5
        (45, 0, 60, 0),   # 5
        (100, 100, 101, 101),  # 6: far away, intersects nothing
        (0, 5, 1, 5),     # 7: disjoint from 0/1 despite sharing cell 0
    ]
    assert _run(spark, segs) == _brute(segs) == [(0, 1), (2, 3), (4, 5)]


def test_multi_cell_pair_emitted_once(spark):
    # long parallel-ish crossers spanning many cells with cell_size=4
    segs = [(0, 0, 63, 63), (0, 63, 63, 0), (0, 1, 63, 64)]
    got = _run(spark, segs, cell_size=4)
    assert got == _brute(segs)
    assert len(got) == len(set(got))


@pytest.mark.parametrize("cell_size", [8, 32, 128])
def test_randomized_brute_force_parity(spark, cell_size):
    rng = random.Random(99 + cell_size)
    segs = []
    for _ in range(120):
        x, y = rng.randrange(0, 900), rng.randrange(0, 900)
        segs.append(
            (x, y, x + rng.randrange(0, 60), y + rng.randrange(0, 60))
        )
    # sprinkle degenerate points and axis-aligned / collinear segments
    segs += [(5, 5, 5, 5), (5, 5, 5, 5), (0, 0, 60, 0), (30, 0, 90, 0)]
    assert _run(spark, segs, cell_size=cell_size) == _brute(segs)


def test_partitioning_invariance_and_validation(spark):
    rng = random.Random(7)
    segs = [
        (rng.randrange(0, 300), rng.randrange(0, 300),
         rng.randrange(0, 300), rng.randrange(0, 300))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    one = sorted(map(tuple, segment_intersection_join(df.coalesce(1)).collect()))
    many = sorted(map(tuple, segment_intersection_join(df.repartition(9)).collect()))
    assert one == many == _brute(segs)
    with pytest.raises(ValueError):
        segment_intersection_join(df, cell_size=0)


def test_negative_coordinates_floor_cells(spark):
    """Cell ids must floor (not truncate toward zero): two segments crossing
    at the origin land in cell -1 vs 0 under truncation and the pair is
    silently missed."""
    segs = [(-5, -5, 5, 5), (-5, 5, 5, -5), (-9, -9, -1, -1), (-9, -1, -1, -9)]
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    got = sorted(
        (r.seg_a, r.seg_b)
        for r in segment_intersection_join(df, cell_size=4).collect()
    )
    assert got == _brute(segs)

"""Per-group convex hull (operators/geometry.py group_convex_hull)."""

import random

import pytest

from open_vector_tile_spark.operators.geometry import (
    _hull_chain_np,
    group_convex_hull,
)


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _check_hull(points, hull):
    """Definition-based validation (independent of the chain algorithm):
    hull ⊆ points; strictly convex CCW; every input point inside-or-on."""
    pts = set(points)
    hs = [tuple(v) for v in hull]
    assert set(hs) <= pts
    assert len(set(hs)) == len(hs)
    n = len(hs)
    if n >= 3:
        for i in range(n):
            o, a, b = hs[i], hs[(i + 1) % n], hs[(i + 2) % n]
            assert _cross(o, a, b) > 0  # strict CCW turn at every vertex
        for p in pts:
            for i in range(n):
                a, b = hs[i], hs[(i + 1) % n]
                assert _cross(a, b, p) >= 0  # p left of / on every edge
    elif n == 2:
        a, b = hs
        for p in pts:
            assert _cross(a, b, p) == 0  # all collinear
            assert min(a, b) <= p <= max(a, b)  # p between the extremes
    else:
        assert len(pts) == 1
    # starts at the lexicographically smallest vertex
    if hs:
        assert hs[0] == min(pts)


def test_chain_known_cases():
    # square + interior + collinear edge midpoint + duplicate
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0), (0, 0)]
    hull = [tuple(v) for v in _hull_chain_np([p[0] for p in pts], [p[1] for p in pts])]
    assert hull == [(0, 0), (4, 0), (4, 4), (0, 4)]
    # collinear set -> two extremes
    pts = [(0, 0), (1, 1), (2, 2), (3, 3)]
    hull = [tuple(v) for v in _hull_chain_np([p[0] for p in pts], [p[1] for p in pts])]
    assert hull == [(0, 0), (3, 3)]
    # single (repeated) point
    hull = _hull_chain_np([5, 5], [7, 7])
    assert [tuple(v) for v in hull] == [(5, 7)]


def test_spark_parity_and_prefilter(spark):
    rng = random.Random(31)
    rows = []
    for g in range(6):
        n = [1, 2, 5, 30, 80, 120][g]
        for _ in range(n):
            rows.append((g, float(rng.randint(0, 50)), float(rng.randint(0, 50))))
    # make group 1 collinear
    rows = [r for r in rows if r[0] != 1]
    rows += [(1, float(i), float(2 * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    for pre in (True, False):
        out = group_convex_hull(
            df, group_cols=["g"], prefilter=pre
        ).collect()
        by_g = {}
        for r in sorted(out, key=lambda r: (r["g"], r["vertex_idx"])):
            by_g.setdefault(r["g"], []).append((r["x"], r["y"]))
        for g in {r[0] for r in rows}:
            pts = [(x, y) for gg, x, y in rows if gg == g]
            assert g in by_g, g
            _check_hull(pts, by_g[g])
        # prefilter and plain paths agree exactly
        if pre:
            ref = by_g
        else:
            assert by_g == ref


def test_spark_matches_chain_reference(spark):
    rng = random.Random(37)
    rows = [
        (0, float(rng.randint(-20, 20)), float(rng.randint(-20, 20)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g int, x double, y double").repartition(8)
    out = sorted(
        group_convex_hull(df, group_cols=["g"]).collect(),
        key=lambda r: r["vertex_idx"],
    )
    got = [(r["x"], r["y"]) for r in out]
    want = [tuple(v) for v in _hull_chain_np([r[1] for r in rows], [r[2] for r in rows])]
    assert got == want


def test_validation(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0)], "g int, x double, y double")
    with pytest.raises(ValueError):
        group_convex_hull(df, group_cols=[])


def test_null_group_key_kept_both_paths(spark):
    rows = [(None, 0.0, 0.0), (None, 3.0, 1.0), (None, 1.0, 4.0), (0, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    for pre in (True, False):
        out = group_convex_hull(df, group_cols=["g"], prefilter=pre).collect()
        groups = {r["g"] for r in out}
        assert groups == {None, 0}, pre
        assert sum(1 for r in out if r["g"] is None) == 3

"""Douglas–Peucker + pixel-collapse simplification (operators/simplify.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from open_vector_tile_spark.operators.simplify import (
    collapse_quantized,
    simplify_dp_np,
    simplify_ring_np,
)


def _dp_reference(pts, tol):
    """Textbook recursive Douglas–Peucker, segment distance, scalar."""
    pts = [tuple(p) for p in pts]

    def seg_dist2(p, a, b):
        ax, ay, bx, by = a[0], a[1], b[0], b[1]
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        if l2 == 0:
            return (p[0] - ax) ** 2 + (p[1] - ay) ** 2
        t = max(0.0, min(1.0, ((p[0] - ax) * dx + (p[1] - ay) * dy) / l2))
        qx, qy = ax + t * dx, ay + t * dy
        return (p[0] - qx) ** 2 + (p[1] - qy) ** 2

    def rec(i, j):
        if j <= i + 1:
            return []
        dmax, k = -1.0, -1
        for m in range(i + 1, j):
            d = seg_dist2(pts[m], pts[i], pts[j])
            if d > dmax:
                dmax, k = d, m
        if dmax > tol * tol:
            return rec(i, k) + [k] + rec(k, j)
        return []

    keep = sorted([0, len(pts) - 1] + rec(0, len(pts) - 1))
    return [pts[k] for k in keep]


def test_dp_collinear_removed():
    line = np.array([[0, 0], [1, 0], [2, 0], [3, 0], [4, 0]], dtype=float)
    out = simplify_dp_np(line, 0.01)
    assert [tuple(v) for v in out] == [(0, 0), (4, 0)]


def test_dp_keeps_significant_corner():
    line = np.array([[0, 0], [2, 3], [4, 0]], dtype=float)
    out = simplify_dp_np(line, 1.0)
    assert len(out) == 3


def test_dp_tolerance_sweep():
    line = np.array([[0, 0], [1, 0.4], [2, 0], [3, 2.0], [4, 0]], dtype=float)
    # tol 0.5: the 0.4 bump goes, the 2.0 spike stays
    out = simplify_dp_np(line, 0.5)
    assert (3.0, 2.0) in {tuple(v) for v in out}
    assert (1.0, 0.4) not in {tuple(v) for v in out}


def test_dp_matches_reference_randomized():
    rng = np.random.default_rng(5)
    for _ in range(200):
        n = int(rng.integers(2, 30))
        pts = rng.uniform(0, 10, size=(n, 2))
        tol = float(rng.uniform(0.1, 3.0))
        got = [tuple(v) for v in simplify_dp_np(pts, tol)]
        assert got == _dp_reference(pts, tol)


def test_dp_extra_columns_ride_along():
    line = np.array([[0, 0, 10], [1, 0, 20], [2, 0, 30], [3, 3, 40]], dtype=float)
    out = simplify_dp_np(line, 0.1)
    assert [tuple(v) for v in out] == [(0, 0, 10), (2, 0, 30), (3, 3, 40)] or [
        tuple(v) for v in out
    ] == [(0, 0, 10), (3, 3, 40)]


def test_ring_simplify_square_with_noise():
    # square with a tiny mid-edge wiggle: wiggle goes, corners stay
    ring = np.array(
        [[0, 0], [5, 0.05], [10, 0], [10, 10], [0, 10]], dtype=float
    )
    out = simplify_ring_np(ring, 0.5)
    assert {tuple(v) for v in out} == {(0, 0), (10, 0), (10, 10), (0, 10)}


def test_ring_collapse_below_3_empty():
    ring = np.array([[0, 0], [10, 0.01], [20, 0]], dtype=float)
    assert len(simplify_ring_np(ring, 1.0)) == 0


def test_featurizer_simplify_px(spark):
    from open_vector_tile_spark.operators.tiler import lines_to_features_dist

    # a z2 line with collinear interior vertices (in lon space, roughly
    # collinear in mercator too at equator-ish latitudes)
    lines = pd.DataFrame(
        [{"line_id": 1,
          "xy": [0.0, 0.0, 2.0, 0.0, 4.0, 0.0, 6.0, 0.0, 8.0, 0.0, 10.0, 20.0]}]
    )
    sdf = spark.createDataFrame(lines)
    plain = lines_to_features_dist(sdf, zoom=2, layer="r", props_cols=[]).toPandas()
    simp = lines_to_features_dist(
        sdf, zoom=2, layer="r", props_cols=[], simplify_px=2.0
    ).toPandas()
    assert all(rl[0] == 6 for rl in plain.ring_lens)
    assert all(rl[0] == 3 for rl in simp.ring_lens)  # ends + the corner
    # endpoints survive exactly
    for g_plain, g_simp in zip(plain.geom_xy, simp.geom_xy):
        assert list(g_plain[:2]) == list(g_simp[:2])
        assert list(g_plain[-2:]) == list(g_simp[-2:])


def test_featurizer_simplify_and_clip_compose(spark):
    from open_vector_tile_spark.operators.tiler import lines_to_features_dist

    lines = pd.DataFrame(
        [{"line_id": 1,
          "xy": [-120.0, -40.0, -60.0, -39.9, 0.0, -40.0, 60.0, 0.0, 100.0, 55.0]}]
    )
    sdf = spark.createDataFrame(lines)
    out = lines_to_features_dist(
        sdf, zoom=3, layer="r", props_cols=[], clip_buffer=64, simplify_px=8.0
    ).toPandas()
    assert len(out) > 0
    lo, hi = -64, 4096 + 64
    for g in out.geom_xy:
        assert min(g) >= lo and max(g) <= hi


def test_featurizer_polygon_simplify(spark):
    from open_vector_tile_spark.operators.tiler import polygons_to_features_dist

    # square with dense collinear edge samples
    xs = [0.0, 10.0, 20.0, 30.0, 40.0]
    ring = []
    for x in xs:
        ring += [x, 0.0]
    ring += [40.0, 40.0, 0.0, 40.0, 0.0, 0.0]
    polys = pd.DataFrame([{"poly_id": 1, "ring_xy": [ring]}])
    sdf = spark.createDataFrame(polys)
    plain = polygons_to_features_dist(sdf, zoom=1, layer="p", props_cols=[]).toPandas()
    simp = polygons_to_features_dist(
        sdf, zoom=1, layer="p", props_cols=[], simplify_px=4.0
    ).toPandas()
    assert all(rl[0] > 4 for rl in plain.ring_lens)
    assert all(rl[0] == 4 for rl in simp.ring_lens)


def test_collapse_quantized(spark):
    pdf = pd.DataFrame(
        {
            "gid": [1, 1, 1, 1, 2, 2],
            "k": [0, 1, 2, 3, 0, 1],
            "px": [5, 5, 5, 6, 1, 1],
            "py": [7, 7, 8, 8, 2, 2],
        }
    )
    out = (
        collapse_quantized(spark.createDataFrame(pdf), ["gid"], "k")
        .orderBy("gid", "k")
        .toPandas()
    )
    assert list(zip(out.gid, out.k)) == [(1, 0), (1, 2), (1, 3), (2, 0)]

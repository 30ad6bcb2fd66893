"""Clipping kernels vs plain scalar references (operators/clip.py)."""

from __future__ import annotations

import numpy as np
import pytest

from open_vector_tile_spark.operators.clip import (
    clip_polyline_np,
    clip_ring_np,
    clip_rings_np,
)

RECT = (2.0, 3.0, 10.0, 9.0)


def _sh_reference(ring, xmin, ymin, xmax, ymax):
    """Textbook scalar Sutherland–Hodgman (per-vertex Python loop)."""
    def clip_plane(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            if inside(cur):
                out.append(cur)
            if inside(cur) != inside(nxt):
                out.append(intersect(cur, nxt))
        return out

    def ix(p, q, axis, bound):
        t = (bound - p[axis]) / (q[axis] - p[axis])
        return tuple(p[k] + t * (q[k] - p[k]) for k in range(len(p)))

    pts = [tuple(v) for v in ring]
    for axis, bound, keep_le in (
        (0, xmin, False), (0, xmax, True), (1, ymin, False), (1, ymax, True)
    ):
        if not pts:
            return []
        if keep_le:
            pts = clip_plane(pts, lambda p: p[axis] <= bound,
                             lambda p, q: ix(p, q, axis, bound))
        else:
            pts = clip_plane(pts, lambda p: p[axis] >= bound,
                             lambda p, q: ix(p, q, axis, bound))
    # dedupe consecutive (incl. wraparound) like the kernel
    dedup = []
    for p in pts:
        if not dedup or p[:2] != dedup[-1][:2]:
            dedup.append(p)
    if len(dedup) > 2 and dedup[0][:2] == dedup[-1][:2]:
        dedup.pop()
    return dedup


def test_ring_fully_inside_unchanged():
    ring = np.array([[3, 4], [8, 4], [8, 8], [3, 8]], dtype=float)
    out = clip_ring_np(ring, *RECT)
    assert np.array_equal(out, ring)


def test_ring_fully_outside_empty():
    ring = np.array([[20, 20], [30, 20], [30, 30]], dtype=float)
    assert len(clip_ring_np(ring, *RECT)) == 0


def test_ring_overlapping_matches_reference():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = rng.integers(3, 12)
        ring = rng.uniform(-5, 18, size=(int(n), 2))
        got = clip_ring_np(ring, *RECT)
        want = _sh_reference(ring, *RECT)
        assert [tuple(v) for v in got] == want


def test_ring_extra_columns_interpolate():
    # square straddling xmax=10; z column must interpolate linearly
    ring = np.array([[8, 4, 100], [12, 4, 300], [12, 8, 300], [8, 8, 100]], dtype=float)
    out = clip_ring_np(ring, *RECT)
    assert set(map(tuple, out[:, :2])) == {(8, 4), (10, 4), (10, 8), (8, 8)}
    for x, _y, z in out:
        assert z == pytest.approx(100 + (x - 8) / 4 * 200)


def test_clip_rings_outer_gone_drops_holes():
    outer = np.array([[20, 20], [30, 20], [30, 30]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6]], dtype=float)
    assert clip_rings_np([outer, hole], *RECT) == []


def test_clip_rings_hole_clipped_independently():
    outer = np.array([[0, 0], [20, 0], [20, 20], [0, 20]], dtype=float)
    hole = np.array([[8, 2, ], [12, 2], [12, 12], [8, 12]], dtype=float)
    out = clip_rings_np([outer, hole], *RECT)
    assert len(out) == 2
    assert set(map(tuple, out[0])) == {(2, 3), (10, 3), (10, 9), (2, 9)}
    assert set(map(tuple, out[1])) == {(8, 3), (10, 3), (10, 9), (8, 9)}


def _polyline_reference(line, xmin, ymin, xmax, ymax):
    """Scalar Liang–Barsky per segment + part stitching.  Stitching is
    PARAMETRIC (prev t1 == 1 and this t0 == 0 means both segments touch the
    shared original vertex), matching the kernel — clipped-coordinate
    equality would spuriously split on fl(p + (q-p)) != q rounding."""
    def clip_seg(p, q):
        t0, t1 = 0.0, 1.0
        for axis, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
            d = q[axis] - p[axis]
            if d == 0:
                if not (lo <= p[axis] <= hi):
                    return None
            else:
                ta, tb = (lo - p[axis]) / d, (hi - p[axis]) / d
                t0, t1 = max(t0, min(ta, tb)), min(t1, max(ta, tb))
        if t0 > t1:
            return None
        c1 = tuple(p) if t0 == 0.0 else tuple(
            p[k] + t0 * (q[k] - p[k]) for k in range(len(p))
        )
        c2 = tuple(q) if t1 == 1.0 else tuple(
            p[k] + t1 * (q[k] - p[k]) for k in range(len(p))
        )
        return c1, c2, t0, t1

    parts, cur = [], []
    prev_t1 = None
    for i in range(len(line) - 1):
        r = clip_seg(tuple(line[i]), tuple(line[i + 1]))
        if r is None:
            prev_t1 = None
            continue
        c1, c2, t0, t1 = r
        if prev_t1 == 1.0 and t0 == 0.0 and cur:
            cur.append(c2)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [c1, c2]
        prev_t1 = t1
    if len(cur) >= 2:
        parts.append(cur)
    return parts


def test_polyline_inside_one_part():
    line = np.array([[3, 4], [5, 5], [9, 8]], dtype=float)
    parts = clip_polyline_np(line, *RECT)
    assert len(parts) == 1
    assert np.array_equal(parts[0], line)


def test_polyline_exit_reenter_two_parts():
    # crosses out the right edge and comes back
    line = np.array([[8, 4], [14, 4], [14, 8], [8, 8]], dtype=float)
    parts = clip_polyline_np(line, *RECT)
    assert len(parts) == 2
    assert [tuple(v) for v in parts[0]] == [(8, 4), (10, 4)]
    assert [tuple(v) for v in parts[1]] == [(10, 8), (8, 8)]


def test_polyline_fully_outside():
    line = np.array([[20, 20], [30, 30]], dtype=float)
    assert clip_polyline_np(line, *RECT) == []


def test_polyline_random_matches_reference():
    rng = np.random.default_rng(11)
    for _ in range(300):
        n = rng.integers(2, 15)
        line = rng.uniform(-5, 18, size=(int(n), 2))
        got = clip_polyline_np(line, *RECT)
        want = _polyline_reference(line, *RECT)
        assert [[tuple(v) for v in p] for p in got] == want


def test_polyline_z_interpolates():
    line = np.array([[8, 4, 0], [14, 4, 600]], dtype=float)
    (part,) = clip_polyline_np(line, *RECT)
    assert [tuple(v) for v in part] == [(8, 4, 0), (10, 4, 200)]


# ---------------------------------------------------------------------------
# Spark integration: clip_buffer in the distributed featurizers
# ---------------------------------------------------------------------------

import json

import pandas as pd

from open_vector_tile_spark.operators.tiler import (
    encode_tiles,
    lines_to_features_dist,
    polygons_to_features_dist,
)


def _merc(lon, lat, zoom):
    import math

    n = 1 << zoom
    s = math.sin(math.radians(lat))
    return (
        (lon + 180.0) / 360.0 * n,
        (0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)) * n,
    )


def test_lines_clip_bounds_and_tile_pruning(spark):
    # long diagonal crossing many z3 tiles; bbox covers tiles the line misses
    lines = pd.DataFrame(
        [{"line_id": 1, "xy": [-120.0, -40.0, 100.0, 55.0], "road": "d"}]
    )
    sdf = spark.createDataFrame(lines)
    unclipped = lines_to_features_dist(
        sdf, zoom=3, layer="r", extent=4096, props_cols=["road"]
    ).toPandas()
    clipped = lines_to_features_dist(
        sdf, zoom=3, layer="r", extent=4096, props_cols=["road"], clip_buffer=64
    ).toPandas()
    t_un = set(zip(unclipped.tile_x, unclipped.tile_y))
    t_cl = set(zip(clipped.tile_x, clipped.tile_y))
    assert t_cl < t_un  # strictly fewer tiles: bbox-only tiles pruned
    lo, hi = -64, 4096 + 64
    for g in clipped.geom_xy:
        assert min(g) >= lo and max(g) <= hi
    # encodes fine
    feats = lines_to_features_dist(
        sdf, zoom=3, layer="r", extent=4096, props_cols=["road"], clip_buffer=64
    )
    tiles = encode_tiles(feats).collect()
    assert len(tiles) == len(t_cl)


def test_lines_clip_offsets_exact(spark):
    # horizontal line at the equator from lon -135 to 45 at zoom 2:
    # mercator-x tile units 0.5 -> 2.5, y = 2.0 exactly
    lines = pd.DataFrame([{"line_id": 7, "xy": [-135.0, 0.0, 45.0, 0.0]}])
    out = lines_to_features_dist(
        spark.createDataFrame(lines), zoom=2, layer="r", extent=4096,
        props_cols=[], clip_buffer=0,
    ).toPandas().set_index("tile_x")
    assert sorted(out.index) == [0, 1, 2]
    assert out.loc[0, "offsets"] is None  # part starts at line start
    assert list(out.loc[1, "offsets"]) == [pytest.approx(0.5 * 4096)]
    assert list(out.loc[2, "offsets"]) == [pytest.approx(1.5 * 4096)]
    # clipped x spans inside each tile
    assert list(out.loc[1, "geom_xy"]) == [0, 0, 4096, 0]


def test_lines_clip_exit_reenter_multiline(spark):
    # U-shape leaves tile through the east edge and re-enters: 2 parts
    lines = pd.DataFrame(
        [{"line_id": 3, "xy": [-170.0, 10.0, -30.0, 10.0, -30.0, 40.0, -170.0, 40.0]}]
    )
    out = lines_to_features_dist(
        spark.createDataFrame(lines), zoom=2, layer="r", extent=4096,
        props_cols=[], clip_buffer=0,
    ).toPandas()
    west = out[(out.tile_x == 0)]
    assert all(len(r) == 2 for r in west.ring_lens)


def test_polygons_clip_area_partition(spark):
    # clip_buffer=0 partitions the polygon across tiles: tile-local shoelace
    # areas (in tile units) must sum to the mercator area of the original
    polys = pd.DataFrame(
        [{"poly_id": 1,
          "ring_xy": [[-100.0, -30.0, 80.0, -30.0, 80.0, 45.0, -100.0, 45.0, -100.0, -30.0]],
          "zone": "big"}]
    )
    out = polygons_to_features_dist(
        spark.createDataFrame(polys), zoom=3, layer="p", extent=4096,
        props_cols=["zone"], clip_buffer=0,
    ).toPandas()

    def shoelace(xs, ys):
        s = 0.0
        n = len(xs)
        for i in range(n):
            j = (i + 1) % n
            s += xs[i] * ys[j] - xs[j] * ys[i]
        return abs(s) / 2.0

    total = 0.0
    for g in out.geom_xy:
        xs = [v / 4096.0 for v in g[0::2]]
        ys = [v / 4096.0 for v in g[1::2]]
        total += shoelace(xs, ys)
    corners = [(-100.0, -30.0), (80.0, -30.0), (80.0, 45.0), (-100.0, 45.0)]
    mx = [_merc(lo, la, 3)[0] for lo, la in corners]
    my = [_merc(lo, la, 3)[1] for lo, la in corners]
    assert total == pytest.approx(shoelace(mx, my), rel=2e-3)
    # every tile's geometry stays in [0, extent] at buffer 0
    for g in out.geom_xy:
        assert min(g) >= 0 and max(g) <= 4096


def test_polygons_clip_hole_survives(spark):
    polys = pd.DataFrame(
        [{"poly_id": 2,
          "ring_xy": [
              [-80.0, -40.0, 80.0, -40.0, 80.0, 40.0, -80.0, 40.0, -80.0, -40.0],
              [-20.0, -10.0, -20.0, 10.0, 20.0, 10.0, 20.0, -10.0, -20.0, -10.0],
          ]}]
    )
    out = polygons_to_features_dist(
        spark.createDataFrame(polys), zoom=1, layer="p", extent=4096,
        props_cols=[], clip_buffer=0,
    ).toPandas()
    # the hole straddles the antimeridian-free center: each of the 4 z1
    # tiles gets outer + clipped hole
    assert len(out) == 4
    assert all(len(rl) == 2 for rl in out.ring_lens)


def test_clip_with_mvals_raises(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame([{"line_id": 1, "xy": [0.0, 0.0, 1.0, 1.0], "mv": "[]"}])
    )
    with pytest.raises(ValueError, match="M-values"):
        lines_to_features_dist(
            sdf, zoom=2, layer="r", mvals_json_col="mv", clip_buffer=8
        )
    sdfp = spark.createDataFrame(
        pd.DataFrame([{"poly_id": 1, "ring_xy": [[0.0, 0.0, 1.0, 0.0, 1.0, 1.0]], "mv": "[]"}])
    )
    with pytest.raises(ValueError, match="M-values"):
        polygons_to_features_dist(
            sdfp, zoom=2, layer="p", mvals_json_col="mv", clip_buffer=8
        )


def test_clip_noop_when_inside_matches_unclipped(spark):
    # geometry entirely inside one tile: clipping must be a byte-level no-op
    lines = pd.DataFrame([{"line_id": 5, "xy": [1.0, 1.0, 9.0, 9.0, 15.0, 3.0]}])
    sdf = spark.createDataFrame(lines)
    a = lines_to_features_dist(sdf, zoom=2, layer="r", props_cols=[]).toPandas()
    b = lines_to_features_dist(
        sdf, zoom=2, layer="r", props_cols=[], clip_buffer=256
    ).toPandas()
    assert [list(g) for g in a.geom_xy] == [list(g) for g in b.geom_xy]
    assert [list(r) for r in a.ring_lens] == [list(r) for r in b.ring_lens]

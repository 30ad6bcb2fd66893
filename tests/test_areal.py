"""areal_interpolate: exact rectangle overlaps, triangle halves, scalar
Sutherland-Hodgman reference parity, weight normalization property."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.clip import areal_interpolate


def _clip_ref(ring, xmin, ymin, xmax, ymax):
    """Independent SCALAR Sutherland-Hodgman (loop-based, not the numpy
    kernel under test)."""
    def clip_plane(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            if inside(cur):
                out.append(cur)
                if not inside(nxt):
                    out.append(intersect(cur, nxt))
            elif inside(nxt):
                out.append(intersect(cur, nxt))
        return out

    def ix(c, n, bound, axis):
        t = (bound - c[axis]) / (n[axis] - c[axis])
        return (
            c[0] + t * (n[0] - c[0]),
            c[1] + t * (n[1] - c[1]),
        )

    pts = [tuple(map(float, p)) for p in ring]
    for axis, lo in ((0, True), (0, False), (1, True), (1, False)):
        bound = {(0, True): xmin, (0, False): xmax, (1, True): ymin, (1, False): ymax}[(axis, lo)]
        if lo:
            pts = clip_plane(pts, lambda p: p[axis] >= bound, lambda c, n: ix(c, n, bound, axis))
        else:
            pts = clip_plane(pts, lambda p: p[axis] <= bound, lambda c, n: ix(c, n, bound, axis))
        if not pts:
            return 0.0
    n = len(pts)
    if n < 3:
        return 0.0
    return abs(sum(pts[i][0] * pts[(i + 1) % n][1] - pts[(i + 1) % n][0] * pts[i][1] for i in range(n))) / 2


def _run(spark, rows, cell_size=4):
    df = spark.createDataFrame(rows, ["poly_id", "xs", "ys", "value"])
    out = areal_interpolate(df, cell_size=cell_size).collect()
    return {
        (r["poly_id"], r["cell_x"], r["cell_y"]): (r["area"], r["weight"], r["alloc"])
        for r in out
    }


def test_rectangle_exact_split(spark):
    # 6x2 rect from (1,1): cells (0,0) and (1,0) at cell_size 4
    rows = [(0, [1, 7, 7, 1], [1, 1, 3, 3], 10.0)]
    got = _run(spark, rows)
    assert set(got) == {(0, 0, 0), (0, 1, 0)}
    a00 = got[(0, 0, 0)]
    a10 = got[(0, 1, 0)]
    assert a00[0] == 6.0 and a10[0] == 6.0  # 3x2 each
    assert a00[1] == pytest.approx(0.5) and a00[2] == pytest.approx(5.0)


def test_triangle_halves(spark):
    # right triangle (0,0)-(8,0)-(0,8) across four 4x4 cells
    rows = [(1, [0, 8, 0], [0, 0, 8], 32.0)]
    got = _run(spark, rows)
    areas = {k[1:]: v[0] for k, v in got.items()}
    assert areas == {(0, 0): 16.0, (1, 0): 8.0, (0, 1): 8.0}
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0)
    assert sum(v[2] for v in got.values()) == pytest.approx(32.0)


def test_matches_scalar_reference_randomized(spark):
    rng = np.random.default_rng(97)
    rows = []
    refs = {}
    for i in range(40):
        n = int(rng.integers(3, 7))
        # star-shaped (convex-ish) random polygon around a random center
        cx_, cy_ = rng.uniform(0, 16, 2)
        angs = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(1, 6, n)
        xs = [float(v) for v in cx_ + rad * np.cos(angs)]
        ys = [float(v) for v in cy_ + rad * np.sin(angs)]
        rows.append((i, xs, ys, 1.0))
        refs[i] = (xs, ys)
    got = _run(spark, rows)
    for (pid, cx, cy), (area, _, _) in got.items():
        ring = list(zip(*refs[pid]))
        want = _clip_ref(ring, cx * 4, cy * 4, (cx + 1) * 4, (cy + 1) * 4)
        assert area == pytest.approx(want, rel=1e-9), (pid, cx, cy)
    # and no overlapped cell is missing: every positive-area ref cell exists
    for pid, (xs, ys) in refs.items():
        ring = list(zip(xs, ys))
        for cx in range(int(min(xs) // 4), int(max(xs) // 4) + 1):
            for cy in range(int(min(ys) // 4), int(max(ys) // 4) + 1):
                want = _clip_ref(ring, cx * 4, cy * 4, (cx + 1) * 4, (cy + 1) * 4)
                if want > 1e-9:
                    assert (pid, cx, cy) in got, (pid, cx, cy)


def test_weights_sum_to_one(spark):
    rows = [(0, [1, 9, 9, 1], [1, 1, 9, 9], 7.0), (1, [2, 5, 5, 2], [2, 2, 3, 3], 3.0)]
    got = _run(spark, rows)
    for pid in (0, 1):
        assert sum(v[1] for k, v in got.items() if k[0] == pid) == pytest.approx(1.0)


def test_outside_and_degenerate(spark):
    rows = [
        (0, [100, 104, 104, 100], [100, 100, 104, 104], 1.0),  # far cell only
        (1, [0, 5], [0, 0], 1.0),  # degenerate: no area anywhere
    ]
    got = _run(spark, rows)
    assert all(k[0] == 0 for k in got)
    assert got[(0, 25, 25)][0] == 16.0


def test_validation(spark):
    df = spark.createDataFrame([(0, [0, 1, 1], [0, 0, 1], 1.0)], ["poly_id", "xs", "ys", "value"])
    with pytest.raises(ValueError):
        areal_interpolate(df, cell_size=0)

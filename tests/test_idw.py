"""IDW surface interpolation (operators/gridding.py idw_grid)."""

import math
import random

import pytest

from open_vector_tile_spark.operators.gridding import idw_grid


def _py_idw(pts, cell_size, radius):
    cells = set()
    for x, y, _ in pts:
        for gx in range(
            math.floor((x - radius) / cell_size - 0.5),
            math.floor((x + radius) / cell_size + 0.5) + 1,
        ):
            for gy in range(
                math.floor((y - radius) / cell_size - 0.5),
                math.floor((y + radius) / cell_size + 0.5) + 1,
            ):
                cells.add((gx, gy))
    out = {}
    for gx, gy in cells:
        cx, cy = (gx + 0.5) * cell_size, (gy + 0.5) * cell_size
        inr = [
            (x, y, v)
            for x, y, v in pts
            if (x - cx) ** 2 + (y - cy) ** 2 <= radius * radius
        ]
        if not inr:
            continue
        exact = [v for x, y, v in inr if (x - cx) ** 2 + (y - cy) ** 2 == 0.0]
        if exact:
            est = min(exact)
        else:
            swv = sum(sorted(v / ((x - cx) ** 2 + (y - cy) ** 2) for x, y, v in inr))
            sw = sum(sorted(1.0 / ((x - cx) ** 2 + (y - cy) ** 2) for x, y, v in inr))
            est = swv / sw
        out[(gx, gy)] = (len(inr), est)
    return out


def _run(spark, pts, **kw):
    df = spark.createDataFrame(pts, "x double, y double, value double")
    return {
        (r["gx"], r["gy"]): (r["n_pts"], r["est"])
        for r in idw_grid(df, **kw).collect()
    }


def test_known_surface(spark):
    pts = [(0.0, 0.0, 10.0), (4.0, 0.0, 20.0)]
    got = _run(spark, pts, cell_size=2.0, radius=3.0)
    want = _py_idw(pts, 2.0, 3.0)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    # cell (0,0) center (1,1): p1 at d2=2, p2 at d2=10 > r^2 -> only p1
    assert got[(0, 0)] == (1, pytest.approx(10.0))
    # cell (1,-1) center (3,-1): d2 to p1 = 10 (out), to p2 = 2 -> only p2
    assert got[(1, -1)] == (1, pytest.approx(20.0))


def test_exact_hit_short_circuit(spark):
    # point exactly at cell center (1.0, 1.0) for cell_size 2 -> cell (0,0)
    pts = [(1.0, 1.0, 42.0), (1.5, 1.0, 99.0), (1.0, 1.0, 41.0)]
    got = _run(spark, pts, cell_size=2.0, radius=2.0)
    assert got[(0, 0)][1] == 41.0  # min of exact-tie values


def test_randomized_parity_and_determinism(spark):
    rng = random.Random(43)
    pts = [
        (rng.uniform(0, 30), rng.uniform(0, 30), float(rng.randint(1, 100)))
        for _ in range(150)
    ]
    got = _run(spark, pts, cell_size=3.0, radius=5.0)
    want = _py_idw(pts, 3.0, 5.0)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        # sorted folds in both -> bit-exact
        assert got[k][1] == want[k][1], k
    df = spark.createDataFrame(pts, "x double, y double, value double")
    a = sorted(map(tuple, idw_grid(df, cell_size=3.0, radius=5.0).collect()))
    b = sorted(
        map(
            tuple,
            idw_grid(df.repartition(7), cell_size=3.0, radius=5.0).collect(),
        )
    )
    assert a == b


def test_guards(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0)], "x double, y double, value double")
    with pytest.raises(ValueError):
        idw_grid(df, cell_size=0.0, radius=1.0)
    with pytest.raises(ValueError):
        idw_grid(df, cell_size=1.0, radius=0.0)
    with pytest.raises(Exception, match="cover exceeds"):
        idw_grid(df, cell_size=0.001, radius=10.0, max_cells_per_point=100).collect()

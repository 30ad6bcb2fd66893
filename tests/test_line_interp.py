"""Point-along-line interpolation (operators/geometry.py line_interpolate)."""

import math
import random

import pytest

from open_vector_tile_spark.operators.geometry import line_interpolate


def _py_interp(xs, ys, fraction):
    """Scalar reference mirroring the windowed formulation: sequential
    cumulative lengths, first segment with cum >= target and len > 0."""
    if not xs:
        return (None, None, 0.0)
    lens, cums = [], []
    c = 0.0
    for i in range(len(xs) - 1):
        l = math.sqrt((xs[i + 1] - xs[i]) ** 2 + (ys[i + 1] - ys[i]) ** 2)
        lens.append(l)
        c = c + l
        cums.append(c)
    total = max(cums) if cums else 0.0
    target = fraction * total
    for i, (l, cum) in enumerate(zip(lens, cums)):
        if cum >= target and l > 0.0:
            t = (target - (cum - l)) / l
            return (
                xs[i] + t * (xs[i + 1] - xs[i]),
                ys[i] + t * (ys[i + 1] - ys[i]),
                total,
            )
    return (xs[0], ys[0], 0.0)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "line_id long, xs array<double>, ys array<double>"
    )


def test_known_cases(spark):
    rows = [
        (1, [0.0, 10.0], [0.0, 0.0]),                  # simple: midpoint at 5
        (2, [0.0, 4.0, 4.0], [0.0, 0.0, 3.0]),         # L-shape, total 7
        (3, [0.0, 2.0, 2.0, 6.0], [0.0, 0.0, 0.0, 0.0]),  # zero-length middle seg
        (4, [5.0], [7.0]),                             # single vertex
        (5, [3.0, 3.0, 3.0], [4.0, 4.0, 4.0]),         # all-duplicate
        (6, [], []),                                   # empty
    ]
    got = {
        r["line_id"]: (r["x"], r["y"], r["total_len"])
        for r in line_interpolate(_df(spark, rows), fraction=0.5).collect()
    }
    assert got[1] == (5.0, 0.0, 10.0)
    assert got[2] == (3.5, 0.0, 7.0)       # 3.5 along the first leg
    assert got[3] == (3.0, 0.0, 6.0)       # skips the zero-length segment
    assert got[4] == (5.0, 7.0, 0.0)
    assert got[5] == (3.0, 4.0, 0.0)
    assert got[6][0] is None and got[6][1] is None


def test_endpoint_fractions(spark):
    rows = [(1, [1.0, 4.0, 4.0], [1.0, 1.0, 5.0])]
    df = _df(spark, rows)
    a = line_interpolate(df, fraction=0.0).collect()[0]
    b = line_interpolate(df, fraction=1.0).collect()[0]
    assert (a["x"], a["y"]) == (1.0, 1.0)
    assert (b["x"], b["y"]) == (4.0, 5.0)


@pytest.mark.slow
def test_randomized_parity_and_determinism(spark):
    rng = random.Random(21)
    rows = []
    for i in range(150):
        n = rng.randint(0, 8)
        xs = [rng.uniform(-50, 50) for _ in range(n)]
        ys = [rng.uniform(-50, 50) for _ in range(n)]
        if n >= 3 and i % 4 == 0:  # inject duplicate vertices
            xs[1], ys[1] = xs[0], ys[0]
        rows.append((i, xs, ys))
    df = _df(spark, rows)
    for frac in (0.0, 0.35, 1.0):
        got = {
            r["line_id"]: (r["x"], r["y"], r["total_len"])
            for r in line_interpolate(df, fraction=frac).collect()
        }
        for i, xs, ys in rows:
            wx, wy, wt = _py_interp(xs, ys, frac)
            gx, gy, gt = got[i]
            if wx is None:
                assert gx is None and gy is None
            else:
                # bit-exact: identical sequential IEEE chains
                assert gx == wx and gy == wy and gt == wt, (i, frac)
    a = sorted(map(tuple, line_interpolate(df, fraction=0.35).collect()))
    b = sorted(
        map(tuple, line_interpolate(df.repartition(7), fraction=0.35).collect())
    )
    assert a == b


def test_validation(spark):
    df = _df(spark, [(1, [0.0], [0.0])])
    with pytest.raises(ValueError):
        line_interpolate(df, fraction=-0.1)
    with pytest.raises(ValueError):
        line_interpolate(df, fraction=1.5)


def test_ragged_arrays_fail_loudly(spark):
    df = _df(spark, [(1, [0.0, 1.0, 2.0], [0.0, 0.0])])
    with pytest.raises(Exception, match="ragged"):
        line_interpolate(df, fraction=0.5).collect()

"""fix_winding: python-reference parity, orientation/closure/dup repairs,
hole convention, degenerate and empty rings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.geometry import fix_winding


def _ref(xs, ys, hole=False, outer_positive=True):
    pts = list(zip(xs, ys))
    n0 = len(pts)
    if len(pts) >= 2 and pts[-1] == pts[0]:
        pts = pts[:-1]
    clean = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    n = len(clean)
    area2 = sum(
        clean[i][0] * clean[(i + 1) % n][1] - clean[(i + 1) % n][0] * clean[i][1]
        for i in range(n)
    ) if n else 0
    degenerate = len(set(clean)) < 3
    want_pos = outer_positive != hole
    wrong = area2 < 0 if want_pos else area2 > 0
    rev = (not degenerate) and wrong
    fixed = clean[::-1] if rev else clean
    return (
        [p[0] for p in fixed],
        [p[1] for p in fixed],
        -area2 if rev else area2,
        rev,
        n0 - n,
        degenerate,
    )


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["id", "xs", "ys", "hole"])
    out = fix_winding(df, hole_col="hole" if kw.pop("use_hole", False) else None, **kw)
    return {
        r["id"]: (
            list(r["xs_fixed"]),
            list(r["ys_fixed"]),
            r["area2"],
            r["reversed"],
            r["n_dropped"],
            r["degenerate"],
        )
        for r in out.collect()
    }


def test_ccw_kept_cw_reversed(spark):
    ccw = (0, [0, 4, 4, 0], [0, 0, 3, 3], False)
    cw = (1, [0, 0, 4, 4], [0, 3, 3, 0], False)
    got = _run(spark, [ccw, cw])
    assert got[0] == ([0, 4, 4, 0], [0, 0, 3, 3], 24, False, 0, False)
    assert got[1] == ([4, 4, 0, 0], [0, 3, 3, 0], 24, True, 0, False)


def test_closure_and_consecutive_dups_dropped(spark):
    rows = [(0, [0, 4, 4, 4, 0, 0], [0, 0, 0, 3, 3, 0], False)]
    got = _run(spark, rows)
    xs, ys, a2, rev, dropped, deg = got[0]
    assert dropped == 2  # one dup vertex + one explicit closure
    assert a2 == 24 and not rev and not deg
    assert (xs, ys) == ([0, 4, 4, 0], [0, 0, 3, 3])


def test_hole_convention_opposite(spark):
    # CCW ring as a hole must be reversed; CW hole kept
    rows = [
        (0, [0, 4, 4, 0], [0, 0, 3, 3], True),
        (1, [0, 0, 4, 4], [0, 3, 3, 0], True),
    ]
    got = _run(spark, rows, use_hole=True)
    assert got[0][3] is True and got[0][2] == -24
    assert got[1][3] is False and got[1][2] == -24


def test_outer_positive_false_flips_convention(spark):
    rows = [(0, [0, 4, 4, 0], [0, 0, 3, 3], False)]
    got = _run(spark, rows, outer_positive=False)
    assert got[0][3] is True and got[0][2] == -24


def test_degenerate_and_empty(spark):
    rows = [
        (0, [5], [5], False),
        (1, [0, 1], [0, 0], False),
        (2, [0, 1, 1, 0], [0, 0, 0, 0], False),  # collinear, area 0
        (3, [], [], False),
    ]
    got = _run(spark, rows)
    for i in (0, 1, 2, 3):
        assert got[i][3] is False  # never reversed
    assert got[0][5] and got[1][5] and got[2][5] and got[3][5]
    assert got[2][2] == 0
    assert got[3] == ([], [], 0, False, 0, True)


def test_matches_reference_randomized(spark):
    rng = np.random.default_rng(53)
    rows = []
    for i in range(80):
        n = int(rng.integers(1, 9))
        xs = [int(v) for v in rng.integers(-5, 6, n)]
        ys = [int(v) for v in rng.integers(-5, 6, n)]
        if rng.random() < 0.3 and n >= 2:
            xs.append(xs[0]); ys.append(ys[0])
        if rng.random() < 0.3:
            j = int(rng.integers(0, len(xs)))
            xs.insert(j, xs[j]); ys.insert(j, ys[j])
        rows.append((i, xs, ys, bool(rng.random() < 0.3)))
    got = _run(spark, rows, use_hole=True)
    for i, xs, ys, hole in rows:
        assert got[i] == _ref(xs, ys, hole=hole), (i, xs, ys, hole)

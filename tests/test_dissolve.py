"""dissolve_boundary vs a pure-python edge-parity reference."""

from __future__ import annotations

import random

from open_vector_tile_spark.operators.geometry import dissolve_boundary


def _square(x, y, closed=False, cw=False):
    xs = [x, x + 1, x + 1, x]
    ys = [y, y, y + 1, y + 1]
    if cw:
        xs, ys = xs[::-1], ys[::-1]
    if closed:
        xs, ys = xs + [xs[0]], ys + [ys[0]]
    return xs, ys


def _ref_boundary(squares):
    """squares: [(x, y)] -> set of canonical boundary edges."""
    from collections import Counter

    c = Counter()
    for x, y in squares:
        vs = [(x, y), (x + 1, y), (x + 1, y + 1), (x, y + 1)]
        for i in range(4):
            a, b = vs[i], vs[(i + 1) % 4]
            c[tuple(sorted([a, b]))] += 1
    return {e for e, n in c.items() if n == 1}


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g int, xs array<int>, ys array<int>")
    out = dissolve_boundary(df, ["g"]).collect()
    res = {}
    for r in out:
        res.setdefault(r["g"], set()).add(
            ((r["x1"], r["y1"]), (r["x2"], r["y2"]))
        )
    return res


def test_single_and_adjacent_squares(spark):
    rows = [
        (1, *_square(0, 0)),
        (2, *_square(0, 0)), (2, *_square(1, 0)),
    ]
    got = _run(spark, rows)
    assert got[1] == _ref_boundary([(0, 0)])
    assert len(got[1]) == 4
    assert got[2] == _ref_boundary([(0, 0), (1, 0)])
    assert len(got[2]) == 6  # shared edge cancelled


def test_block_and_hole(spark):
    block = [(x, y) for x in range(2) for y in range(2)]
    ring = [(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)]
    rows = [(1, *_square(x, y)) for x, y in block] + [
        (2, *_square(x, y)) for x, y in ring
    ]
    got = _run(spark, rows)
    assert got[1] == _ref_boundary(block)
    assert len(got[1]) == 8
    assert got[2] == _ref_boundary(ring)
    assert len(got[2]) == 16  # 12 outer + 4 hole edges


def test_closed_ring_and_winding_invariance(spark):
    rows = [
        (1, *_square(0, 0, closed=True)),
        (1, *_square(1, 0, cw=True)),
    ]
    got = _run(spark, rows)
    assert got[1] == _ref_boundary([(0, 0), (1, 0)])


def test_randomized_matches_reference(spark):
    rng = random.Random(13)
    rows = []
    want = {}
    for g in range(6):
        cells = {
            (rng.randrange(0, 7), rng.randrange(0, 5))
            for _ in range(rng.randrange(3, 18))
        }
        want[g] = _ref_boundary(cells)
        rows += [(g, *_square(x, y)) for x, y in cells]
    got = _run(spark, rows)
    assert got == want


def test_degenerate_rings_ignored(spark):
    rows = [
        (1, [5], [5]),            # single vertex
        (1, [2, 2], [3, 3]),      # zero-length edge only
        (1, *_square(0, 0)),
    ]
    got = _run(spark, rows)
    assert got[1] == _ref_boundary([(0, 0)])

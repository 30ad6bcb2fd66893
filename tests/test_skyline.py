"""Skyline: brute-force reference parity, duplicates kept, payload
passthrough, repartition invariance."""

import numpy as np
import pytest

from open_vector_tile_spark.operators.skyline import skyline


def _ref(rows, k):
    out = []
    for i, r in enumerate(rows):
        v = r[-k:]
        dominated = any(
            all(u <= w for u, w in zip(o[-k:], v))
            and any(u < w for u, w in zip(o[-k:], v))
            for j, o in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(r)
    return sorted(out)


def _run(spark, rows, k, npart=None):
    cols = ["id"] + [f"c{i}" for i in range(k)]
    df = spark.createDataFrame(rows, cols)
    if npart:
        df = df.repartition(npart)
    return sorted(tuple(r) for r in skyline(df, cols[1:]).collect())


def test_simple_2d(spark):
    rows = [(0, 1, 9), (1, 5, 5), (2, 9, 1), (3, 6, 6), (4, 1, 9)]
    got = _run(spark, rows, 2)
    # (3) dominated by (1); duplicate (0)/(4) both kept
    assert got == sorted([(0, 1, 9), (1, 5, 5), (2, 9, 1), (4, 1, 9)])


def test_matches_bruteforce_randomized(spark):
    rng = np.random.default_rng(13)
    for k in (2, 3):
        rows = [
            tuple([i] + [int(v) for v in rng.integers(0, 12, k)])
            for i in range(120)
        ]
        got = _run(spark, rows, k, npart=7)
        assert got == _ref(rows, k), k


def test_repartition_invariance_and_validation(spark):
    rng = np.random.default_rng(29)
    rows = [
        (i, int(rng.integers(0, 20)), int(rng.integers(0, 20))) for i in range(80)
    ]
    assert _run(spark, rows, 2, 2) == _run(spark, rows, 2, 13)
    df = spark.createDataFrame(rows, ["id", "c0", "c1"])
    with pytest.raises(ValueError):
        skyline(df, [])

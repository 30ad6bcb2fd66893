"""Hausdorff trajectory-similarity join: brute-force parity, directed
asymmetry, prefilter losslessness, guards, partition invariance."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.matching import hausdorff_join


def _brute(tracks, t):
    """All-pairs symmetric Hausdorff (exact; min/max over exact squared
    integer distances, same sqrt chain as the operator)."""

    def h2(a, b):
        return max(min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in b) for ax, ay in a)

    out = {}
    ids = sorted(tracks)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            hab2 = h2(tracks[ia], tracks[ib])
            hba2 = h2(tracks[ib], tracks[ia])
            if max(hab2, hba2) <= t * t:
                out[(ia, ib)] = (
                    math.sqrt(float(hab2)),
                    math.sqrt(float(hba2)),
                    math.sqrt(float(max(hab2, hba2))),
                )
    return out


def _run(spark, tracks, t, **kw):
    rows = [
        (tid, float(x), float(y)) for tid, pts in tracks.items() for x, y in pts
    ]
    df = spark.createDataFrame(rows, ["track_id", "x", "y"])
    got = hausdorff_join(df, max_dist=t, **kw).collect()
    return {
        (r["id_a"], r["id_b"]): (r["h_ab"], r["h_ba"], r["hausdorff"]) for r in got
    }


@pytest.mark.slow
def test_hausdorff_matches_bruteforce_randomized(spark):
    rng = np.random.default_rng(17)
    tracks = {}
    for tid in range(24):
        cx, cy = rng.integers(0, 120, 2)
        n = int(rng.integers(3, 12))
        tracks[tid] = [
            (int(cx + dx), int(cy + dy))
            for dx, dy in rng.integers(-6, 7, (n, 2))
        ]
    for t in (4.0, 9.0, 20.0):
        assert _run(spark, tracks, t) == _brute(tracks, t)


def test_hausdorff_directed_asymmetry(spark):
    # A is a sub-track of B: every a is ON b (h_ab = 0), but B wanders far
    tracks = {0: [(0, 0), (1, 0)], 1: [(0, 0), (1, 0), (7, 0)]}
    got = _run(spark, tracks, 10.0)
    h_ab, h_ba, h = got[(0, 1)]
    assert h_ab == 0.0 and h_ba == 6.0 and h == 6.0


def test_hausdorff_single_point_tracks(spark):
    tracks = {0: [(0, 0)], 1: [(3, 4)], 2: [(100, 100)]}
    got = _run(spark, tracks, 5.0)
    assert got == {(0, 1): (5.0, 5.0, 5.0)}


def test_hausdorff_validation_and_cover_guard(spark):
    tracks = {0: [(0, 0), (100000, 100000)], 1: [(0, 1)]}
    with pytest.raises(ValueError):
        _run(spark, tracks, 0.0)
    with pytest.raises(ValueError):
        _run(spark, tracks, 5.0, cell_size=1.0)
    with pytest.raises(Exception, match="max_cover"):
        _run(spark, tracks, 5.0, max_cover=4)


def test_hausdorff_repartition_invariant(spark):
    rng = np.random.default_rng(23)
    rows = [
        (int(tid), float(rng.integers(0, 40)), float(rng.integers(0, 40)))
        for tid in range(15)
        for _ in range(6)
    ]
    df = spark.createDataFrame(rows, ["track_id", "x", "y"])
    a = sorted(map(tuple, hausdorff_join(df, max_dist=12.0).collect()))
    b = sorted(
        map(
            tuple,
            hausdorff_join(df.repartition(13, "x"), max_dist=12.0).collect(),
        )
    )
    assert a == b

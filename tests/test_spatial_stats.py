"""Moran's I / Geary's C: textbook-formula parity, sign behavior on
clustered vs alternating surfaces, degenerate lattices, invariance."""

import math
import random

import pytest


def _py_stats(cells):
    """Float textbook formulas (mean-centered), plus the exact-moment
    assembly the operator uses — both returned for cross-checks."""
    vals = {(x, y): v for x, y, v in cells}
    n = len(vals)
    xs = list(vals.values())
    mean = sum(xs) / n
    b_var = sum((v - mean) ** 2 for v in xs)
    pairs = [
        (vi, vals[(x + dx, y + dy)])
        for (x, y), vi in vals.items()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        if (x + dx, y + dy) in vals
    ]
    w = len(pairs)
    if n <= 1 or w == 0 or b_var == 0:
        return n, w, None, None, None
    num = sum((vi - mean) * (vj - mean) for vi, vj in pairs)
    morans = (n / w) * num / b_var
    geary = (n - 1) * sum((vi - vj) ** 2 for vi, vj in pairs) / (2 * w * b_var)
    return n, w, morans, geary, -1.0 / (n - 1)


def _run(spark, cells):
    from open_vector_tile_spark.operators.spatial_stats import (
        spatial_autocorrelation,
    )

    df = spark.createDataFrame(cells, "gx LONG, gy LONG, v LONG")
    return spatial_autocorrelation(df).collect()[0]


class TestAutocorrelation:
    def test_checkerboard_is_dispersed(self, spark):
        cells = [(x, y, (x + y) % 2 * 10) for x in range(6) for y in range(6)]
        r = _run(spark, cells)
        n, w, mi, gc, ei = _py_stats(cells)
        assert (r["n_cells"], r["w_pairs"]) == (n, w)
        assert r["morans_i"] == pytest.approx(mi, abs=1e-12)
        assert r["gearys_c"] == pytest.approx(gc, abs=1e-12)
        assert r["morans_i"] < r["expected_i"] and r["gearys_c"] > 1

    def test_gradient_is_clustered(self, spark):
        cells = [(x, y, x * 5 + y) for x in range(6) for y in range(6)]
        r = _run(spark, cells)
        n, w, mi, gc, ei = _py_stats(cells)
        assert r["morans_i"] == pytest.approx(mi, abs=1e-12)
        assert r["gearys_c"] == pytest.approx(gc, abs=1e-12)
        assert r["morans_i"] > 0 and r["gearys_c"] < 1

    @pytest.mark.parametrize("seed", [0, 1])
    def test_randomized_parity(self, spark, seed):
        rng = random.Random(seed)
        cells = [
            (x, y, rng.randint(0, 50))
            for x in range(8)
            for y in range(8)
            if rng.random() < 0.7
        ]
        r = _run(spark, cells)
        n, w, mi, gc, ei = _py_stats(cells)
        assert (r["n_cells"], r["w_pairs"]) == (n, w)
        if mi is None:
            assert r["morans_i"] is None
        else:
            assert r["morans_i"] == pytest.approx(mi, rel=1e-12)
            assert r["gearys_c"] == pytest.approx(gc, rel=1e-12)
            assert r["expected_i"] == pytest.approx(ei, rel=1e-12)

    def test_constant_surface_undefined(self, spark):
        cells = [(x, y, 7) for x in range(3) for y in range(3)]
        r = _run(spark, cells)
        assert r["morans_i"] is None and r["gearys_c"] is None

    def test_isolated_cells_no_pairs(self, spark):
        cells = [(0, 0, 1), (5, 5, 2), (10, 0, 3)]
        r = _run(spark, cells)
        assert r["w_pairs"] == 0 and r["morans_i"] is None

    def test_single_cell(self, spark):
        r = _run(spark, [(0, 0, 42)])
        assert r["n_cells"] == 1 and r["morans_i"] is None

    def test_repartition_invariance(self, spark):
        from open_vector_tile_spark.operators.spatial_stats import (
            spatial_autocorrelation,
        )

        rng = random.Random(3)
        cells = [(x, y, rng.randint(0, 9)) for x in range(7) for y in range(7)]
        df = spark.createDataFrame(cells, "gx LONG, gy LONG, v LONG")
        a = spatial_autocorrelation(df).collect()[0]
        b = spatial_autocorrelation(df.repartition(9)).collect()[0]
        assert a == b


def _py_gi(cells):
    vals = {(x, y): v for x, y, v in cells}
    n = len(vals)
    sx = sum(vals.values())
    sxx = sum(v * v for v in vals.values())
    xbar = float(sx) / n
    s2 = float(sxx) / n - xbar * xbar
    s = math.sqrt(max(s2, 0.0))
    out = {}
    for (x, y), v in vals.items():
        hood = [
            vals[(x + dx, y + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (x + dx, y + dy) in vals
        ]
        wi, gi = len(hood), sum(hood)
        den = s * math.sqrt(float(n * wi - wi * wi) / (n - 1)) if n > 1 else 0.0
        z = (float(gi) - xbar * wi) / den if den > 0.0 else None
        out[(x, y)] = (v, wi, gi, z)
    return out


class TestGetisOrd:
    def test_hotspot_detected(self, spark):
        from open_vector_tile_spark.operators.spatial_stats import getis_ord_gi

        # flat field with one 3x3 spike block
        cells = [
            (x, y, 50 if 3 <= x <= 5 and 3 <= y <= 5 else 1)
            for x in range(9)
            for y in range(9)
        ]
        df = spark.createDataFrame(cells, "gx LONG, gy LONG, v LONG")
        got = {(r["gx"], r["gy"]): r for r in getis_ord_gi(df).collect()}
        want = _py_gi(cells)
        assert set(got) == set(want)
        for k, (v, wi, gi, z) in want.items():
            r = got[k]
            assert (r["v"], r["w_i"], r["g_i"]) == (v, wi, gi)
            if z is None:
                assert r["z"] is None
            else:
                assert r["z"] == pytest.approx(z, rel=1e-12)
        # the spike centre is the hottest cell
        assert max(got.values(), key=lambda r: r["z"])["gx"] == 4
        assert got[(4, 4)]["z"] > 2.0

    @pytest.mark.parametrize("seed", [0, 1])
    def test_randomized_parity(self, spark, seed):
        from open_vector_tile_spark.operators.spatial_stats import getis_ord_gi

        rng = random.Random(seed)
        cells = [
            (x, y, rng.randint(0, 30))
            for x in range(8)
            for y in range(8)
            if rng.random() < 0.8
        ]
        df = spark.createDataFrame(cells, "gx LONG, gy LONG, v LONG")
        got = {(r["gx"], r["gy"]): (r["v"], r["w_i"], r["g_i"], r["z"])
               for r in getis_ord_gi(df).collect()}
        want = _py_gi(cells)
        for k in want:
            gv, gw, gg, gz = got[k]
            wv, ww, wg, wz = want[k]
            assert (gv, gw, gg) == (wv, ww, wg)
            assert gz == pytest.approx(wz, rel=1e-12)

    def test_constant_surface_null_z(self, spark):
        from open_vector_tile_spark.operators.spatial_stats import getis_ord_gi

        cells = [(x, y, 5) for x in range(3) for y in range(3)]
        df = spark.createDataFrame(cells, "gx LONG, gy LONG, v LONG")
        assert all(r["z"] is None for r in getis_ord_gi(df).collect())

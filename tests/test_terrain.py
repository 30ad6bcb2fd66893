"""Terrain derivatives (Horn slope + analytic hillshade): bit-exact parity
with a scalar python reference, physical sanity (flat/tilted planes), and
interior-only semantics around grid holes."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.gridding import terrain_derivatives


def _ref(cells, cellsize=1.0, z_factor=1.0, azimuth_deg=315.0, altitude_deg=45.0):
    """Scalar reference with the SAME fixed double chain as the operator."""
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    lx = math.cos(alt) * math.sin(az)
    ly = math.cos(alt) * math.cos(az)
    lz = math.sin(alt)
    denom = 8.0 * cellsize / z_factor
    zmap = {(x, y): z for x, y, z in cells}
    out = {}
    for (x, y) in zmap:
        try:
            px8 = (
                (zmap[(x + 1, y - 1)] + 2 * zmap[(x + 1, y)] + zmap[(x + 1, y + 1)])
                - (zmap[(x - 1, y - 1)] + 2 * zmap[(x - 1, y)] + zmap[(x - 1, y + 1)])
            )
            py8 = (
                (zmap[(x - 1, y + 1)] + 2 * zmap[(x, y + 1)] + zmap[(x + 1, y + 1)])
                - (zmap[(x - 1, y - 1)] + 2 * zmap[(x, y - 1)] + zmap[(x + 1, y - 1)])
            )
        except KeyError:
            continue  # not interior
        p = float(px8) / denom
        q = float(py8) / denom
        slope = math.sqrt(p * p + q * q)
        hs = ((lz - p * lx) - q * ly) / math.sqrt((1.0 + p * p) + q * q)
        out[(x, y)] = (p, q, slope, int(math.floor(255.0 * max(0.0, hs) + 0.5)))
    return out


def _run(spark, cells, **kw):
    df = spark.createDataFrame(
        [(int(x), int(y), int(z)) for x, y, z in cells], ["gx", "gy", "elev"]
    )
    rows = terrain_derivatives(df, **kw).collect()
    return {
        (r["x"], r["y"]): (r["p"], r["q"], r["slope"], r["hillshade"]) for r in rows
    }


def test_terrain_matches_python_reference_bit_exact(spark):
    rng = np.random.default_rng(5)
    cells = [
        (x, y, int(rng.integers(0, 900))) for x in range(12) for y in range(10)
    ]
    got = _run(spark, cells)
    want = _ref(cells)
    assert set(got) == set(want)
    assert len(got) == 10 * 8  # interior of a 12x10 grid
    for k in want:
        assert got[k] == want[k], k  # doubles bit-equal, shade int equal


def test_terrain_flat_grid_constant_shade(spark):
    cells = [(x, y, 250) for x in range(6) for y in range(6)]
    got = _run(spark, cells)
    shade = int(math.floor(255.0 * math.sin(math.radians(45.0)) + 0.5))
    for p, q, slope, hs in got.values():
        assert p == 0.0 and q == 0.0 and slope == 0.0
        assert hs == shade


def test_terrain_sun_facing_slope_is_brighter(spark):
    # plane rising to the SE: normal tilts NW, straight at the az=315 sun
    facing = [(x, y, 10 * (x - y)) for x in range(8) for y in range(8)]
    # plane rising to the NW: tilted away from the sun
    away = [(x, y, 10 * (y - x)) for x in range(8) for y in range(8)]
    flat = [(x, y, 0) for x in range(8) for y in range(8)]
    hs_facing = next(iter(_run(spark, facing).values()))[3]
    hs_away = next(iter(_run(spark, away).values()))[3]
    hs_flat = next(iter(_run(spark, flat).values()))[3]
    assert hs_facing > hs_flat > hs_away


def test_terrain_hole_excludes_ring(spark):
    cells = [(x, y, 100) for x in range(7) for y in range(7) if (x, y) != (3, 3)]
    got = _run(spark, cells)
    want = _ref(cells)
    assert set(got) == set(want)
    assert (3, 3) not in got  # the hole itself is gone
    for dx in (-1, 0, 1):  # ...and every cell whose stencil touches it
        for dy in (-1, 0, 1):
            if (dx, dy) != (0, 0):
                assert (3 + dx, 3 + dy) not in got


def test_terrain_zfactor_and_cellsize_scale_gradients(spark):
    cells = [(x, y, 5 * x) for x in range(6) for y in range(6)]
    base = _run(spark, cells)
    stretched = _run(spark, cells, cellsize=5.0)
    exag = _run(spark, cells, z_factor=2.0)
    k = (2, 2)
    assert stretched[k][0] == base[k][0] / 5.0
    assert exag[k][0] == base[k][0] * 2.0
    with pytest.raises(ValueError):
        _run(spark, cells, cellsize=0.0)


def test_terrain_repartition_invariant(spark):
    rng = np.random.default_rng(9)
    cells = [(x, y, int(rng.integers(0, 500))) for x in range(9) for y in range(9)]
    df = spark.createDataFrame(
        [(int(x), int(y), int(z)) for x, y, z in cells], ["gx", "gy", "elev"]
    )
    a = sorted(map(tuple, terrain_derivatives(df).collect()))
    b = sorted(map(tuple, terrain_derivatives(df.repartition(7, "gy")).collect()))
    assert a == b  # integer sums: exact on any partitioning

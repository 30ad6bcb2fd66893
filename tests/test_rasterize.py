"""Triangle rasterization (operators/rasterize.py)."""

import numpy as np

from open_vector_tile_spark.operators.rasterize import rasterize_triangles


def _tris(spark, rows):
    return spark.createDataFrame(
        rows, "tri_id long, x0 long, y0 long, x1 long, y1 long, x2 long, y2 long"
    )


def _brute(x0, y0, x1, y1, x2, y2):
    """Center-in-triangle coverage by exhaustive integer test over the
    operator's candidate range (cells whose center can fall in the bbox;
    a wider scan would also pick up points on a degenerate triangle's
    INFINITE carrier line, which the edge tests alone cannot exclude)."""
    if (x0, y0) == (x1, y1) == (x2, y2):
        return set()  # point-degenerate: no carrier line, covers nothing
    out = set()
    xmin, xmax = min(x0, x1, x2), max(x0, x1, x2)
    ymin, ymax = min(y0, y1, y2), max(y0, y1, y2)
    for gx in range(xmin, max(xmin, xmax - 1) + 1):
        for gy in range(ymin, max(ymin, ymax - 1) + 1):
            px, py = 2 * gx + 1, 2 * gy + 1
            e01 = (x1 - x0) * (py - 2 * y0) - (y1 - y0) * (px - 2 * x0)
            e12 = (x2 - x1) * (py - 2 * y1) - (y2 - y1) * (px - 2 * x1)
            e20 = (x0 - x2) * (py - 2 * y2) - (y0 - y2) * (px - 2 * x2)
            if (e01 >= 0 and e12 >= 0 and e20 >= 0) or (
                e01 <= 0 and e12 <= 0 and e20 <= 0
            ):
                out.add((gx, gy))
    return out


def test_unit_right_triangle(spark):
    # (0,0)-(4,0)-(0,4): covered centers form the staircase under y = 4 - x
    out = rasterize_triangles(_tris(spark, [(1, 0, 0, 4, 0, 0, 4)])).collect()
    got = {(r.gx, r.gy) for r in out}
    assert got == _brute(0, 0, 4, 0, 0, 4)
    # hypotenuse x+y=4 passes exactly through (3.5, 0.5): boundary-inclusive
    assert (0, 0) in got and (3, 0) in got and (3, 1) not in got


def test_winding_invariance(spark):
    cw = rasterize_triangles(_tris(spark, [(1, 2, 1, 9, 3, 5, 8)])).collect()
    ccw = rasterize_triangles(_tris(spark, [(1, 2, 1, 5, 8, 9, 3)])).collect()
    assert {(r.gx, r.gy) for r in cw} == {(r.gx, r.gy) for r in ccw}
    assert {(r.gx, r.gy) for r in cw} == _brute(2, 1, 9, 3, 5, 8)


def test_degenerate_collinear(spark):
    # 45-degree zero-area triangle: exactly the on-line centers survive
    out = rasterize_triangles(_tris(spark, [(1, 0, 0, 3, 3, 6, 6)])).collect()
    assert {(r.gx, r.gy) for r in out} == _brute(0, 0, 3, 3, 6, 6)
    # axis-aligned degenerate: centers never on an integer-x line
    out2 = rasterize_triangles(_tris(spark, [(2, 5, 0, 5, 9, 5, 4)])).collect()
    assert out2 == []
    # point-degenerate: every edge test is identically zero, but a point
    # contains no cell center — must cover nothing
    out3 = rasterize_triangles(_tris(spark, [(3, 5, 5, 5, 5, 5, 5)])).collect()
    assert out3 == []


def test_reserved_label_columns_rejected(spark):
    import pytest as _pytest

    from open_vector_tile_spark.operators.labels import cull_labels

    df = spark.createDataFrame(
        [(0, 0, 1, 2, 3, 4, 9)],
        "tile_x long, tile_y long, id long, x long, y long, score long, rank long",
    )
    with _pytest.raises(ValueError, match="reserved"):
        cull_labels(df, spacing=16, per_tile_cap=2)


def test_randomized_brute_force_parity(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(25):
        x0, y0 = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        rows.append(
            (
                i,
                x0,
                y0,
                x0 + int(rng.integers(-12, 13)),
                y0 + int(rng.integers(-12, 13)),
                x0 + int(rng.integers(-12, 13)),
                y0 + int(rng.integers(-12, 13)),
            )
        )
    out = rasterize_triangles(_tris(spark, rows)).collect()
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r.tri_id, set()).add((r.gx, r.gy))
    for i, x0, y0, x1, y1, x2, y2 in rows:
        assert got.get(i, set()) == _brute(x0, y0, x1, y1, x2, y2), i


def test_driver_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW supplier AS SELECT * FROM '{sf}/supplier.parquet'")
    got = entry.queries()["rasterize"](spark, sf).toPandas()
    want = con.execute(entry.oracle_sql()["rasterize"]).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c

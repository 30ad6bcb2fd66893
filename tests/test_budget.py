"""enforce_tile_budget (operators/budget.py): prefix-budget decimation per
tile, python brute-force parity, determinism, and integration with the
real tile encoder (dropping features must shrink actual tile bytes)."""

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.budget import (
    enforce_tile_budget,
    feature_cost_estimate,
    tile_budget_summary,
)


def _py_enforce(rows, budget):
    """rows: (zoom, tx, ty, id, priority, cost). Keep the contiguous
    best-priority prefix whose running cost fits."""
    out = {}
    tiles = {}
    for z, x, y, i, p, c in rows:
        tiles.setdefault((z, x, y), []).append((i, p, c))
    for key, feats in tiles.items():
        feats.sort(key=lambda t: (-t[1], t[0]))
        cum = 0
        for rank, (i, p, c) in enumerate(feats, start=1):
            cum += c
            out[i] = (rank, cum, cum <= budget)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "zoom int, tile_x long, tile_y long, id long, priority double, cost_bytes long"
    )


def test_budget_matches_python_reference(spark):
    import random

    rng = random.Random(17)
    rows = [
        (6, i % 3, i % 2, i, float(rng.randrange(0, 50)), rng.randrange(5, 400))
        for i in range(200)
    ]
    budget = 1000
    got = {
        r["id"]: (r["rank"], r["cum_cost"], r["kept"])
        for r in enforce_tile_budget(_df(spark, rows), budget, keep_dropped=True).collect()
    }
    assert got == _py_enforce(rows, budget)
    # kept-only mode returns exactly the kept prefix
    kept_ids = {
        r["id"] for r in enforce_tile_budget(_df(spark, rows), budget).collect()
    }
    assert kept_ids == {i for i, (_, _, k) in got.items() if k}


def test_budget_edge_cases_and_summary(spark):
    rows = [
        (5, 0, 0, 1, 9.0, 600),  # alone exceeds? 600 <= 500? no -> dropped
        (5, 0, 0, 2, 8.0, 100),
        (5, 1, 0, 3, 1.0, 500),  # exactly the budget -> kept
        (5, 1, 0, 4, 0.5, 1),
    ]
    enforced = enforce_tile_budget(_df(spark, rows), 500, keep_dropped=True)
    got = {r["id"]: r for r in enforced.collect()}
    assert not got[1]["kept"]  # over-budget head drops; tile never exceeds
    assert not got[2]["kept"]  # prefix rule: cum includes the dropped head
    assert got[3]["kept"] and got[3]["cum_cost"] == 500
    assert not got[4]["kept"]
    summ = {
        (r["zoom"], r["tile_x"], r["tile_y"]): r
        for r in tile_budget_summary(enforced).collect()
    }
    assert summ[(5, 0, 0)]["n_kept"] == 0 and summ[(5, 0, 0)]["dropped_bytes"] == 700
    assert summ[(5, 1, 0)]["n_kept"] == 1 and summ[(5, 1, 0)]["kept_bytes"] == 500
    with pytest.raises(ValueError):
        enforce_tile_budget(_df(spark, rows), 0)
    with pytest.raises(ValueError):
        enforce_tile_budget(_df(spark, rows).drop("priority"), 10)


def test_budget_shrinks_real_encoded_tiles(spark):
    """End-to-end: featurize points, budget-decimate, encode — the kept
    tileset's real bytes are strictly smaller and the kept feature count
    matches the enforcement."""
    from open_vector_tile_spark.operators import encode_tiles, points_to_features

    pts = spark.createDataFrame(
        [(i, (i * 7919 % 360) - 180.0, (i * 104729 % 160) / 2.0 - 40.0) for i in range(400)],
        "doc_id long, lon double, lat double",
    )
    feats = points_to_features(pts, zoom=2, layer="pois", extent=4096, id_col="doc_id")
    # geom_xy is flat [x0, y0, ...]: a point costs 12 + ceil(2*2.5) = 17
    costed = feats.withColumn(
        "cost_bytes", feature_cost_estimate(F.col("geom_xy"))
    ).withColumn("priority", (F.col("id") % 10).cast("double"))
    kept = enforce_tile_budget(costed, budget_bytes=200, id_col="id")
    full_bytes = {
        (r["tile_x"], r["tile_y"]): (r["n_bytes"], r["n_features"])
        for r in encode_tiles(feats).collect()
    }
    kept_bytes = {
        (r["tile_x"], r["tile_y"]): (r["n_bytes"], r["n_features"])
        for r in encode_tiles(kept.drop("rank", "cum_cost", "cost_bytes", "priority")).collect()
    }
    assert set(kept_bytes) <= set(full_bytes)
    shrunk = 0
    for key, (nb, nf) in kept_bytes.items():
        fb, ff = full_bytes[key]
        assert nf <= ff and nb <= fb
        assert nf <= 11  # 200-byte budget / 17 bytes per point feature
        shrunk += int(nb < fb)
    assert shrunk > 0

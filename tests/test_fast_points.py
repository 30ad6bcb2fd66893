"""Byte-equivalence of the vectorized bulk point encoder vs the generic
writer path, on randomized inputs (the contract is byte-for-byte identity)."""

import json

import numpy as np
import pandas as pd
import pytest

from open_vector_tile_spark.codec import VectorTile
from open_vector_tile_spark.codec.fast_points import encode_point_layer_tile
from open_vector_tile_spark.operators.tiler import LayerSpec, _encode_rows


def generic_bytes(layer, extent, shape, props_rows, qx, qy, ids=None):
    rows = []
    for i in range(len(qx)):
        rows.append(
            {
                "zoom": 5,
                "tile_x": 1,
                "tile_y": 2,
                "layer": layer,
                "extent": extent,
                "ftype": 1,
                "geom_xy": [int(qx[i]), int(qy[i])],
                "props_json": json.dumps(props_rows[i]),
                **({"id": int(ids[i])} if ids is not None else {}),
            }
        )
    specs = {layer: LayerSpec(extent=extent, shape=dict(shape))}
    tile, _ = _encode_rows(rows, specs)
    return tile


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("with_ids", [False, True])
def test_fast_equals_generic_random(seed, with_ids):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 400))
    shape = {"url": "string", "lang": "string", "rank": "i64", "score": "f64", "ok": "bool"}
    urls = np.array([f"https://e{rng.randint(0,50)}.org/{rng.randint(0,30)}" for _ in range(n)], dtype=object)
    langs = np.array([["en","de","fr"][rng.randint(0,3)] for _ in range(n)], dtype=object)
    ranks = rng.randint(-20, 20, n).astype(np.int64)
    scores = np.round(rng.uniform(-5, 5, n), 2)
    oks = rng.randint(0, 2, n).astype(bool)
    qx = rng.randint(0, 4096, n)
    qy = rng.randint(0, 4096, n)
    ids = rng.randint(0, 10**9, n) if with_ids else None
    props_rows = [
        {"url": urls[i], "lang": langs[i], "rank": int(ranks[i]), "score": float(scores[i]), "ok": bool(oks[i])}
        for i in range(n)
    ]
    want = generic_bytes("pages", 4096, shape, props_rows, qx, qy, ids)
    got = encode_point_layer_tile(
        "pages", 4096, shape,
        {"url": urls, "lang": langs, "rank": ranks, "score": scores, "ok": oks},
        qx, qy, ids=ids,
    )
    assert got == want, f"n={n} first diff at {next((i for i,(a,b) in enumerate(zip(got,want)) if a!=b), 'len')}"


def test_fast_decodes_correctly():
    n = 50
    qx = np.arange(n) * 10 % 4096
    qy = np.arange(n) * 17 % 4096
    urls = np.array([f"u{i%7}" for i in range(n)], dtype=object)
    tile = encode_point_layer_tile(
        "pages", 4096, {"url": "string"}, {"url": urls}, qx, qy
    )
    parsed = VectorTile(tile)
    layer = parsed.layers["pages"]
    assert len(layer) == n
    for i in range(n):
        f = layer.feature(i)
        assert f.geometry == [(int(qx[i]), int(qy[i]))]
        assert f.properties == {"url": urls[i]}


def test_fast_empty_shape():
    n = 10
    qx = np.arange(n); qy = np.arange(n)
    got = encode_point_layer_tile("l", 512, {}, {}, qx, qy)
    want = generic_bytes("l", 512, {}, [{} for _ in range(n)], qx, qy)
    assert got == want


def test_encode_point_tiles_spark_equals_generic(spark):
    """End-to-end Spark: the columnar bulk path and the generic path produce
    byte-identical tiles for the same input."""
    from open_vector_tile_spark.functions.text import geoparse
    from open_vector_tile_spark.operators import (
        encode_point_tiles,
        encode_tiles,
        points_to_features,
        points_to_features_columnar,
    )
    from open_vector_tile_spark.sources import pages_pdf

    pages = spark.createDataFrame(pages_pdf(600)).cache()
    pts = geoparse(pages)
    fast_feats, meta = points_to_features_columnar(
        pts, zoom=4, layer="pages", extent=4096, props_cols=["url", "lang"]
    )
    fast = {
        (r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in encode_point_tiles(fast_feats, meta).collect()
    }
    generic_feats = points_to_features(
        pts, zoom=4, layer="pages", extent=4096, props_cols=["url", "lang"]
    )
    generic = {
        (r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in encode_tiles(generic_feats, specs=meta["specs"]).collect()
    }
    assert set(fast) == set(generic)
    mismatches = [k for k in fast if fast[k] != generic[k]]
    assert mismatches == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bulk_cross_tile_equals_single_tile(seed):
    """Cross-tile bulk encoder: every tile byte-identical to the single-tile
    encoder (itself byte-identical to the generic writer, above)."""
    from open_vector_tile_spark.codec.fast_points import encode_point_layer_tiles_bulk

    rng = np.random.RandomState(seed)
    shape = {"name": "string", "rank": "u64", "score": "f64", "delta": "i64",
             "ok": "bool", "temp": "f32"}
    for trial in range(10):
        n_tiles = int(rng.randint(1, 40))
        counts = rng.randint(1, 20, size=n_tiles)
        n = int(counts.sum())
        props = {
            "name": np.array([f"s{rng.randint(6)}" for _ in range(n)], dtype=object),
            "rank": rng.randint(0, 5, n).astype(np.int64),
            "score": np.round(rng.randn(n), 2),
            "delta": rng.randint(-5, 5, n).astype(np.int64),
            "ok": rng.randint(0, 2, n).astype(np.int64),
            "temp": np.round(rng.randn(n).astype(np.float64), 1),
        }
        qx = rng.randint(0, 4096, n)
        qy = rng.randint(0, 4096, n)
        ids = np.arange(n, dtype=np.int64) if trial % 2 else None
        bulk = encode_point_layer_tiles_bulk(
            "pages", 4096, shape, props, qx, qy, counts, ids=ids
        )
        s = 0
        for t, c in enumerate(counts):
            e = s + int(c)
            single = encode_point_layer_tile(
                "pages", 4096, shape,
                {k: v[s:e] for k, v in props.items()}, qx[s:e], qy[s:e],
                ids=ids[s:e] if ids is not None else None,
            )
            assert bulk[t] == single, f"trial {trial} tile {t}"
            s = e


def test_encode_point_tiles_tiny_tile_regime(spark):
    """z12: thousands of 1-3 feature tiles — the cross-tile path must match
    the generic writer byte-for-byte in the regime it exists to accelerate."""
    from open_vector_tile_spark.functions.text import geoparse
    from open_vector_tile_spark.operators import (
        encode_point_tiles,
        encode_tiles,
        points_to_features,
        points_to_features_columnar,
    )
    from open_vector_tile_spark.sources import pages_pdf

    pages = spark.createDataFrame(pages_pdf(2000)).cache()
    pts = geoparse(pages)
    fast_feats, meta = points_to_features_columnar(
        pts, zoom=12, layer="pages", extent=4096, props_cols=["url", "lang"]
    )
    fast = {
        (r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in encode_point_tiles(fast_feats, meta).collect()
    }
    generic_feats = points_to_features(
        pts, zoom=12, layer="pages", extent=4096, props_cols=["url", "lang"]
    )
    generic = {
        (r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in encode_tiles(generic_feats, meta["specs"]).collect()
    }
    assert set(fast) == set(generic) and len(fast) > 500
    assert all(fast[k] == generic[k] for k in fast)

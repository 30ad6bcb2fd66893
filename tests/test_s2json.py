"""S2JSON source adapter (S11): S2JSON tiles -> IR -> OVT bytes -> decode
equality, mirroring the reference's writeS2T test semantics
(tests/writeS2T.test.ts:14-63) and fromS2JSONFeature geometry handling
(src/base/vectorFeature.ts:421-576)."""

import json

import pytest

from open_vector_tile_spark.codec import (
    VectorTile,
    s2json_to_base_layers,
    write_mvt,
    write_ov_tile,
)


def _tile(features, name="points", transformed=True):
    return {
        "transformed": transformed,
        "layers": {name: {"name": name, "features": features}},
    }


def test_points_mirror_writeS2T(spark_noop=None):
    """Two point features, extent 8192, ids + properties — the writeS2T
    scenario.  Coordinates arrive in [0,1] space and quantize to the exact
    integers the reference test pins (3805/5645, 5136/4700)."""
    ext = 8192
    feats = [
        {
            "id": 1,
            "properties": {"name": "a"},
            "geometry": {"type": "Point", "coordinates": {"x": 3805 / ext, "y": 5645 / ext}},
        },
        {
            "id": 2,
            "properties": {"name": [0, 1, 2, 3]},
            "geometry": {"type": "Point", "coordinates": {"x": 5136 / ext, "y": 4700 / ext}},
        },
    ]
    layers = s2json_to_base_layers(
        _tile(feats), {"points": {"extent": ext}}
    )
    assert len(layers) == 1 and layers[0].extent == ext

    # S2-MVT flavor (what writeS2T writes): array property JSON-stringifies
    mvt = VectorTile(write_mvt(layers))
    lyr = mvt.layers["points"]
    assert lyr.extent == ext and len(lyr) == 2
    assert lyr.feature(0).id == 1 and lyr.feature(1).id == 2
    assert lyr.feature(0).properties == {"name": "a"}
    assert lyr.feature(1).properties == {"name": "[0,1,2,3]"}
    assert lyr.feature(0).load_geometry() == [(3805, 5645)]
    assert lyr.feature(1).load_geometry() == [(5136, 4700)]

    # OVT flavor: arrays survive natively
    ovt = VectorTile(write_ov_tile(layers))
    l2 = ovt.layers["points"]
    assert l2.feature(1).properties == {"name": [0, 1, 2, 3]}
    assert l2.feature(0).geometry == [(3805, 5645)]


def test_requires_transformed():
    with pytest.raises(ValueError, match="transformed"):
        s2json_to_base_layers(_tile([], transformed=False))


def test_all_geometry_types_roundtrip():
    ext = 4096
    g = lambda i, j: {"x": (i * 97 % ext) / ext, "y": (j * 61 % ext) / ext}  # noqa: E731
    feats = [
        {"id": 1, "properties": {"k": "pt"},
         "geometry": {"type": "MultiPoint", "coordinates": [g(1, 1), g(2, 2)]}},
        {"id": 2, "properties": {"k": "ln"},
         "geometry": {"type": "LineString", "coordinates": [g(1, 2), g(3, 4), g(5, 6)],
                      "offset": 1.5}},
        {"id": 3, "properties": {"k": "mln"},
         "geometry": {"type": "MultiLineString",
                      "coordinates": [[g(7, 8), g(9, 10)], [g(11, 12), g(13, 14)]],
                      "offset": [0.5, 2.0]}},
        {"id": 4, "properties": {"k": "pg"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[g(1, 1), g(20, 1), g(20, 20), g(1, 20)],
                                      [g(5, 5), g(8, 5), g(8, 8)]],
                      "indices": [0, 1, 2], "tessellation": [10, 11, 12, 13],
                      "bbox": [0.0, 0.0, 0.5, 0.5]}},
        {"id": 5, "properties": {"k": "mpg"},
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [[[g(2, 3), g(30, 3), g(30, 30)]],
                                      [[g(40, 40), g(50, 40), g(50, 50)]]],
                      "offset": [[1.0], [0.0]]}},
        {"id": 6, "properties": {"k": "p3"},
         "geometry": {"type": "Point", "is3D": True,
                      "coordinates": {"x": 0.25, "y": 0.5, "z": 0.125}}},
    ]
    layers = s2json_to_base_layers(_tile(feats, name="mix"))
    parsed = VectorTile(write_ov_tile(layers))
    lyr = parsed.layers["mix"]
    by_id = {lyr.feature(i).id: lyr.feature(i) for i in range(len(lyr))}
    assert set(by_id) == {1, 2, 3, 4, 5, 6}
    assert by_id[1].ftype == 1 and len(by_id[1].geometry) == 2
    # JS-round quantization parity
    q = lambda v: int((v * ext) + 0.5)  # noqa: E731
    assert by_id[1].geometry[0] == (q(g(1, 1)["x"]), q(g(1, 1)["y"]))
    assert by_id[2].ftype == 2 and by_id[2].geometry[0].offset == 1.5
    assert [ln.offset for ln in by_id[3].geometry] == [0.5, 2.0]
    assert by_id[4].ftype == 3
    rings = by_id[4].geometry[0]
    assert len(rings) == 2 and len(rings[0].points) == 4 and len(rings[1].points) == 3
    assert by_id[4].indices == [0, 1, 2]
    assert by_id[4].tessellation == [(10, 11), (12, 13)]
    assert by_id[4].bbox == pytest.approx([0.0, 0.0, 0.5, 0.5], abs=1e-4)
    assert by_id[5].ftype == 3 and len(by_id[5].geometry) == 2
    assert by_id[5].geometry[0][0].offset == 1.0
    assert by_id[6].ftype == 4 and by_id[6].geometry[0] == (1024, 2048, 512)


def test_spark_s2json_source_adapter(spark):
    """Table of S2JSON docs -> OVT tiles -> decode_tiles equality."""
    from open_vector_tile_spark.operators import decode_tiles, s2json_tiles_to_ovt

    docs = []
    for t in range(6):
        feats = [
            {
                "id": 10 * t + i,
                "properties": {"name": f"f{t}-{i}"},
                "geometry": {
                    "type": "Point",
                    "coordinates": {"x": (i * 131 % 4096) / 4096.0, "y": (i * 173 % 4096) / 4096.0},
                },
            }
            for i in range(5)
        ]
        docs.append((3, t % 4, t // 4, json.dumps(_tile(feats, name="pois"))))
    df = spark.createDataFrame(docs, "zoom int, tile_x long, tile_y long, s2json string")
    tiles = s2json_tiles_to_ovt(df).cache()
    got = tiles.toPandas()
    assert got["n_features"].sum() == 30
    decoded = decode_tiles(tiles).toPandas()
    assert len(decoded) == 30
    names = {json.loads(p)["name"] for p in decoded["props_json"]}
    assert names == {f"f{t}-{i}" for t in range(6) for i in range(5)}
    # quantization parity per feature
    one = decoded[decoded.id == 3].iloc[0]
    assert list(one["geom_xy"]) == [3 * 131 % 4096, 3 * 173 % 4096]

"""OVT write -> read round-trip tests, mirroring the reference suite structure
(/root/reference/tests/open_vector_tile/vectorFeature.test.ts,
 tests/parseOpen.test.ts)."""

import numpy as np
import pytest

from open_vector_tile_spark.codec import (
    BaseFeature,
    BaseLayer,
    BaseLine,
    VectorTile,
    write_ov_tile,
)


def rt(layers, images=None, grids=None) -> VectorTile:
    return VectorTile(write_ov_tile(layers, images, grids))


def test_single_point_inline_fast_path():
    # src/base/vectorFeature.ts:93-101 single-point weave
    layer = BaseLayer(name="pts", extent=4096)
    layer.add_feature(BaseFeature(1, [(10, 20)], {"name": "a", "rank": 3}, id=7))
    tile = rt([layer])
    out = tile.layers["pts"]
    assert len(out) == 1
    f = out.feature(0)
    assert f.ftype == 1
    assert f.id == 7
    assert f.properties == {"name": "a", "rank": 3}
    assert f.geometry == [(10, 20)]


def test_multi_point_with_negative_coords():
    layer = BaseLayer(name="pts", extent=4096)
    layer.add_feature(BaseFeature(1, [(-5, 3), (100, -200), (0, 0)], {"k": "v"}))
    f = rt([layer]).layers["pts"].feature(0)
    assert f.geometry == [(-5, 3), (100, -200), (0, 0)]


def test_points_3d_single_and_multi():
    layer = BaseLayer(name="p3", extent=8192)
    layer.add_feature(BaseFeature(4, [(1, 2, 3)], {}))
    layer.add_feature(BaseFeature(4, [(10, 20, 30), (-1, -2, -3)], {}))
    out = rt([layer]).layers["p3"]
    assert out.feature(0).geometry == [(1, 2, 3)]
    assert out.feature(1).geometry == [(10, 20, 30), (-1, -2, -3)]


def test_lines_with_offsets():
    layer = BaseLayer(name="ln", extent=4096)
    layer.add_feature(
        BaseFeature(
            2,
            [
                BaseLine([(0, 0), (100, 100), (200, 50)], offset=1.2345),
                BaseLine([(7, 7), (8, 9)], offset=0.5),
            ],
            {"road": "main"},
        )
    )
    f = rt([layer]).layers["ln"].feature(0)
    assert [ln.points for ln in f.geometry] == [[(0, 0), (100, 100), (200, 50)], [(7, 7), (8, 9)]]
    # offsets quantized x1000 floor (src/base/vectorFeature.ts:609-620)
    assert [ln.offset for ln in f.geometry] == [1.234, 0.5]


def test_single_line_no_count_prefix():
    layer = BaseLayer(name="ln", extent=4096)
    layer.add_feature(BaseFeature(2, [BaseLine([(1, 1), (2, 2)])], {}))
    f = rt([layer]).layers["ln"].feature(0)
    assert [ln.points for ln in f.geometry] == [[(1, 1), (2, 2)]]


def test_polygon_with_hole_indices_tessellation():
    outer = [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]
    hole = [(20, 20), (20, 40), (40, 40), (40, 20), (20, 20)]
    layer = BaseLayer(name="poly", extent=4096)
    layer.add_feature(
        BaseFeature(
            3,
            [[BaseLine(outer), BaseLine(hole)]],
            {"name": "sq"},
            id=1,
            indices=[0, 1, 2, 2, 3, 0],
            tessellation=[(50, 50), (60, 60)],
        )
    )
    f = rt([layer]).layers["poly"].feature(0)
    assert [[ln.points for ln in poly] for poly in f.geometry] == [[outer, hole]]
    assert f.indices == [0, 1, 2, 2, 3, 0]
    assert f.tessellation == [(50, 50), (60, 60)]
    flat, idx = f.load_geometry_flat()
    assert idx == [0, 1, 2, 2, 3, 0]
    assert len(flat) == (len(outer) + len(hole) + 2) * 2
    assert flat[0] == 0.0 and flat[2] == pytest.approx(100 / 4096)


def test_multipolygon():
    p1 = [[(0, 0), (10, 0), (10, 10), (0, 0)]]
    p2 = [[(20, 20), (30, 20), (30, 30), (20, 20)], [(22, 22), (24, 24), (22, 26), (22, 22)]]
    layer = BaseLayer(name="mp", extent=4096)
    layer.add_feature(BaseFeature(3, [[BaseLine(r) for r in p1], [BaseLine(r) for r in p2]], {}))
    f = rt([layer]).layers["mp"].feature(0)
    assert [[ln.points for ln in poly] for poly in f.geometry] == [p1, p2]


def test_mvalues_roundtrip():
    # mirrors tests/open_vector_tile/vectorFeature.test.ts:53-64 (mShape {size:i64})
    layer = BaseLayer(name="mv", extent=4096)
    layer.add_feature(
        BaseFeature(
            2,
            [BaseLine([(0, 0), (5, 5)], mvalues=[{"size": 1}, {"size": -7}])],
            {},
        )
    )
    f = rt([layer]).layers["mv"].feature(0)
    assert f.geometry[0].mvalues == [{"size": 1}, {"size": -7}]


def test_bbox_roundtrip():
    layer = BaseLayer(name="bb", extent=4096)
    layer.add_feature(BaseFeature(1, [(1, 1)], {}, bbox=[-120.5, -45.5, 120.5, 45.5]))
    f = rt([layer]).layers["bb"].feature(0)
    assert f.bbox == pytest.approx([-120.5, -45.5, 120.5, 45.5], abs=3e-5)


def test_properties_all_primitive_types():
    props = {
        "s": "str",
        "u": 9,
        "i": -9,
        "f": 1.5,
        "b": True,
        "b2": False,
        "n": None,
        "arr": [1, 2, 3],
        "nested": {"a": "x", "b": 2},
    }
    layer = BaseLayer(name="props", extent=4096)
    layer.add_feature(BaseFeature(1, [(0, 0)], props))
    f = rt([layer]).layers["props"].feature(0)
    assert f.properties == props


def test_shape_default_fill_for_missing_keys():
    # second feature missing 'rank' -> default 0 (src/open/shape.ts:169-182)
    layer = BaseLayer(name="l", extent=4096)
    layer.add_feature(BaseFeature(1, [(0, 0)], {"name": "a", "rank": 5}))
    layer.add_feature(BaseFeature(1, [(1, 1)], {"name": "b"}))
    out = rt([layer]).layers["l"]
    assert out.feature(1).properties == {"name": "b", "rank": 0}


def test_feature_sort_by_type():
    # features are sorted by geometry type before encode (vectorLayer.ts:140)
    layer = BaseLayer(name="l", extent=4096)
    layer.add_feature(BaseFeature(3, [[BaseLine([(0, 0), (1, 0), (1, 1), (0, 0)])]], {}))
    layer.add_feature(BaseFeature(1, [(5, 5)], {}))
    layer.add_feature(BaseFeature(2, [BaseLine([(0, 0), (2, 2)])], {}))
    out = rt([layer]).layers["l"]
    assert [out.feature(i).ftype for i in range(3)] == [1, 2, 3]


def test_empty_properties_layer():
    layer = BaseLayer(name="empty", extent=512)
    layer.add_feature(BaseFeature(1, [(0, 0)], {}))
    out = rt([layer]).layers["empty"]
    assert out.extent == 512
    assert out.feature(0).properties == {}


def test_multiple_layers_share_column_cache():
    l1 = BaseLayer(name="a", extent=4096)
    l1.add_feature(BaseFeature(1, [(3, 4)], {"kind": "x"}))
    l2 = BaseLayer(name="b", extent=4096)
    l2.add_feature(BaseFeature(1, [(3, 4)], {"kind": "x"}))
    tile = rt([l1, l2])
    assert set(tile.layers) == {"a", "b"}
    assert tile.layers["a"].feature(0).properties == {"kind": "x"}
    assert tile.layers["b"].feature(0).geometry == [(3, 4)]


def test_value_dedup_reduces_size():
    # dictionary encoding: repeated values must not grow the buffer linearly
    big = BaseLayer(name="l", extent=4096)
    for i in range(100):
        big.add_feature(BaseFeature(1, [(i, i)], {"kind": "repeated-value"}))
    buf = write_ov_tile([big])
    tile = VectorTile(buf)
    assert len(buf) < 100 * 30
    assert tile.layers["l"].feature(99).properties == {"kind": "repeated-value"}


def test_grid_layer_roundtrip():
    rng = np.random.RandomState(42)
    size = 32
    data = (1000 * np.sin(np.arange(size * size) / 7.0)).astype(np.float64)
    buf = write_ov_tile(None, grids=[{"name": "elevation", "size": size, "data": data, "extent": 8192}])
    tile = VectorTile(buf)
    g = tile.grids["elevation"]
    assert g.size == size
    out = g.data()
    tol = (g.max - g.min) / g.extent / 2 + 1e-6
    assert np.abs(out - data).max() <= tol


def test_image_layer_roundtrip():
    img = bytes(range(256)) * 16
    buf = write_ov_tile(
        None,
        images=[{"name": "satellite", "type": "raw", "width": 64, "height": 64, "image": img}],
    )
    tile = VectorTile(buf)
    it = tile.images["satellite"]
    assert (it.name, it.type, it.width, it.height) == ("satellite", "raw", 64, 64)
    assert it.image() == img


def test_3d_lines_with_offsets_and_bbox3d():
    layer = BaseLayer(name="l3", extent=4096)
    layer.add_feature(
        BaseFeature(
            5,
            [BaseLine([(0, 0, 1), (5, 5, 10)], offset=2.5)],
            {},
            bbox=[-10.0, -10.0, 10.0, 10.0, -5.5, 99.5],
        )
    )
    f = rt([layer]).layers["l3"].feature(0)
    assert f.geometry[0].points == [(0, 0, 1), (5, 5, 10)]
    assert f.geometry[0].offset == 2.5
    assert f.bbox[4] == pytest.approx(-5.5)
    assert f.bbox[5] == pytest.approx(99.5)


def test_3d_polygons():
    poly = [[(0, 0, 0), (10, 0, 1), (10, 10, 2), (0, 0, 0)]]
    layer = BaseLayer(name="p3", extent=4096)
    layer.add_feature(BaseFeature(6, [[BaseLine(r) for r in poly]], {}))
    f = rt([layer]).layers["p3"].feature(0)
    assert [[ln.points for ln in p] for p in f.geometry] == [poly]


def test_u64_above_2_63_codec_roundtrip():
    """SURVEY §1.3 caveat made executable: wire u64 ids and u64 property
    values ABOVE 2^63 round-trip exactly at the codec level (pure-python
    ints, varint encoding — no i64 truncation in the library boundary).
    Note the reference JS itself degrades above 2^53; this engine is exact
    to the full u64 range here."""
    big_id = (1 << 64) - 3          # > 2^63
    big_val = (1 << 63) + 12345     # > 2^63
    layer = BaseLayer(name="u", extent=4096)
    layer.add_feature(BaseFeature(1, [(1, 2)], {"v": big_val}, id=big_id))
    tile = rt([layer])
    f = tile.layers["u"].feature(0)
    assert f.id == big_id
    assert f.properties == {"v": big_val}
    # byte-stable under re-encode
    from open_vector_tile_spark.codec import ovt_tile_to_base_layers

    blob1 = write_ov_tile([layer])
    blob2 = write_ov_tile(ovt_tile_to_base_layers(VectorTile(blob1)))
    assert blob1 == blob2


def test_u64_id_above_2_63_through_spark_carrier(spark):
    """The Spark FEATURE_SCHEMA carries wire-u64 ids as two's-complement
    LongType (decode.py:114-118; tiler rows_to_base_feature re-adds 2^64):
    an id > 2^63 survives featurize -> encode -> decode -> re-encode."""
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators import decode_tiles, encode_tiles

    big_id = (1 << 64) - 11
    carrier = big_id - (1 << 64)  # negative i64
    feats = spark.range(1).select(
        F.lit(3).alias("zoom"),
        F.lit(1).cast("long").alias("tile_x"),
        F.lit(2).cast("long").alias("tile_y"),
        F.lit("u").alias("layer"),
        F.lit(4096).alias("extent"),
        F.lit(carrier).cast("long").alias("id"),
        F.lit(1).alias("ftype"),
        F.array(F.lit(7), F.lit(9)).alias("geom_xy"),
    )
    tiles = encode_tiles(feats)
    blob = bytes(tiles.collect()[0]["tile"])
    assert VectorTile(blob).layers["u"].feature(0).id == big_id
    dec = decode_tiles(tiles).select("id").collect()
    assert dec[0]["id"] == carrier  # two's-complement carrier on the way out
    blob2 = bytes(
        encode_tiles(
            decode_tiles(tiles).drop("source", "feature_index", "n_vertices")
        ).collect()[0]["tile"]
    )
    assert blob2 == blob

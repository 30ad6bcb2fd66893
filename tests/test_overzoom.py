"""overzoom_points / overzoom_features vs direct construction + the codec."""

from __future__ import annotations

import numpy as np
import pytest

from open_vector_tile_spark.operators.overzoom import (
    overzoom_features,
    overzoom_points,
)

_COLS = (
    "zoom int, tile_x long, tile_y long, layer string, extent int, id long, "
    "ftype int, geom_xy array<int>, ring_lens array<int>, poly_lens array<int>, "
    "offsets array<double>, bbox array<double>, indices array<int>, "
    "tess_xy array<int>, props_json string, mvals_json string"
)


def _feat(
    id_,
    geom,
    ftype=1,
    ring_lens=None,
    poly_lens=None,
    offsets=None,
    tile=(4, 3, 5),
    mvals=None,
):
    z, tx, ty = tile
    return (
        z, tx, ty, "layer0", 4096, id_, ftype, geom,
        ring_lens or [len(geom) // 2], poly_lens, offsets, None, None, None,
        '{"k":1}', mvals,
    )


def _collect(df):
    return [r.asDict() for r in df.collect()]


def test_point_routes_to_single_child(spark):
    df = spark.createDataFrame([_feat(1, [1000, 3000])], _COLS)
    rows = _collect(overzoom_points(df))
    assert len(rows) == 1
    r = rows[0]
    assert (r["zoom"], r["tile_x"], r["tile_y"]) == (5, 6, 11)
    assert r["geom_xy"] == [2000, 2 * 3000 - 4096]
    assert r["props_json"] == '{"k":1}'
    assert r["mvals_json"] is None or r["mvals_json"] == "[7]"


def test_point_buffer_lands_in_two_children(spark):
    # x=2064 -> child0 coord 4128 (inside +64 buffer), child1 coord 32
    df = spark.createDataFrame([_feat(1, [2064, 100])], _COLS)
    assert len(_collect(overzoom_points(df, buffer=0))) == 1
    rows = _collect(overzoom_points(df, buffer=64))
    keys = {(r["tile_x"], r["tile_y"]) for r in rows}
    assert keys == {(6, 10), (7, 10)}


def test_multipoint_filtering_nulls_mvals(spark):
    df = spark.createDataFrame(
        [_feat(1, [100, 100, 3000, 3000], mvals="[1,2]")], _COLS
    )
    rows = _collect(overzoom_points(df))
    assert len(rows) == 2  # one vertex per child, none shared
    for r in rows:
        assert r["ring_lens"] == [1]
        assert r["mvals_json"] is None  # vertex set shrank
    whole = spark.createDataFrame(
        [_feat(2, [100, 100, 300, 300], mvals="[1,2]")], _COLS
    )
    rows = _collect(overzoom_points(whole))
    assert len(rows) == 1 and rows[0]["mvals_json"] == "[1,2]"


def test_points_paths_agree(spark):
    rng = np.random.default_rng(3)
    feats = []
    for i in range(40):
        pts = rng.integers(0, 4096, size=(rng.integers(1, 4), 2))
        feats.append(_feat(i, [int(v) for v in pts.ravel()]))
    df = spark.createDataFrame(feats, _COLS)
    a = sorted(
        (r["id"], r["tile_x"], r["tile_y"], tuple(r["geom_xy"]))
        for r in _collect(overzoom_points(df, buffer=64))
    )
    b = sorted(
        (r["id"], r["tile_x"], r["tile_y"], tuple(r["geom_xy"]))
        for r in _collect(overzoom_features(df, buffer=64))
    )
    assert a == b


def test_line_clips_and_offsets_scale(spark):
    # horizontal line crossing the whole tile at y=1000
    df = spark.createDataFrame(
        [_feat(1, [0, 1000, 4096, 1000], ftype=2, offsets=[10.0])], _COLS
    )
    rows = _collect(overzoom_features(df, buffer=0))
    got = {(r["tile_x"], r["tile_y"]): r for r in rows}
    assert set(got) == {(6, 10), (7, 10)}
    left = got[(6, 10)]
    assert left["geom_xy"] == [0, 2000, 4096, 2000]
    assert left["offsets"] == [20.0]  # parent offset doubled
    right = got[(7, 10)]
    assert right["geom_xy"] == [0, 2000, 4096, 2000]
    # right part starts 4096 (scaled) units along the line, + 2x parent
    assert right["offsets"] == [20.0 + 4096.0]


def test_polygon_quarters_conserve_area(spark):
    # CCW square spanning the whole parent tile
    sq = [500, 500, 3500, 500, 3500, 3500, 500, 3500]
    df = spark.createDataFrame([_feat(1, sq, ftype=3)], _COLS)
    rows = _collect(overzoom_features(df, buffer=0))
    assert len(rows) == 4

    def shoelace(xy):
        p = np.array(xy, dtype=float).reshape(-1, 2)
        x, y = p[:, 0], p[:, 1]
        return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)

    total = sum(abs(shoelace(r["geom_xy"])) for r in rows)
    parent = abs(shoelace(sq))
    assert total == pytest.approx(parent * 4.0)  # coords scaled 2x => area 4x


def test_polygon_hole_survives(spark):
    outer = [0, 0, 4000, 0, 4000, 4000, 0, 4000]
    hole = [1800, 1800, 1800, 2400, 2400, 2400, 2400, 1800]  # CW hole
    df = spark.createDataFrame(
        [_feat(1, outer + hole, ftype=3, ring_lens=[4, 4], poly_lens=[2])],
        _COLS,
    )
    rows = _collect(overzoom_features(df, buffer=0))
    assert len(rows) == 4
    # the hole straddles the center: every child carries a piece of it
    assert all(len(r["ring_lens"]) == 2 for r in rows)


def test_roundtrip_through_codec(spark):
    from open_vector_tile_spark.codec import VectorTile
    from open_vector_tile_spark.operators.tiler import encode_tiles

    feats = [
        _feat(1, [100, 100, 3000, 3000]),
        _feat(2, [0, 1000, 4096, 1000], ftype=2),
        _feat(3, [500, 500, 3500, 500, 3500, 3500, 500, 3500], ftype=3),
    ]
    df = spark.createDataFrame(feats, _COLS)
    kids = overzoom_features(df, buffer=0)
    tiles = encode_tiles(kids).collect()
    assert tiles and all(t["n_bytes"] > 0 for t in tiles)
    total = 0
    for t in tiles:
        vt = VectorTile(bytes(t["tile"]))
        total += sum(len(l) for l in vt.layers.values())
    assert total == kids.count()


def test_param_validation(spark):
    df = spark.createDataFrame([_feat(1, [0, 0])], _COLS)
    with pytest.raises(ValueError, match="buffer"):
        overzoom_points(df, buffer=-1)
    with pytest.raises(ValueError, match="buffer"):
        overzoom_features(df, buffer=-1)

"""Independent-decoder cross-check for the MVT writer.

The reference validates its writer by decoding its bytes with a FOREIGN
library (`@mapbox/vector-tile`, tests/parseOpen.test.ts:127-153).  This file
is the same idea: the reader below is written only from the public Mapbox
Vector Tile spec 2.1 (vector_tile.proto field numbers, protobuf wire format,
the zigzag-delta geometry command stream) and imports NOTHING from
open_vector_tile_spark.codec — so agreement with the repo's writer is
evidence about the bytes, not about shared code.

Flow per fixture: decode the reference's committed `.pbf` with the repo
codec -> re-encode with `write_mvt` -> decode the new bytes with the
independent reader -> assert per-feature id / type / properties / geometry
equality against the repo decoder's view of the ORIGINAL fixture.
"""

from __future__ import annotations

import os
import struct

import pytest

from open_vector_tile_spark.codec import VectorTile, mvt_tile_to_base_layers, write_mvt

FIXTURES = "/root/reference/tests/fixtures"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available"
)


# ---------------------------------------------------------------------------
# minimal spec-derived MVT reader (no imports from the repo codec)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) walking one protobuf message.

    wire types (protobuf spec): 0 varint, 1 fixed64, 2 length-delimited,
    5 fixed32."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover - no group types in MVT
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _read_value(buf: bytes):
    """vector_tile.proto Value: 1 string, 2 float, 3 double, 4 int64,
    5 uint64, 6 sint64, 7 bool (exactly one set)."""
    for field, _, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", val)[0]
        if field == 3:
            return struct.unpack("<d", val)[0]
        if field == 4:
            # int64 on the varint wire is two's-complement in 64 bits
            return val - (1 << 64) if val >= 1 << 63 else val
        if field == 5:
            return val
        if field == 6:
            return _zigzag(val)
        if field == 7:
            return bool(val)
    return None


def _read_packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def _decode_geometry(ints: list[int], gtype: int):
    """Spec 4.3: command integer = (id & 0x7) | (count << 3); MoveTo=1,
    LineTo=2, ClosePath=7; parameters are zigzag deltas cumulative across
    the whole geometry.  Returns parts normalized per geometry type:
    points -> one part of all MoveTo points; lines -> one part per MoveTo
    run; polygons -> one part (ring, not re-closed) per MoveTo..ClosePath."""
    x = y = 0
    i = 0
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    while i < len(ints):
        cmd = ints[i] & 0x7
        count = ints[i] >> 3
        i += 1
        if cmd == 1:  # MoveTo
            for _ in range(count):
                x += _zigzag(ints[i])
                y += _zigzag(ints[i + 1])
                i += 2
                if gtype == 1:
                    cur.append((x, y))
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(x, y)]
        elif cmd == 2:  # LineTo
            for _ in range(count):
                x += _zigzag(ints[i])
                y += _zigzag(ints[i + 1])
                i += 2
                cur.append((x, y))
        elif cmd == 7:  # ClosePath (polygons): ends the ring, no params
            # a ClosePath with no open ring is a no-op, matching
            # @mapbox/vector-tile (the reference's mapbox flavor emits an
            # extra ClosePath per polygon: its ClosePolygon downgrade,
            # reference src/mapbox/writeMVTile.ts:285)
            if cur:
                parts.append(cur)
            cur = []
        else:
            raise ValueError(f"unknown command {cmd}")
    if cur:
        parts.append(cur)
    return parts


def _read_feature(buf: bytes, keys: list, values: list):
    fid = None
    tags: list[int] = []
    gtype = 0
    geom: list[int] = []
    for field, _, val in _fields(buf):
        if field == 1:
            fid = val
        elif field == 2:
            tags = _read_packed_varints(val)
        elif field == 3:
            gtype = val
        elif field == 4:
            geom = _read_packed_varints(val)
    props = {keys[tags[j]]: values[tags[j + 1]] for j in range(0, len(tags), 2)}
    return {
        "id": fid,
        "type": gtype,
        "properties": props,
        "parts": _decode_geometry(geom, gtype),
    }


def independent_read_mvt(buf: bytes) -> dict:
    """Tile (field 3 = Layer); Layer: 15 version, 1 name, 2 Feature,
    3 key, 4 Value, 5 extent."""
    tiles = {}
    for field, _, lbuf in _fields(buf):
        if field != 3:
            continue
        name = None
        extent = 4096
        version = None
        feats_raw: list[bytes] = []
        keys: list[str] = []
        values: list = []
        for f2, _, val in _fields(lbuf):
            if f2 == 15:
                version = val
            elif f2 == 1:
                name = val.decode("utf-8")
            elif f2 == 2:
                feats_raw.append(val)
            elif f2 == 3:
                keys.append(val.decode("utf-8"))
            elif f2 == 4:
                values.append(_read_value(val))
            elif f2 == 5:
                extent = val
        tiles[name] = {
            "version": version,
            "extent": extent,
            "features": [_read_feature(fb, keys, values) for fb in feats_raw],
        }
    return tiles


# ---------------------------------------------------------------------------
# expected view: repo decoder over the ORIGINAL fixture, normalized to parts
# ---------------------------------------------------------------------------


def _expected_parts(feature) -> list[list[tuple[int, int]]]:
    geo = feature.load_geometry()
    if feature.ftype == 1:  # flat list of (x, y)
        return [[tuple(p) for p in geo]]
    if feature.ftype == 2:  # list of lines (or a bare line)
        if geo and isinstance(geo[0], tuple):
            geo = [geo]
        return [[tuple(p) for p in line] for line in geo]
    # polygons: list of polys, each a list of rings closed with a repeated
    # first vertex; the wire ring (ClosePath) omits that repeat
    parts = []
    for poly in geo:
        for ring in poly:
            pts = [tuple(p) for p in ring]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            parts.append(pts)
    return parts


def _norm_props(props: dict) -> dict:
    # float32 values survive bit-exactly but may compare against python
    # doubles; normalize via repr of the float32-rounded value
    out = {}
    for k, v in props.items():
        if isinstance(v, float):
            v = struct.unpack("<f", struct.pack("<f", v))[0] if abs(v) < 3.4e38 else v
        out[k] = v
    return out


ROUNDTRIP_FIXTURES = [
    "14-8801-5371.vector.pbf",
    "12-1143-1497.vector.pbf",
    "1-1-0.vector.pbf",
    "lots-of-tags.vector.pbf",
    "multi-line.pbf",
    "multi-point.pbf",
    "multi-polygon.pbf",
    "multipolygon-with-closepath.pbf",
    "multipolygon.pbf",
    "polygon-with-inner.pbf",
    "singleton-multi-line.pbf",
    "singleton-multi-point.pbf",
    "singleton-multi-polygon.pbf",
    "stacked-multipolygon.pbf",
    "zero-line.pbf",
    "zero-point.pbf",
    "zero-polygon.pbf",
]


@pytest.mark.parametrize("name", ROUNDTRIP_FIXTURES)
def test_writer_output_decodes_foreign(name):
    raw = open(os.path.join(FIXTURES, name), "rb").read()
    original = VectorTile(raw)
    # mapbox_support=True is the spec-conformant flavor — the one the
    # reference feeds to @mapbox/vector-tile in its own cross-check (the
    # default S2 flavor renumbers fields and is NOT spec MVT)
    rewritten = write_mvt(mvt_tile_to_base_layers(original), mapbox_support=True)
    foreign = independent_read_mvt(rewritten)

    assert set(foreign.keys()) == set(original.layers.keys())
    for lname, layer in original.layers.items():
        got = foreign[lname]
        # spec MVT allows only 1/2 — the writer stamps 1 on the mapbox
        # path; accepting 5 here would let an open-flavor regression slip
        # past the foreign-reader check this test exists to provide
        assert got["version"] in (1, 2)
        assert got["extent"] == layer.extent
        assert len(got["features"]) == len(layer)
        for i in range(len(layer)):
            want = layer.feature(i)
            have = got["features"][i]
            assert have["type"] == want.ftype, (lname, i)
            assert (have["id"] or None) == (want.id or None), (lname, i)
            assert _norm_props(have["properties"]) == _norm_props(
                dict(want.properties)
            ), (lname, i)
            assert have["parts"] == _expected_parts(want), (lname, i)


def test_independent_reader_agrees_on_original_fixture():
    """Sanity: the spec-derived reader decodes the UPSTREAM bytes to the
    published expectations too (guards against reader+writer sharing a
    mistaken convention)."""
    raw = open(os.path.join(FIXTURES, "14-8801-5371.vector.pbf"), "rb").read()
    tile = independent_read_mvt(raw)
    poi = tile["poi_label"]
    assert len(poi["features"]) == 558
    park = poi["features"][11]
    assert park["id"] == 3000003150561
    assert park["properties"]["name"] == "Mauerpark"
    assert park["properties"]["type"] == "Park"
    assert park["parts"] == [[(3898, 1731)]]
    building = tile["building"]["features"][0]
    assert building["parts"] == [
        [(2039, -32), (2035, -31), (2032, -31), (2032, -32)]
    ]

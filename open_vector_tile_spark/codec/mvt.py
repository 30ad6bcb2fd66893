"""Legacy Mapbox/S2 vector-tile codec.

Reader re-expresses src/mapbox/vectorLayer.ts + src/mapbox/vectorFeature.ts
(command-stream decode :251-315, classifyRings :357-381, signedArea :387-395).
Writer re-expresses src/mapbox/writeMVTile.ts.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np

from .feature import BaseFeature, BaseLine
from .kernels import command_encode, zigzag
from .pbf import PbfReader, PbfWriter


def signed_area(ring: list) -> float:
    """Shoelace sum, reference orientation (src/mapbox/vectorFeature.ts:387-395)."""
    pts = np.asarray([(p[0], p[1]) for p in ring], dtype=np.float64)
    if len(pts) == 0:
        return 0.0
    prev = np.roll(pts, 1, axis=0)
    return float(np.sum((prev[:, 0] - pts[:, 0]) * (pts[:, 1] + prev[:, 1])))


def classify_rings(rings: list) -> list:
    """Group rings into polygons by signed-area winding; area==0 dropped
    (src/mapbox/vectorFeature.ts:357-381)."""
    if len(rings) <= 1:
        return [rings]
    polygons: list = []
    polygon: Optional[list] = None
    ccw: Optional[bool] = None
    for ring in rings:
        area = signed_area(ring)
        if area == 0:
            continue
        if ccw is None:
            ccw = area < 0
        if ccw == (area < 0):
            if polygon is not None:
                polygons.append(polygon)
            polygon = [ring]
        else:
            if polygon is None:
                polygon = []
            polygon.append(ring)
    if polygon is not None:
        polygons.append(polygon)
    return polygons


@dataclass
class MvtFeature:
    """Decoded Mapbox/S2 feature."""

    ftype: int
    id: Optional[int]
    properties: dict
    extent: int
    is_s2: bool
    version: int
    _pbf: PbfReader = None  # type: ignore[assignment]
    _geometry_pos: int = -1
    _indices_pos: int = -1
    _tess_pos: int = -1

    def load_geometry(self) -> Any:
        """Cursor walk of MoveTo(1)/LineTo(2)/ClosePath(7)/ClosePolygon(4)
        (src/mapbox/vectorFeature.ts:251-315)."""
        pbf = self._pbf
        pbf.pos = self._geometry_pos
        end = pbf.read_varint() + pbf.pos
        points: list = []
        lines: list = []
        polys: list = []
        cmd = 1
        length = 0
        x = y = 0
        current: list = []
        while pbf.pos < end:
            if length <= 0:
                word = pbf.read_varint()
                cmd = word & 0x7
                length = word >> 3
            length -= 1
            if cmd in (1, 2):
                x += pbf.read_svarint()
                y += pbf.read_svarint()
                if cmd == 1:  # MoveTo
                    if current:
                        if self.ftype == 1:
                            points.extend(current)
                        else:
                            lines.append(current)
                    current = []
                current.append((x, y))
            elif cmd == 7:  # ClosePath
                if current:
                    current.append((current[0][0], current[0][1]))
                    lines.append(current)
                    current = []
            elif cmd == 4:  # ClosePolygon (S2 extension)
                if current:
                    lines.append(current)
                polys.append(lines)
                lines = []
                current = []
            else:
                raise ValueError(f"unknown command {cmd}")
        if current:
            if self.ftype == 1:
                points.extend(current)
            else:
                lines.append(current)
        if self.ftype == 3 and not self.is_s2:
            polys = classify_rings(lines)
        if self.ftype == 1:
            return points
        if polys:
            return polys
        return lines

    def read_indices(self) -> list:
        """(src/mapbox/vectorFeature.ts:318-332)."""
        if self._indices_pos <= 0:
            return []
        pbf = self._pbf
        pbf.pos = self._indices_pos
        end = pbf.read_varint() + pbf.pos
        curr = 0
        out = []
        while pbf.pos < end:
            curr += pbf.read_svarint()
            out.append(curr)
        return out

    def read_tessellation(self) -> list:
        """Raw tessellation points in tile coords (:339-350 without multiplier)."""
        if self._tess_pos <= 0:
            return []
        pbf = self._pbf
        pbf.pos = self._tess_pos
        end = pbf.read_varint() + pbf.pos
        x = y = 0
        out = []
        while pbf.pos < end:
            x += pbf.read_svarint()
            y += pbf.read_svarint()
            out.append((x, y))
        return out

    def to_base(self) -> BaseFeature:
        """MVT feature -> write-side IR (src/base/vectorFeature.ts:380-413)."""
        geometry = self.load_geometry()
        indices = self.read_indices()
        tess = self.read_tessellation()
        t = self.ftype
        if t == 1:
            return BaseFeature(1, list(geometry), self.properties, self.id)
        if t == 2:
            return BaseFeature(
                2, [BaseLine(points=ln) for ln in geometry], self.properties, self.id
            )
        if t in (3, 4):
            polys = [[BaseLine(points=ln) for ln in poly] for poly in geometry]
            return BaseFeature(
                3,
                polys,
                self.properties,
                self.id,
                indices=indices,
                tessellation=tess,
            )
        raise ValueError(f"Unknown feature type: {t}")


class MvtLayer:
    """(src/mapbox/vectorLayer.ts:12-99)."""

    def __init__(self, pbf: PbfReader, end: int, is_s2: bool = False) -> None:
        self.version = 5
        self.name = "default"
        self.extent = 4096
        self.is_s2 = is_s2
        self._pbf = pbf
        self._keys: list[str] = []
        self._values: list = []
        self._features_pos: list[int] = []
        self._features: dict[int, MvtFeature] = {}

        def handler(fld: int, wt: int, reader: PbfReader) -> None:
            if fld == 15:
                self.version = reader.read_varint()
            elif fld == 1:
                self.name = reader.read_string()
            elif fld == 2:
                self._features_pos.append(reader.pos)
            elif fld == 3:
                self._keys.append(reader.read_string())
            elif fld == 4:
                self._values.append(_read_value_message(reader))
            elif fld == 5:
                self.extent = reader.read_varint()

        pbf.read_fields(handler, end)

    def __len__(self) -> int:
        return len(self._features_pos)

    @property
    def length(self) -> int:
        return len(self._features_pos)

    def feature(self, i: int) -> MvtFeature:
        if not 0 <= i < len(self._features_pos):
            raise IndexError("feature index out of bounds")
        cached = self._features.get(i)
        if cached is not None:
            return cached
        pbf = self._pbf
        pbf.pos = self._features_pos[i]
        end = pbf.read_varint() + pbf.pos
        feat = MvtFeature(
            ftype=1,
            id=None,
            properties={},
            extent=self.extent,
            is_s2=self.is_s2,
            version=self.version,
            _pbf=pbf,
        )

        def handler(fld: int, wt: int, reader: PbfReader) -> None:
            # S2 layout shifts fields by one vs mapbox (vectorFeature.ts:112-129)
            if self.is_s2:
                if fld == 15:
                    feat.id = reader.read_varint()
                elif fld == 1:
                    _read_tag(reader, feat, self._keys, self._values)
                elif fld == 2:
                    feat.ftype = reader.read_varint()
                elif fld == 3:
                    feat._geometry_pos = reader.pos
                elif fld == 4:
                    feat._indices_pos = reader.pos
                elif fld == 5:
                    feat._tess_pos = reader.pos
            else:
                if fld == 1:
                    feat.id = reader.read_varint()
                elif fld == 2:
                    _read_tag(reader, feat, self._keys, self._values)
                elif fld == 3:
                    feat.ftype = reader.read_varint()
                elif fld == 4:
                    feat._geometry_pos = reader.pos
                elif fld == 5:
                    feat._indices_pos = reader.pos
                elif fld == 6:
                    feat._tess_pos = reader.pos

        pbf.read_fields(handler, end)
        self._features[i] = feat
        return feat

    def features(self) -> list[MvtFeature]:
        return [self.feature(i) for i in range(len(self))]


def _read_tag(pbf: PbfReader, feat: MvtFeature, keys: list, values: list) -> None:
    end = pbf.read_varint() + pbf.pos
    while pbf.pos < end:
        key = keys[pbf.read_varint()]
        value = values[pbf.read_varint()]
        feat.properties[key] = value


def _read_value_message(pbf: PbfReader):
    """(src/mapbox/vectorLayer.ts:79-98)."""
    value = None
    end = pbf.read_varint() + pbf.pos
    while pbf.pos < end:
        tag = pbf.read_varint() >> 3
        if tag == 1:
            value = pbf.read_string()
        elif tag == 2:
            value = pbf.read_float()
        elif tag == 3:
            value = pbf.read_double()
        elif tag in (4, 5):
            value = pbf.read_varint()
        elif tag == 6:
            value = pbf.read_svarint()
        elif tag == 7:
            value = pbf.read_boolean()
        else:
            value = None
    return value


# ---------------------------------------------------------------------------
# MVT writer (src/mapbox/writeMVTile.ts)
# ---------------------------------------------------------------------------


def write_mvt(layers: list, mapbox_support: bool = False) -> bytes:
    """layers: list of BaseLayer-like objects with .name/.extent/.features
    (src/mapbox/writeMVTile.ts:45-66)."""
    out = PbfWriter()
    for layer in layers:
        out.write_message(3 if mapbox_support else 1, _write_layer(layer, mapbox_support))
    return out.commit()


def _write_layer(layer, mapbox: bool) -> bytes:
    pbf = PbfWriter()
    pbf.write_varint_field(15, 1 if mapbox else 5)
    pbf.write_string_field(1, layer.name or "")
    pbf.write_varint_field(5, layer.extent or 4096)
    keys: list = []
    values: list = []
    keycache: dict = {}
    valuecache: dict = {}
    for feature in layer.features:
        pbf.write_message(2, _write_feature(feature, keys, values, keycache, valuecache, mapbox))
    for k in keys:
        pbf.write_string_field(3, k)
    for v in values:
        pbf.write_message(4, _write_value(v))
    return pbf.commit()


def _write_feature(feature: BaseFeature, keys, values, keycache, valuecache, mapbox: bool) -> bytes:
    pbf = PbfWriter()
    ftype = feature.ftype
    if ftype == 3:
        ftype = 4  # polys upgraded to S2 multipolygon type (:109)
    if feature.id is not None:
        pbf.write_varint_field(1 if mapbox else 15, feature.id)
    pbf.write_message(2 if mapbox else 1, _write_properties(feature, keys, values, keycache, valuecache))
    out_type = 3 if (mapbox and ftype == 4) else ftype
    pbf.write_varint_field(3 if mapbox else 2, out_type)
    pbf.write_message(4 if mapbox else 3, _write_geometry(feature, ftype, mapbox))
    if feature.indices:
        pbf.write_message(5 if mapbox else 4, _write_indices(feature.indices))
    if feature.tessellation:
        pbf.write_message(6 if mapbox else 5, _write_tessellation(feature.tessellation))
    return pbf.commit()


def _write_properties(feature: BaseFeature, keys, values, keycache, valuecache) -> bytes:
    import json

    pbf = PbfWriter()
    for key, value in feature.properties.items():
        key_index = keycache.get(key)
        if key_index is None:
            keys.append(key)
            key_index = len(keys) - 1
            keycache[key] = key_index
        pbf.write_varint(key_index)
        if not isinstance(value, (str, bool, int, float)):
            value = json.dumps(value, separators=(",", ":"))
        value_key = f"{_js_typeof(value)}:{value}"
        value_index = valuecache.get(value_key)
        if value_index is None:
            values.append(value)
            value_index = len(values) - 1
            valuecache[value_key] = value_index
        pbf.write_varint(value_index)
    return pbf.commit()


def _js_typeof(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    return "string"


def _write_value(value) -> bytes:
    """(src/mapbox/writeMVTile.ts:293-307)."""
    pbf = PbfWriter()
    if isinstance(value, bool):
        pbf.write_boolean_field(7, value)
    elif isinstance(value, str):
        pbf.write_string_field(1, value)
    elif isinstance(value, (int, float)):
        if float(value) % 1 != 0:
            pbf.write_double_field(3, float(value))
        elif value < 0:
            pbf.write_svarint_field(6, int(value))
        else:
            pbf.write_varint_field(5, int(value))
    return pbf.commit()


def _write_indices(indices) -> bytes:
    pbf = PbfWriter()
    curr = 0
    for index in indices:
        pbf.write_varint(int(zigzag(index - curr)))
        curr = index
    return pbf.commit()


def _write_tessellation(points) -> bytes:
    pbf = PbfWriter()
    x = y = 0
    for p in points:
        pbf.write_varint(int(zigzag(p[0] - x)))
        pbf.write_varint(int(zigzag(p[1] - y)))
        x, y = p[0], p[1]
    return pbf.commit()


def _write_geometry(feature: BaseFeature, ftype: int, mapbox: bool) -> bytes:
    pbf = PbfWriter()
    if ftype == 1:
        _write_point_geometry(feature.geometry, pbf)
    elif ftype == 4:
        geometry = [[ln.points for ln in poly] for poly in feature.geometry]
        _write_multipoly_geometry(geometry, pbf, mapbox)
    else:
        is_poly = False  # type 2 lines at this stage; polys routed to type 4
        geometry = [ln.points for ln in feature.geometry]
        _write_lines_geometry(geometry, is_poly, pbf)
    return pbf.commit()


def _write_point_geometry(points, pbf: PbfWriter) -> None:
    x = y = 0
    for p in points:
        pbf.write_varint(int(command_encode(1, 1)))
        pbf.write_varint(int(zigzag(p[0] - x)))
        pbf.write_varint(int(zigzag(p[1] - y)))
        x, y = p[0], p[1]


def _write_lines_geometry(lines, polygon: bool, pbf: PbfWriter) -> None:
    x = y = 0
    for ring in lines:
        pbf.write_varint(int(command_encode(1, 1)))
        count = len(ring) - 1 if polygon else len(ring)
        for i in range(count):
            if i == 1:
                pbf.write_varint(int(command_encode(2, count - 1)))
            pbf.write_varint(int(zigzag(ring[i][0] - x)))
            pbf.write_varint(int(zigzag(ring[i][1] - y)))
            x, y = ring[i][0], ring[i][1]
        if polygon:
            pbf.write_varint(int(command_encode(7, 1)))


def _write_multipoly_geometry(polys, pbf: PbfWriter, mapbox: bool) -> None:
    x = y = 0
    for poly in polys:
        for ring in poly:
            pbf.write_varint(int(command_encode(1, 1)))
            count = len(ring) - 1
            for i in range(count):
                if i == 1:
                    pbf.write_varint(int(command_encode(2, count - 1)))
                pbf.write_varint(int(zigzag(ring[i][0] - x)))
                pbf.write_varint(int(zigzag(ring[i][1] - y)))
                x, y = ring[i][0], ring[i][1]
            pbf.write_varint(int(command_encode(7, 1)))  # ClosePath
        pbf.write_varint(int(command_encode(7 if mapbox else 4, 1)))  # ClosePolygon

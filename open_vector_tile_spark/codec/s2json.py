"""S2JSON source adapter: S2JSON tile dicts -> write-side IR (S11).

Mirrors ``BaseVectorTile.fromS2JSONTile`` (src/base/vectorTile.ts:30-49) and
``fromS2JSONFeature`` (src/base/vectorFeature.ts:421-576): geometry types
Point / MultiPoint / LineString / MultiLineString / Polygon / MultiPolygon,
each optionally 3D (``is3D``), with per-line dash ``offset`` (scalar for
LineString, list for MultiLineString/Polygon rings, nested list for
MultiPolygon), ``bbox``, and earcut ``indices``/``tessellation`` on polygons.

Coordinates arrive in transformed [0,1] tile space and are quantized with
JS ``Math.round`` semantics (floor(v*extent + 0.5) — half-up), the same P13
rule the tiler applies (src/base/vectorFeature.ts:584-601).

The reference's S2JSON path does NOT carry M-values (fromS2JSONFeature reads
only coordinates/offset/bbox/indices/tessellation); we mirror that.
"""

from __future__ import annotations

import math
from typing import Optional

from .feature import BaseFeature, BaseLine
from .layer import BaseLayer


def _round_js(v: float) -> int:
    return int(math.floor(v + 0.5))


def _pt(p, extent: int) -> tuple:
    """{x,y} dict or (x,y) pair in [0,1] -> extent-quantized int pair."""
    if isinstance(p, dict):
        x, y = p["x"], p["y"]
    else:
        x, y = p[0], p[1]
    return (_round_js(x * extent), _round_js(y * extent))


def _pt3(p, extent: int) -> tuple:
    if isinstance(p, dict):
        x, y, z = p["x"], p["y"], p.get("z", 0.0)
    else:
        x, y = p[0], p[1]
        z = p[2] if len(p) > 2 else 0.0
    return (_round_js(x * extent), _round_js(y * extent), _round_js(z * extent))


def _tess_pairs(tess) -> list:
    """Tessellation as [(x,y), ...]: accepts pairs or a flat number list."""
    if not tess:
        return []
    first = tess[0]
    if isinstance(first, (list, tuple)):
        return [(int(p[0]), int(p[1])) for p in tess]
    if isinstance(first, dict):
        return [(int(p["x"]), int(p["y"])) for p in tess]
    return [(int(tess[i]), int(tess[i + 1])) for i in range(0, len(tess), 2)]


def s2json_feature_to_base(feature: dict, extent: int) -> BaseFeature:
    """One S2JSON feature -> BaseFeature (src/base/vectorFeature.ts:421-576)."""
    geometry = feature["geometry"]
    gtype = geometry["type"]
    is3d = bool(geometry.get("is3D", False))
    coords = geometry["coordinates"]
    bbox = geometry.get("bbox")
    offset = geometry.get("offset")
    props = feature.get("properties", {}) or {}
    fid = feature.get("id")
    tp = _pt3 if is3d else _pt

    def line(points, off) -> BaseLine:
        return BaseLine(points=[tp(p, extent) for p in points], offset=float(off or 0.0))

    if gtype == "Point":
        return BaseFeature(4 if is3d else 1, [tp(coords, extent)], props, fid, bbox=bbox)
    if gtype == "MultiPoint":
        return BaseFeature(
            4 if is3d else 1, [tp(p, extent) for p in coords], props, fid, bbox=bbox
        )
    if gtype == "LineString":
        return BaseFeature(5 if is3d else 2, [line(coords, offset)], props, fid, bbox=bbox)
    if gtype == "MultiLineString":
        lines = [line(ln, offset[i] if offset else None) for i, ln in enumerate(coords)]
        return BaseFeature(5 if is3d else 2, lines, props, fid, bbox=bbox)
    if gtype == "Polygon":
        poly = [line(ln, offset[i] if offset else None) for i, ln in enumerate(coords)]
        return BaseFeature(
            6 if is3d else 3,
            [poly],
            props,
            fid,
            bbox=bbox,
            indices=list(geometry.get("indices") or []),
            tessellation=_tess_pairs(geometry.get("tessellation")),
        )
    if gtype == "MultiPolygon":
        polys = [
            [
                line(ln, offset[i][j] if offset else None)
                for j, ln in enumerate(poly)
            ]
            for i, poly in enumerate(coords)
        ]
        return BaseFeature(
            6 if is3d else 3,
            polys,
            props,
            fid,
            bbox=bbox,
            indices=list(geometry.get("indices") or []),
            tessellation=_tess_pairs(geometry.get("tessellation")),
        )
    raise ValueError(f"Unknown geometry type: {gtype}")


def s2json_to_base_layers(tile: dict, layer_map: Optional[dict] = None) -> list[BaseLayer]:
    """S2JSON tile dict -> BaseLayer list (BaseVectorTile.fromS2JSONTile,
    src/base/vectorTile.ts:39-49 + BaseVectorLayer.fromS2JSONLayer,
    src/base/vectorLayer.ts:100-114).

    ``layer_map`` mirrors S2JSONLayerMap: per-layer dict (or
    operators.LayerSpec) with extent/shape/mshape; absent layers default to
    extent 4096 with inferred shapes.
    """
    if not tile.get("transformed"):
        raise ValueError("The vector tile must be transformed first")
    out = []
    for name, layer in tile["layers"].items():
        guide = (layer_map or {}).get(name)
        if guide is None:
            extent, shape, mshape = 4096, None, None
        elif isinstance(guide, dict):
            extent = guide.get("extent", 4096)
            shape = guide.get("shape")
            mshape = guide.get("mshape")
        else:  # operators.tiler.LayerSpec
            extent, shape, mshape = guide.extent, guide.shape, guide.mshape
        base = BaseLayer(
            name=layer.get("name", name),
            extent=extent,
            shape=dict(shape) if shape else None,
            mshape=dict(mshape) if mshape else None,
        )
        for feat in layer["features"]:
            base.add_feature(s2json_feature_to_base(feat, base.extent))
        out.append(base)
    return out

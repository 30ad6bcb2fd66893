"""Tile materialization: normalized feature rows -> OVT tile bytes.

Spark tracing (SURVEY §3.2): feature DataFrame -> ``repartition(zoom, tile_x,
tile_y)`` (the rule-pinned shuffle key) -> ``groupBy(...).applyInPandas
(encode_tile)`` (JVM->Python Arrow boundary) -> ``(zoom, x, y, tile, n_features,
n_bytes)`` rows for the tiles table sink.

The per-tile encoder builds the write-side IR (codec.BaseLayer/BaseFeature)
and emits bytes with the byte-exact codec — all reference ordering rules
(feature-type sort O2, two-phase number-column index assignment §3.2) live in
the codec, not here.

Feature row schema (FIXTURES.md §6):
  zoom int, tile_x long, tile_y long, layer string, extent int,
  id long, ftype int,
  geom_xy array<int>      -- interleaved vertices (2D: x,y | 3D: x,y,z)
  ring_lens array<int>    -- vertices per line/ring (empty for points)
  poly_lens array<int>    -- rings per polygon (empty unless type 3/6)
  offsets array<double>, bbox array<double>,
  indices array<int>, tess_xy array<int>,
  props_json string       -- per-feature properties (generic carrier)
  mvals_json string       -- nullable per-vertex M-values
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import BaseFeature, BaseLayer, BaseLine, write_ov_tile

FEATURE_SCHEMA = (
    "zoom int, tile_x long, tile_y long, layer string, extent int, "
    "id long, ftype int, geom_xy array<int>, ring_lens array<int>, "
    "poly_lens array<int>, offsets array<double>, bbox array<double>, "
    "indices array<int>, tess_xy array<int>, props_json string, mvals_json string"
)

TILE_SCHEMA = "zoom int, tile_x long, tile_y long, tile binary, n_features long, n_bytes long"


@dataclass
class LayerSpec:
    """Engine analogue of the reference's S2JSONLayerGuide
    (src/base/vectorLayer.ts:118-128): pin extent/shape per layer."""

    extent: int = 4096
    shape: Optional[dict] = None
    mshape: Optional[dict] = None


def rows_to_base_feature(row: pd.Series) -> BaseFeature:
    """One feature row -> write-side IR."""
    ftype = int(row["ftype"])
    dims = 3 if ftype in (4, 5, 6) else 2
    geom = row["geom_xy"]
    geom = [] if geom is None else list(geom)
    verts = [tuple(int(v) for v in geom[i : i + dims]) for i in range(0, len(geom), dims)]
    mvals = json.loads(row["mvals_json"]) if row.get("mvals_json") else None
    offsets = list(row["offsets"]) if row["offsets"] is not None else []

    if ftype in (1, 4):
        geometry: list = verts
        feature_mvals = mvals
    else:
        ring_lens = [int(x) for x in (row["ring_lens"] or [])]
        lines: list = []
        pos = 0
        flat_m = mvals if mvals else None
        mpos = 0
        for li, ln in enumerate(ring_lens):
            pts = verts[pos : pos + ln]
            pos += ln
            lm = None
            if flat_m is not None:
                lm = flat_m[mpos : mpos + ln]
                mpos += ln
            off = float(offsets[li]) if li < len(offsets) else 0.0
            lines.append(BaseLine(points=pts, offset=off, mvalues=lm))
        if ftype in (2, 5):
            geometry = lines
        else:
            poly_lens = [int(x) for x in (row["poly_lens"] or [])] or [len(lines)]
            geometry = []
            p = 0
            for n in poly_lens:
                geometry.append(lines[p : p + n])
                p += n
        feature_mvals = None

    fid = row["id"]
    tess_flat = list(row["tess_xy"] or [])
    return BaseFeature(
        ftype=ftype,
        geometry=geometry,
        properties=json.loads(row["props_json"]) if row["props_json"] else {},
        id=int(fid) if fid is not None and not pd.isna(fid) else None,
        bbox=list(row["bbox"]) if row["bbox"] is not None and len(row["bbox"]) else None,
        indices=[int(x) for x in (row["indices"] or [])],
        tessellation=[
            (int(tess_flat[i]), int(tess_flat[i + 1])) for i in range(0, len(tess_flat), 2)
        ],
        mvalues=feature_mvals,
    )


def encode_tile_group(pdf: pd.DataFrame, specs: Optional[dict] = None) -> pd.DataFrame:
    """All feature rows of one (zoom, tile_x, tile_y) -> one tile row."""
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["zoom", "tile_x", "tile_y", "tile", "n_features", "n_bytes"]
        )
    zoom = int(pdf["zoom"].iloc[0])
    tx = int(pdf["tile_x"].iloc[0])
    ty = int(pdf["tile_y"].iloc[0])
    layers = []
    for lname, group in pdf.groupby("layer", sort=True):
        spec = (specs or {}).get(lname, None)
        extent = int(group["extent"].iloc[0])
        layer = BaseLayer(
            name=str(lname),
            extent=spec.extent if spec else extent,
            shape=dict(spec.shape) if spec and spec.shape else None,
            mshape=dict(spec.mshape) if spec and spec.mshape else None,
        )
        for _, row in group.iterrows():
            layer.add_feature(rows_to_base_feature(row))
        layers.append(layer)
    tile_bytes = write_ov_tile(layers)
    return pd.DataFrame(
        {
            "zoom": [zoom],
            "tile_x": [tx],
            "tile_y": [ty],
            "tile": [tile_bytes],
            "n_features": [len(pdf)],
            "n_bytes": [len(tile_bytes)],
        }
    )


def encode_tiles(features: DataFrame, specs: Optional[dict] = None) -> DataFrame:
    """features (FEATURE_SCHEMA) -> tiles (TILE_SCHEMA).

    groupBy triggers exactly one shuffle keyed on (zoom, tile_x, tile_y); AQE
    coalesces/splits partitions at runtime (session config).
    """

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return encode_tile_group(pdf, specs)

    return features.groupBy("zoom", "tile_x", "tile_y").applyInPandas(encode, TILE_SCHEMA)


def points_to_features(
    points: DataFrame,
    zoom: int,
    layer: str,
    extent: int = 4096,
    lon: str = "lon",
    lat: str = "lat",
    id_col: Optional[str] = None,
    props_cols: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Point rows -> feature rows for ``encode_tiles``.

    All math is column-expression (JVM): mercator projection, tile assignment,
    extent quantization (P13: round(p*extent), JS half-up rounding).
    """
    from ..functions.geo import merc_x_col, merc_y_col

    n = float(1 << zoom)
    mx = merc_x_col(F.col(lon)) * F.lit(n)
    my = merc_y_col(F.col(lat)) * F.lit(n)
    tx = F.greatest(F.lit(0), F.least(F.lit(int(n) - 1), F.floor(mx))).cast("long")
    ty = F.greatest(F.lit(0), F.least(F.lit(int(n) - 1), F.floor(my))).cast("long")
    qx = F.floor((mx - tx) * F.lit(float(extent)) + F.lit(0.5)).cast("int")
    qy = F.floor((my - ty) * F.lit(float(extent)) + F.lit(0.5)).cast("int")
    props = (
        F.to_json(F.struct(*[F.col(c) for c in props_cols])) if props_cols else F.lit(None)
    )
    return points.select(
        F.lit(zoom).alias("zoom"),
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        F.lit(layer).alias("layer"),
        F.lit(extent).alias("extent"),
        (F.col(id_col).cast("long") if id_col else F.lit(None).cast("long")).alias("id"),
        F.lit(1).alias("ftype"),
        F.array(qx, qy).alias("geom_xy"),
        F.lit(None).cast("array<int>").alias("ring_lens"),
        F.lit(None).cast("array<int>").alias("poly_lens"),
        F.lit(None).cast("array<double>").alias("offsets"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("array<int>").alias("indices"),
        F.lit(None).cast("array<int>").alias("tess_xy"),
        props.alias("props_json"),
        F.lit(None).cast("string").alias("mvals_json"),
    )

"""Tile overzoom: derive zoom z+1 tiles from already-encoded zoom z
features — the tiling-server trick that serves deep zooms without storing
them (render the parent's geometry scaled into the child quadrant).

Semantics (the standard overzoom transform on QUANTIZED coordinates):
    child (i, j) in {0,1}^2 of tile (z, tx, ty) is (z+1, 2*tx+i, 2*ty+j)
    child coords: x' = 2*x - i*extent,  y' = 2*y - j*extent
    geometry kept where it intersects the buffered child square
    [-buffer, extent+buffer]^2 (points: vertex test; lines/polygons:
    Liang-Barsky / Sutherland-Hodgman clip via operators/clip.py).
Precision note: overzoom works on the parent's quantized grid, so child
coordinates are even multiples (half the child grid's resolution) — the
inherent fidelity of serving z+1 from z data, NOT a bug; re-tiling from
source coordinates is the full-fidelity path (points_to_features at the
deeper zoom).

Shape at 100 TB: both paths are map-side only — a feature expands into at
most 4 children with no shuffle; the downstream tile encode groups by the
child key exactly like any other featurizer output.

Fidelity carried: id/layer/extent/props pass through; line offsets are
re-derived by the clip kernel (parent offset scales by 2 — arc length
doubles with coordinates); tessellation/indices are invalidated (set
NULL) because vertex sets change; per-vertex M-values are dropped when
clipping alters the vertex set (documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clip import clip_polyline_np, clip_rings_np
from .tiler import FEATURE_SCHEMA

_CHILDREN = [(0, 0), (0, 1), (1, 0), (1, 1)]


def overzoom_points(features: DataFrame, buffer: int = 0) -> DataFrame:
    """Pure-column-expression overzoom for POINT features (ftype 1) — the
    bulk of a placename/POI layer; no Python anywhere.

    Input/output: FEATURE_SCHEMA-shaped rows (missing optional columns are
    tolerated and passed through/nulled).  Multipoints filter per vertex;
    a feature reaches a child only if at least one vertex survives.  When
    the vertex set shrinks, mvals_json is nulled (it indexes vertices)."""
    if buffer < 0:
        raise ValueError(f"buffer must be >= 0, got {buffer}")

    def _opt(name: str, typ: str) -> F.Column:
        return (
            F.col(name) if name in features.columns else F.lit(None).cast(typ)
        ).alias(name)

    ext = F.col("extent").cast("int")
    child = F.explode(
        F.array(*[F.struct(F.lit(i).alias("ci"), F.lit(j).alias("cj")) for i, j in _CHILDREN])
    ).alias("_c")
    ex = features.filter(F.col("ftype") == 1).select("*", child)
    g = F.col("geom_xy")
    npts = (F.size(g) / 2).cast("int")
    idx = F.sequence(F.lit(0), npts - 1)
    lo, hi = F.lit(-buffer), ext + F.lit(buffer)

    def _cx(k):
        return F.element_at(g, k * 2 + 1) * 2 - F.col("_c.ci") * ext

    def _cy(k):
        return F.element_at(g, k * 2 + 2) * 2 - F.col("_c.cj") * ext

    kept = F.filter(
        idx,
        lambda k: (_cx(k) >= lo) & (_cx(k) <= hi) & (_cy(k) >= lo) & (_cy(k) <= hi),
    )
    new_geom = F.flatten(F.transform(kept, lambda k: F.array(_cx(k), _cy(k))))
    out = ex.withColumn("_kept", kept).filter(F.size("_kept") > 0)
    return out.select(
        (F.col("zoom") + 1).cast("int").alias("zoom"),
        (F.col("tile_x") * 2 + F.col("_c.ci")).alias("tile_x"),
        (F.col("tile_y") * 2 + F.col("_c.cj")).alias("tile_y"),
        "layer",
        "extent",
        "id",
        "ftype",
        new_geom.cast("array<int>").alias("geom_xy"),
        F.array(F.size("_kept")).alias("ring_lens"),
        F.lit(None).cast("array<int>").alias("poly_lens"),
        F.lit(None).cast("array<double>").alias("offsets"),
        _opt("bbox", "array<double>"),
        F.lit(None).cast("array<int>").alias("indices"),
        F.lit(None).cast("array<int>").alias("tess_xy"),
        _opt("props_json", "string"),
        F.when(
            F.size("_kept") * 2 == F.size(g), _opt("mvals_json", "string")
        ).alias("mvals_json"),
    )


def _rows_of(pdf: pd.DataFrame) -> "list[dict]":
    return pdf.to_dict("records")


def _lst(v) -> list:
    """Arrow hands array columns back as numpy arrays (and NULL as None or
    NaN); normalize to a plain list so truthiness tests are unambiguous."""
    if v is None:
        return []
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, float):  # NaN placeholder for a NULL array cell
        return []
    return list(v)


def overzoom_features(features: DataFrame, buffer: int = 64) -> DataFrame:
    """Full overzoom over FEATURE_SCHEMA rows of any geometry type.

    Points route through the vertex test; lines (ftype 2) clip each part
    with Liang-Barsky and re-derive per-part arc-length offsets (parent
    offset x2 + clip offset); polygons (ftype 3) clip rings per polygon
    with Sutherland-Hodgman (a clipped-away outer ring deletes the
    polygon).  Clipped vertices re-quantize with the codec's half-up
    rounding.  Arrow-batched mapInPandas, per-feature numpy kernels —
    the same executor-side shape as the distributed featurizers."""
    if buffer < 0:
        raise ValueError(f"buffer must be >= 0, got {buffer}")
    buf = float(buffer)

    def gen(batches):
        for pdf in batches:
            out: list[dict] = []
            for row in _rows_of(pdf):
                ext = int(row["extent"])
                lo, hi = -buf, ext + buf
                g = np.asarray(_lst(row["geom_xy"]), dtype=np.float64).reshape(-1, 2)
                ftype = int(row["ftype"])
                ring_lens = [int(v) for v in _lst(row.get("ring_lens"))] or [len(g)]
                poly_lens = [int(v) for v in _lst(row.get("poly_lens"))]
                offsets = [float(v) for v in _lst(row.get("offsets"))]
                for ci, cj in _CHILDREN:
                    gc = g * 2.0 - np.array([ci * ext, cj * ext], dtype=np.float64)
                    base = {
                        "zoom": int(row["zoom"]) + 1,
                        "tile_x": int(row["tile_x"]) * 2 + ci,
                        "tile_y": int(row["tile_y"]) * 2 + cj,
                        "layer": row["layer"],
                        "extent": ext,
                        "id": row["id"],
                        "ftype": ftype,
                        "poly_lens": None,
                        "offsets": None,
                        "bbox": _lst(row.get("bbox")) or None,
                        "indices": None,
                        "tess_xy": None,
                        "props_json": row.get("props_json"),
                        "mvals_json": None,
                    }
                    if ftype == 1:
                        keep = (
                            (gc[:, 0] >= lo) & (gc[:, 0] <= hi)
                            & (gc[:, 1] >= lo) & (gc[:, 1] <= hi)
                        )
                        if not keep.any():
                            continue
                        kept = gc[keep].astype(np.int64)
                        base["geom_xy"] = kept.ravel().tolist()
                        base["ring_lens"] = [int(keep.sum())]
                        if keep.all():
                            base["mvals_json"] = row.get("mvals_json")
                        out.append(base)
                    elif ftype == 2:
                        pos = 0
                        new_parts: list[np.ndarray] = []
                        new_offs: list[float] = []
                        for pi, ln in enumerate(ring_lens):
                            part = gc[pos : pos + ln]
                            pos += ln
                            parts, offs = clip_polyline_np(
                                part, lo, lo, hi, hi, return_offsets=True
                            )
                            parent_off = 2.0 * (offsets[pi] if pi < len(offsets) else 0.0)
                            new_parts += parts
                            new_offs += [parent_off + o for o in offs]
                        if not new_parts:
                            continue
                        q = [np.floor(p + 0.5).astype(np.int64) for p in new_parts]
                        base["geom_xy"] = [
                            int(v) for p in q for v in p.ravel().tolist()
                        ]
                        base["ring_lens"] = [len(p) for p in q]
                        base["offsets"] = (
                            new_offs if any(o > 0.0 for o in new_offs) else None
                        )
                        out.append(base)
                    elif ftype == 3:
                        pos = 0
                        ri = 0
                        new_polys: list[list[np.ndarray]] = []
                        for nrings in (poly_lens or [len(ring_lens)]):
                            rings = []
                            for _ in range(nrings):
                                ln = ring_lens[ri]
                                rings.append(gc[pos : pos + ln])
                                pos += ln
                                ri += 1
                            clipped = clip_rings_np(rings, lo, lo, hi, hi)
                            if clipped:
                                new_polys.append(
                                    [np.floor(r + 0.5).astype(np.int64) for r in clipped]
                                )
                        if not new_polys:
                            continue
                        base["geom_xy"] = [
                            int(v)
                            for poly in new_polys
                            for r in poly
                            for v in r.ravel().tolist()
                        ]
                        base["ring_lens"] = [
                            len(r) for poly in new_polys for r in poly
                        ]
                        base["poly_lens"] = [len(p) for p in new_polys]
                        out.append(base)
                    # other ftypes (3D variants) pass: out of overzoom scope
            yield pd.DataFrame(
                out,
                columns=[
                    "zoom", "tile_x", "tile_y", "layer", "extent", "id",
                    "ftype", "geom_xy", "ring_lens", "poly_lens", "offsets",
                    "bbox", "indices", "tess_xy", "props_json", "mvals_json",
                ],
            )

    return features.mapInPandas(gen, schema=FEATURE_SCHEMA)

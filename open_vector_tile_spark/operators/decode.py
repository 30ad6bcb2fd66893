"""Table-level tile scan: tiles table -> feature/grid/image rows (S1 at scale).

The reference reads one tile lazily (position references, memoized columns —
src/vectorTile.ts:92-132, src/open/columnCache.ts:104-177); at table scale
the same economy comes from (a) Catalyst column pruning feeding the decoder
a ``layers`` request so non-requested layers are never touched inside the
blob (SURVEY §4 R1), and (b) Arrow-batched ``mapInPandas`` so tile bytes
never become JVM row objects.

Full fidelity: ``decode_tiles`` emits the tiler's FEATURE_SCHEMA —
ring/poly structure, dash offsets, bbox, per-vertex M-values, earcut
indices and tessellation — for BOTH OVT layers (wire tag 4,
src/open/vectorFeature.ts:182-329) and MVT/S2 layers (wire tags 1/3,
src/vectorTile.ts:104-121), so ``encode_tiles(decode_tiles(t))`` is a
lossless round trip.  Grids (tag 6) and images (tag 7) are surfaced by the
companion scans ``decode_grids`` / ``decode_images``.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..codec import TileDecodeError, VectorTile
from ..codec.layer import OVLayer
from ..codec.mvt import MvtLayer

DECODED_SCHEMA = (
    "zoom int, tile_x long, tile_y long, layer string, source string, "
    "extent int, feature_index int, id long, ftype int, n_vertices int, "
    "geom_xy array<int>, ring_lens array<int>, poly_lens array<int>, "
    "offsets array<double>, bbox array<double>, indices array<int>, "
    "tess_xy array<int>, props_json string, mvals_json string"
)

_DECODED_COLS = [
    "zoom", "tile_x", "tile_y", "layer", "source", "extent", "feature_index",
    "id", "ftype", "n_vertices", "geom_xy", "ring_lens", "poly_lens",
    "offsets", "bbox", "indices", "tess_xy", "props_json", "mvals_json",
]

GRID_SCHEMA = (
    "zoom int, tile_x long, tile_y long, name string, extent int, size int, "
    "grid_min double, grid_max double, data array<double>"
)

IMAGE_SCHEMA = (
    "zoom int, tile_x long, tile_y long, name string, type string, "
    "width int, height int, image binary"
)


def _flatten_geometry(f, ftype: int):
    """OVFeature/BaseFeature geometry (codec model) -> the tiler's columnar
    carriers: (flat verts, ring_lens, poly_lens, offsets, flat mvals).

    Inverse of operators/tiler.py:rows_to_base_feature, so the output row can
    be fed straight back into ``encode_tiles`` (read walkers it mirrors:
    src/open/vectorFeature.ts:182-329).
    """
    dims = 3 if ftype in (4, 5, 6) else 2
    ring_lens = poly_lens = offsets = None
    mflat: Optional[list] = None
    if ftype in (1, 4):
        verts = list(f.geometry)
        mv = getattr(f, "mvalues", None)
        if mv is not None and any(m is not None for m in mv):
            mflat = [m or {} for m in mv]
    else:
        if ftype in (2, 5):
            polys = [f.geometry]
            poly_lens = None
        else:
            polys = f.geometry
            poly_lens = [len(poly) for poly in polys]
        verts = []
        ring_lens = []
        offs: list[float] = []
        any_off = False
        any_m = False
        mtmp: list = []
        for poly in polys:
            for ln in poly:
                verts.extend(ln.points)
                ring_lens.append(len(ln.points))
                offs.append(float(ln.offset))
                if ln.offset > 0:
                    any_off = True
                if ln.mvalues is not None:
                    any_m = True
                    mtmp.extend(m or {} for m in ln.mvalues)
                else:
                    mtmp.extend({} for _ in ln.points)
        offsets = offs if any_off else None
        mflat = mtmp if any_m else None
    flat = [int(c) for p in verts for c in p[:dims]]
    return flat, len(verts), ring_lens, poly_lens, offsets, mflat


def _feature_row(zoom, tx, ty, lname, source, extent, i, f) -> tuple:
    ftype = int(f.ftype)
    flat, n_verts, ring_lens, poly_lens, offsets, mflat = _flatten_geometry(f, ftype)
    indices = list(f.indices) if getattr(f, "indices", None) else None
    tess = getattr(f, "tessellation", None)
    # writer stores tessellation as 2D pairs (src/open/vectorFeature.ts:737);
    # the 3D read asymmetry (:573) is upstream-lossy, so emit pairs
    tess_xy = [int(c) for p in tess for c in p[:2]] if tess else None
    bbox = [float(v) for v in f.bbox] if getattr(f, "bbox", None) else None
    fid = None
    if f.id is not None:
        # wire ids are u64 (varint); carry as two's-complement i64 in the
        # Spark long column (xxhash64 convention) — the tiler unwraps
        fid = int(f.id)
        if fid >= 1 << 63:
            fid -= 1 << 64
    return (
        zoom, tx, ty, lname, source, int(extent), i,
        fid,
        ftype, n_verts, flat, ring_lens, poly_lens, offsets, bbox, indices,
        tess_xy,
        json.dumps(f.properties, default=str),
        json.dumps(mflat, default=str) if mflat is not None else None,
    )


def decode_tiles(
    tiles: DataFrame,
    layers: Optional[list[str]] = None,
    sources: tuple = ("ovt", "mvt"),
    on_error: str = "fail",
) -> DataFrame:
    """tiles(zoom, tile_x, tile_y, tile) -> exploded feature rows.

    ``layers`` prunes decoding to the requested layer names: other layers'
    features are never parsed (the codec's lazy position references mean
    skipping a layer costs only its header scan).  ``sources`` selects wire
    families: "ovt" (tag 4) and/or "mvt" (tags 1/3 incl. legacy S2).

    ``on_error``: "fail" (default) raises :class:`TileDecodeError` on a
    corrupt blob; "skip" drops the offending TILE atomically (no partial
    feature output from a tile that fails mid-decode) and keeps the job
    alive — the operational choice at fleet scale where torn writes happen.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be fail|skip, got {on_error!r}")
    want = set(layers) if layers else None
    want_ovt = "ovt" in sources
    want_mvt = "mvt" in sources
    # lazy feature decode means truncation can surface as raw IndexError etc.
    # after the header parse; the codec owns the canonical class list
    from ..codec.tile import DECODE_ERROR_CLASSES as _DECODE_ERRORS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for zoom, tx, ty, blob in zip(
                pdf["zoom"].tolist(),
                pdf["tile_x"].tolist(),
                pdf["tile_y"].tolist(),
                pdf["tile"].tolist(),
            ):
                zoom, tx, ty = int(zoom), int(tx), int(ty)
                tile_rows: list[tuple] = []
                try:
                    parsed = VectorTile(bytes(blob))
                    for lname, layer in parsed.layers.items():
                        if want is not None and lname not in want:
                            continue
                        if isinstance(layer, OVLayer):
                            if not want_ovt:
                                continue
                            extent = layer.extent
                            for i in range(len(layer)):
                                tile_rows.append(
                                    _feature_row(
                                        zoom, tx, ty, lname, "ovt", extent, i,
                                        layer.feature(i),
                                    )
                                )
                        elif isinstance(layer, MvtLayer):
                            if not want_mvt:
                                continue
                            extent = layer.extent
                            src = "s2" if layer.is_s2 else "mvt"
                            for i in range(len(layer)):
                                tile_rows.append(
                                    _feature_row(
                                        zoom, tx, ty, lname, src, extent, i,
                                        layer.feature(i).to_base(),
                                    )
                                )
                except _DECODE_ERRORS as e:
                    if on_error == "skip":
                        continue
                    if isinstance(e, TileDecodeError):
                        raise
                    raise TileDecodeError(
                        f"tile ({zoom},{tx},{ty}): {type(e).__name__}: {e}"
                    ) from e
                out.extend(tile_rows)
            yield pd.DataFrame(out, columns=_DECODED_COLS)

    return tiles.mapInPandas(run, DECODED_SCHEMA)


def decode_grids(
    tiles: DataFrame, names: Optional[list[str]] = None, on_error: str = "fail"
) -> DataFrame:
    """tiles -> one row per embedded grid layer (wire tag 6,
    src/open/gridLayer.ts:7-48), data dequantized to float64.

    ``on_error`` mirrors :func:`decode_tiles`: "skip" drops a corrupt tile
    atomically instead of failing the scan."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be fail|skip, got {on_error!r}")
    want = set(names) if names else None
    from ..codec.tile import DECODE_ERROR_CLASSES as _DECODE_ERRORS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for zoom, tx, ty, blob in zip(
                pdf["zoom"].tolist(), pdf["tile_x"].tolist(),
                pdf["tile_y"].tolist(), pdf["tile"].tolist(),
            ):
                tile_rows: list[tuple] = []
                try:
                    parsed = VectorTile(bytes(blob))
                    for name, g in parsed.grids.items():
                        if want is not None and name not in want:
                            continue
                        tile_rows.append(
                            (
                                int(zoom), int(tx), int(ty), name, int(g.extent),
                                int(g.size), float(g.min), float(g.max),
                                [float(v) for v in g.data()],
                            )
                        )
                except _DECODE_ERRORS as e:
                    if on_error == "skip":
                        continue
                    if isinstance(e, TileDecodeError):
                        raise
                    raise TileDecodeError(
                        f"tile ({zoom},{tx},{ty}): {type(e).__name__}: {e}"
                    ) from e
                out.extend(tile_rows)
            yield pd.DataFrame(
                out,
                columns=[
                    "zoom", "tile_x", "tile_y", "name", "extent", "size",
                    "grid_min", "grid_max", "data",
                ],
            )

    return tiles.mapInPandas(run, GRID_SCHEMA)


def decode_images(
    tiles: DataFrame, names: Optional[list[str]] = None, on_error: str = "fail"
) -> DataFrame:
    """tiles -> one row per embedded image layer (wire tag 7,
    src/open/imageLayer.ts:37-73), bytes passed through untouched.

    ``on_error`` mirrors :func:`decode_tiles`: "skip" drops a corrupt tile
    atomically instead of failing the scan."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be fail|skip, got {on_error!r}")
    want = set(names) if names else None
    from ..codec.tile import DECODE_ERROR_CLASSES as _DECODE_ERRORS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for zoom, tx, ty, blob in zip(
                pdf["zoom"].tolist(), pdf["tile_x"].tolist(),
                pdf["tile_y"].tolist(), pdf["tile"].tolist(),
            ):
                tile_rows: list[tuple] = []
                try:
                    parsed = VectorTile(bytes(blob))
                    for name, img in parsed.images.items():
                        if want is not None and name not in want:
                            continue
                        tile_rows.append(
                            (
                                int(zoom), int(tx), int(ty), name, img.type,
                                int(img.width), int(img.height), img.image(),
                            )
                        )
                except _DECODE_ERRORS as e:
                    if on_error == "skip":
                        continue
                    if isinstance(e, TileDecodeError):
                        raise
                    raise TileDecodeError(
                        f"tile ({zoom},{tx},{ty}): {type(e).__name__}: {e}"
                    ) from e
                out.extend(tile_rows)
            yield pd.DataFrame(
                out,
                columns=[
                    "zoom", "tile_x", "tile_y", "name", "type",
                    "width", "height", "image",
                ],
            )

    return tiles.mapInPandas(run, IMAGE_SCHEMA)


def read_tileset(
    spark,
    path: str,
    layers: Optional[list[str]] = None,
    sources: tuple = ("ovt", "mvt"),
    num_partitions: int = 8,
    where=None,
) -> DataFrame:
    """One-liner tileset scan: directory of ``z_x_y.{mvt,pbf,ovt}`` files ->
    decoded feature rows (FEATURE_SCHEMA).

    Composes the DataSourceV2 tileset source (partition-parallel file reads)
    with the pruning decoder.  ``where`` is a Column predicate over
    zoom/tile_x/tile_y applied BEFORE the decode — Catalyst pushes it into
    the source's ``pushFilters``, so pruned files are never opened; a filter
    applied by the caller on the returned frame runs after decode (the
    mapInPandas is a planning barrier).  ``layers`` prunes inside the blob.
    """
    from ..sources.tileset import OvtTilesetDataSource

    spark.dataSource.register(OvtTilesetDataSource)
    tiles = (
        spark.read.format("ovt_tileset")
        .option("path", path)
        .option("num_partitions", str(num_partitions))
        .load()
    )
    if where is not None:
        tiles = tiles.filter(where)
    return decode_tiles(
        tiles.select("zoom", "tile_x", "tile_y", "tile"), layers=layers, sources=sources
    )

"""Tileset merge/overlay: combine two tilesets at the layer level.

The standard composition op for tile pipelines (base layers + overlay,
incremental layer refresh): a FULL OUTER join on the tile key aligns the two
tilesets, then each pair of blobs merges to the union of their vector
layers / grids / images (name collisions resolved by ``prefer``).  Tiles
present on only one side pass through byte-unchanged (header-only parse for
the feature count; feature bodies are never decoded in the no-overlap case).

Scale shape: one shuffle on the tile key (the join); the merge itself is
per-row Python over only the INTERSECTING tiles — for disjoint tilesets the
Arrow batch path moves bytes without parsing them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec.tile import VectorTile, grid_to_dict, image_to_dict, merge_tile_bytes

TILE_KEY = ["zoom", "tile_x", "tile_y"]

# Same shape as tiler.TILE_SCHEMA so merged/extracted tilesets compose with
# freshly encoded ones (unionByName, retile_incremental) without surgery.
MERGED_SCHEMA = (
    "zoom int, tile_x long, tile_y long, tile binary, n_features long, n_bytes long"
)


def _count_features(blob: bytes) -> int:
    """Feature count via a header-only parse (layers are lazy: feature
    bodies are never decoded, so this is cheap even for pass-through
    tiles)."""
    return sum(len(layer) for layer in VectorTile(blob).layers.values())


def merge_tilesets(a: DataFrame, b: DataFrame, prefer: str = "b") -> DataFrame:
    """tiles(zoom, tile_x, tile_y, tile) ⋈ tiles -> merged tiles.

    ``prefer`` ("a" | "b") picks the winner when both sides carry a layer /
    grid / image of the same name in the same tile."""
    if prefer not in ("a", "b"):
        raise ValueError(f"prefer must be 'a'|'b', got {prefer!r}")
    ja = a.select(*TILE_KEY, F.col("tile").alias("_ta"))
    jb = b.select(*TILE_KEY, F.col("tile").alias("_tb"))
    joined = ja.join(jb, on=TILE_KEY, how="full_outer")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tiles = []
            for ta, tb in zip(pdf["_ta"], pdf["_tb"]):
                ta = bytes(ta) if ta is not None else None
                tb = bytes(tb) if tb is not None else None
                tiles.append(merge_tile_bytes(ta, tb, prefer))
            out = pdf[TILE_KEY].copy()
            out["tile"] = tiles
            out["n_features"] = [_count_features(t) for t in tiles]
            out["n_bytes"] = [len(t) for t in tiles]
            yield out

    return joined.mapInPandas(run, MERGED_SCHEMA)


def extract_layers(
    tiles: DataFrame,
    keep: list[str],
    keep_grids: bool = False,
    keep_images: bool = False,
) -> DataFrame:
    """Project a tileset down to a subset of its vector layers — the serving
    op for "ship only the roads layer to this consumer".  Tiles that end up
    empty are dropped.  Because the OVT→IR conversion is lossless (decoded
    shape carried through), extracting layer L from a tile that was built
    from L alone reproduces the original bytes.

    Like ``merge_tile_bytes``, output is always the OVT wire family: an MVT
    input layer is value-losslessly re-encoded as OVT (not MVT bytes), so
    byte-identity holds only for layers that were already OVT."""
    from ..codec.tile import VectorTile, tile_to_base_layers, write_ov_tile

    want = set(keep)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, tx, ty, blob in zip(
                pdf["zoom"], pdf["tile_x"], pdf["tile_y"], pdf["tile"]
            ):
                t = VectorTile(bytes(blob))
                layers = [l for l in tile_to_base_layers(t) if l.name in want]
                grids = (
                    [grid_to_dict(g) for g in t.grids.values()]
                    if keep_grids and t.grids
                    else None
                )
                images = (
                    [image_to_dict(im) for im in t.images.values()]
                    if keep_images and t.images
                    else None
                )
                if not layers and grids is None and images is None:
                    continue
                out = write_ov_tile(layers=layers, images=images, grids=grids)
                nf = sum(len(l.features) for l in layers)
                rows.append((int(z), int(tx), int(ty), out, nf, len(out)))
            yield pd.DataFrame(
                rows,
                columns=["zoom", "tile_x", "tile_y", "tile", "n_features", "n_bytes"],
            )

    return tiles.select("zoom", "tile_x", "tile_y", "tile").mapInPandas(
        run, MERGED_SCHEMA
    )

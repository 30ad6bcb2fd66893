"""Incremental tiling: diff two snapshots of a point corpus, find the dirty
tiles, and re-encode ONLY those — unioning the untouched tile blobs from the
previous tileset.

Why: a 10^12-page corpus re-crawls a small fraction per cycle; re-encoding
the whole zoom pyramid per crawl is the single most wasteful job in a naive
pipeline.  The tile key (zoom, tile_x, tile_y) cleanly partitions the
output, so a dirty-set computation turns retiling into an embarrassingly
incremental job: cost scales with the CHANGED tiles, not the corpus.

The diff is one full-outer join on the document key (the same anti-join /
snapshot machinery as operators/resume.py, which supplies the change FEED;
this module consumes materialized before/after snapshots):

    base ⟗ new ON key →  insert  (base null)      → dirties new cell
                         delete  (new null)       → dirties base cell
                         move    (position moved) → dirties BOTH cells (may coincide)
                         touch   (payload equal)  → dirties nothing

``retile_incremental`` then = encode(points ⋉ dirty) ∪ (old_tiles ▷ dirty):
one semi join, one anti join, and an encode whose input is the dirty slice
only.  Byte-determinism of the encoder (sorted feature runs, pinned in
tiler.encode_tiles) guarantees the incremental result is BYTE-IDENTICAL to
a full retile of the new snapshot — asserted in pytest, and the dirty-set
itself is SQL-checkable (driver oracle `tile_diff`).

Scale notes: the join shuffles on the document key (hash-balanced); the
dirty set is tiny relative to the corpus (broadcast semi/anti joins); the
encode inherits tiler's single (zoom,x,y) Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import tile_x_col, tile_y_col


def changed_tiles(
    base: DataFrame,
    new: DataFrame,
    zoom: int,
    key: str = "doc_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """-> ``(tile_x, tile_y, n_inserted, n_deleted, n_moved_in,
    n_moved_out)`` for every tile touched by the snapshot diff (zoom is the
    caller's constant).  A moved document dirties both its old and new
    tile; a document whose position is unchanged dirties nothing (payload
    changes don't move geometry — callers who re-style payloads into tiles
    should union those keys in explicitly).  "Moved" means the POSITION
    changed, not just the tile: an in-tile move still rewrites the tile's
    quantized bytes, so it dirties its (possibly single) tile through both
    the moved-in and moved-out counts."""
    b = base.select(
        F.col(key).alias("_k"),
        F.col(lon).alias("_blon"),
        F.col(lat).alias("_blat"),
        tile_x_col(F.col(lon), zoom).alias("_bx"),
        tile_y_col(F.col(lat), zoom).alias("_by"),
    )
    n = new.select(
        F.col(key).alias("_k"),
        F.col(lon).alias("_nlon"),
        F.col(lat).alias("_nlat"),
        tile_x_col(F.col(lon), zoom).alias("_nx"),
        tile_y_col(F.col(lat), zoom).alias("_ny"),
    )
    j = b.join(n, "_k", "full_outer")
    ins = F.col("_bx").isNull()
    dele = F.col("_nx").isNull()
    moved = (
        ~ins
        & ~dele
        & ((F.col("_blon") != F.col("_nlon")) | (F.col("_blat") != F.col("_nlat")))
    )
    # emit each row's 0-2 dirty-tile events as ONE array + explode: four
    # union branches each re-referencing j would re-execute the full-outer
    # join shuffle four times (Catalyst does not CSE across union branches)
    ev_struct = lambda x, y, e: F.struct(  # noqa: E731
        x.alias("tile_x"), y.alias("tile_y"), F.lit(e).alias("_e")
    )
    nxy = (F.col("_nx"), F.col("_ny"))
    bxy = (F.col("_bx"), F.col("_by"))
    events_arr = (
        F.when(ins, F.array(ev_struct(*nxy, "ins")))
        .when(dele, F.array(ev_struct(*bxy, "del")))
        .when(moved, F.array(ev_struct(*nxy, "min"), ev_struct(*bxy, "mout")))
        .otherwise(F.array().cast("array<struct<tile_x:long,tile_y:long,_e:string>>"))
    )
    events = j.select(F.explode(events_arr).alias("_ev")).select(
        F.col("_ev.tile_x").alias("tile_x"),
        F.col("_ev.tile_y").alias("tile_y"),
        F.col("_ev._e").alias("_e"),
    )
    return events.groupBy("tile_x", "tile_y").agg(
        F.sum(F.when(F.col("_e") == "ins", 1).otherwise(0)).alias("n_inserted"),
        F.sum(F.when(F.col("_e") == "del", 1).otherwise(0)).alias("n_deleted"),
        F.sum(F.when(F.col("_e") == "min", 1).otherwise(0)).alias("n_moved_in"),
        F.sum(F.when(F.col("_e") == "mout", 1).otherwise(0)).alias("n_moved_out"),
    )


def retile_incremental(
    old_tiles: DataFrame,
    new_points: DataFrame,
    dirty: DataFrame,
    zoom: int,
    layer: str,
    extent: int = 4096,
    key: str = "doc_id",
    lon: str = "lon",
    lat: str = "lat",
    specs: dict | None = None,
) -> DataFrame:
    """-> TILE_SCHEMA rows: ``old_tiles`` with every dirty tile replaced by
    a fresh encode of the new snapshot's points (tiles whose documents all
    vanished drop out; brand-new tiles appear).

    ``dirty`` is a (tile_x, tile_y) table (``changed_tiles`` output or any
    superset).  Byte parity with a full retile is pinned in pytest — the
    encoder's output depends only on the tile's own sorted features.
    ``old_tiles`` rows at OTHER zoom levels (a pyramid tileset) pass
    through untouched; the diff applies to the ``zoom`` slice only."""
    from .tiler import encode_tiles, points_to_features

    d = dirty.select("tile_x", "tile_y").distinct()
    feats = points_to_features(
        new_points, zoom, layer, extent=extent, lon=lon, lat=lat, id_col=key
    )
    dirty_feats = feats.join(F.broadcast(d), ["tile_x", "tile_y"], "semi")
    fresh = encode_tiles(dirty_feats, specs=specs)
    other_zooms = old_tiles.where(F.col("zoom") != zoom)
    kept = (
        old_tiles.where(F.col("zoom") == zoom)
        .join(F.broadcast(d), ["tile_x", "tile_y"], "anti")
        .unionByName(other_zooms)
    )
    return kept.unionByName(fresh)

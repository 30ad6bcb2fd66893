"""The flagship end-to-end pipeline (SURVEY §3.4, north_rule):

pages -> geoparse (P15, text byte-identity preserved)
      -> cell encode (F19, column-expr or Arrow)
      -> two-phase spatial join to polygon layers (J1+J2, broadcast covering)
      -> kNN to POI anchors (J3/O4)
      -> extent quantize (P13) per zoom
      -> shuffle on (zoom, tile_x, tile_y) -> OVT encode (S7)
      -> tiles table + lineage/metrics (A7), resumable (J5).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import geoparse
from .knn import knn_broadcast
from .spatial_join import spatial_join
from .tiler import encode_tiles, points_to_features, polygons_to_features
from .resume import TileStore


def run_pipeline(
    pages: DataFrame,
    polygons_pdf: pd.DataFrame,
    pois_pdf: Optional[pd.DataFrame],
    zoom: int,
    extent: int = 4096,
    k: int = 3,
    store: Optional[TileStore] = None,
) -> DataFrame:
    """-> tiles DataFrame (TILE_SCHEMA). When ``store`` is given, commits a
    snapshot and skips already-materialized tiles (resume).

    Corpus semantics: the spatial join is INNER — a geoparsed page whose
    coordinates fall in no polygon is excluded from the page layer (the
    join defines the corpus of interest, e.g. pages inside admin areas).
    Callers that need coverage accounting for the dropped remainder should
    run the geolocate-with-fallback query shape instead (driver query
    ``geo_fallback``), which reports unlocated pages with a null tile.

    Multi-layer polygons: when ``polygons_pdf`` has a ``layer`` column the
    polygon features are encoded under their own OVT layer names; without
    one they all land in a single ``admin`` layer.
    """
    points = geoparse(pages)
    joined = spatial_join(points, polygons_pdf, zoom=zoom)
    # a stable numeric feature id gives encode_tiles a within-tile sort key
    # — without one, tile BYTES depend on shuffle arrival order and a
    # resumed run would mix old and fresh encodings of identical inputs
    # that differ byte-wise.  Hash (url, poly_id), NOT url alone: a page
    # inside two overlapping polygons yields two feature rows, and equal
    # sort ids would leave their relative order to shuffle arrival.
    joined = joined.withColumn(
        "_fid", F.xxhash64(F.col("url"), F.col("poly_id"))
    )
    props_cols = ["url", "lang", "poly_id"]
    if pois_pdf is not None:
        # kNN only over pages that reach the output (join survivors, one
        # row per url even when a page sits in several polygons), and
        # attach BEFORE featurization so props_json is serialized exactly
        # once — no post-hoc JSON reparse/rewrite of every feature row.
        survivors = joined.select("url", "lon", "lat").dropDuplicates(["url"])
        nn = knn_broadcast(survivors, pois_pdf, k=k)
        best = nn.filter(F.col("rank") == 1).select(
            "url", F.col("poi_id").alias("nearest_poi")
        )
        joined = joined.join(best, on="url", how="left")
        props_cols.append("nearest_poi")
    features = points_to_features(
        joined,
        zoom=zoom,
        layer="pages",
        extent=extent,
        id_col="_fid",
        props_cols=props_cols,
    )
    # polygon layers ride in the same tiles (multi-layer OVT), one OVT
    # layer per value of the polygon table's ``layer`` column
    spark = pages.sparkSession
    if "layer" in polygons_pdf.columns:
        groups = [
            (str(name), grp.reset_index(drop=True))
            for name, grp in polygons_pdf.groupby("layer", sort=True)
        ]
    else:
        groups = [("admin", polygons_pdf)]
    for name, grp in groups:
        poly_features = polygons_to_features(
            spark, grp, zoom=zoom, layer=name, extent=extent
        )
        features = features.unionByName(poly_features, allowMissingColumns=True)
    if store is not None:
        features = store.pending(features.select("*"))
    tiles = encode_tiles(features)
    if store is not None:
        store.commit(tiles)
    return tiles

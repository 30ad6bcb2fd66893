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
    snapshot and skips already-materialized tiles (resume)."""
    points = geoparse(pages)
    joined = spatial_join(points, polygons_pdf, zoom=zoom)
    # a stable numeric feature id (url hash) gives encode_tiles a
    # within-tile sort key — without one, tile BYTES depend on shuffle
    # arrival order and a resumed run would mix old and fresh encodings of
    # identical inputs that differ byte-wise
    joined = joined.withColumn("_fid", F.xxhash64(F.col("url")))
    features = points_to_features(
        joined,
        zoom=zoom,
        layer="pages",
        extent=extent,
        id_col="_fid",
        props_cols=["url", "lang", "poly_id"],
    )
    if pois_pdf is not None:
        nn = knn_broadcast(points, pois_pdf, k=k)
        best = nn.filter(F.col("rank") == 1).select(
            "url", F.col("poi_id").alias("nearest_poi")
        )
        features = _attach_nearest(features, best)
    # polygon layers ride in the same tiles (multi-layer OVT)
    poly_features = polygons_to_features(
        pages.sparkSession, polygons_pdf, zoom=zoom, layer="admin", extent=extent
    )
    features = features.unionByName(poly_features, allowMissingColumns=True)
    if store is not None:
        features = store.pending(features.select("*"))
    tiles = encode_tiles(features)
    if store is not None:
        store.commit(tiles)
    return tiles


def _attach_nearest(features: DataFrame, best: DataFrame) -> DataFrame:
    """Join nearest-POI id back into the feature props (broadcast-safe: the
    join key rides in props_json; re-serialize with the extra field)."""
    with_url = features.withColumn(
        "_url", F.get_json_object("props_json", "$.url")
    )
    joined = with_url.join(best.withColumnRenamed("url", "_url"), on="_url", how="left")
    props = F.to_json(
        F.struct(
            F.get_json_object("props_json", "$.url").alias("url"),
            F.get_json_object("props_json", "$.lang").alias("lang"),
            F.get_json_object("props_json", "$.poly_id").cast("long").alias("poly_id"),
            F.col("nearest_poi"),
        )
    )
    return joined.withColumn("props_json", props).drop("_url", "nearest_poi")

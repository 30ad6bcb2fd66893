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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import geoparse
from .knn import nearest_poi_col
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

    ``k`` is accepted for backward compatibility but only the NEAREST
    anchor is ever attached to the page features (it always was: the old
    formulation computed k neighbors and kept rank 1).  Callers that need
    the full top-k result set should run :func:`knn_broadcast` /
    :func:`knn_cell_ring` directly.

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
        # nearest-POI enrichment as a map-only pandas-UDF column, attached
        # BEFORE featurization so props_json is serialized exactly once.
        # The previous knn_broadcast(survivors) + join-back formulation was
        # a DAG diamond — `joined` fed BOTH the kNN input and the join left
        # side, so geoparse + spatial_join executed TWICE per action
        # (measured 21 of 31 s at 8M rows / 8 cores in the bench twin of
        # this chain).  Same rank-1 pick incl. (dist, poi_id) tie-break.
        joined = joined.withColumn(
            "nearest_poi", nearest_poi_col(pois_pdf)(F.col("lon"), F.col("lat"))
        )
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


def host_stats(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host corpus profile — the curation table every web-scale
    pipeline keeps next to its corpus (CCNet/RefinedWeb publish exactly
    these): spam farms show up as high dup_ratio, content farms as huge
    n_docs with low distinct ratios, and the host's dominant language
    routes it to the right downstream pipeline.

    Per host: ``n_docs``, ``n_unique_texts`` (distinct whitespace-
    normalized texts — the exact_dedup key), ``dup_ratio`` (1 -
    unique/docs), ``total_tokens`` / ``total_chars``, and ``top_lang``
    (mode of ``lang_col``; ties break on the lang string so the table is
    reproducible).

    Scale shape: two partial-aggregated shuffles — (host, lang) counts
    reduce map-side before the mode window runs on the tiny reduced
    table, and the main rollup is one groupBy(host) whose inputs
    (normalized-text hash for distinctness, token/char counts) are all
    computed map-side.  At 10^8 hosts everything stays distributed; no
    driver state."""
    from ..functions.text import WS_SPLIT, token_count
    from .dedup import normalized_text

    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    base = docs.select(
        F.col(host_col).alias("host"),
        # '' for NULL langs: asc-null placement differs between engines,
        # and the mode should group unknown langs together anyway
        F.coalesce(F.col(lang_col), F.lit("")).alias("lang"),
        # hash the normalized text map-side: the distinct key shuffled is
        # 8 bytes/doc, not the document body (the exact_dedup pattern);
        # count-level collision odds ~n_docs^2/2^64 per host — negligible
        F.xxhash64(normalized_text(t)).alias("_norm"),
        token_count(t).alias("_tok"),
        F.length(t).alias("_chars"),
    )
    roll = base.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("_norm").alias("n_unique_texts"),
        F.sum("_tok").cast("long").alias("total_tokens"),
        F.sum("_chars").cast("long").alias("total_chars"),
    )
    lc = base.groupBy("host", "lang").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("host").orderBy(F.desc("_n"), F.asc("lang"))
    top = (
        lc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("host", F.col("lang").alias("top_lang"))
    )
    return roll.join(top, on="host").select(
        "host",
        "n_docs",
        "n_unique_texts",
        (
            F.lit(1.0)
            - F.col("n_unique_texts").cast("double") / F.col("n_docs")
        ).alias("dup_ratio"),
        "total_tokens",
        "total_chars",
        "top_lang",
    )


def host_top_terms(
    docs: DataFrame,
    *,
    k: int = 5,
    host_col: str = "host",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Per-host heavy hitters -> (host, term, cnt, rank): the top ``k``
    terms of each host's pooled text, ties broken lexicographically on
    the term — the per-source vocabulary fingerprint a curation pipeline
    uses to spot template farms and topic skew (next to host_stats'
    volume/dup profile).

    One partial-agg count shuffle on (host, term), then the rank window
    runs on the ALREADY-REDUCED vocabulary table — WindowGroupLimit
    prunes to k per host map-side, so a mega-host is a bigger hash-agg
    key range, never a window-sort hazard.
    """
    from open_vector_tile_spark.functions.text import ws_tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    counts = (
        docs.select(F.col(host_col).alias("host"), ws_tokens(text_col).alias("ts"))
        .select("host", F.explode("ts").alias("term"))
        .groupBy("host", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    w = Window.partitionBy("host").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )

"""Gazetteer toponym geocoding — text mentions -> (place, lat, lon).

The north-star pipeline "geolocates Common-Crawl-style web pages": pages
with explicit coordinates are handled by the geoparse filter
(functions/text.py, reference P15), but most real pages carry only place
NAMES.  The standard resolution is gazetteer lookup: tokenize the text,
match tokens against a (term -> candidate place) alias table, score each
candidate by mention count x a place prior (population), and keep the
top-k candidates per page.  Reference parity: the reference library has
no text geocoder (it is a tile codec); this operator is the Spark-native
ingest stage that FEEDS its tile pipeline, mirroring how its S2JSON
guides expect `(lon, lat)` per feature (/root/reference/src/, S2JSON
feature model).

Scale shape (100 TB corpus, ~10M-row gazetteer):
- tokenisation is a map-side `split`+`explode` — no shuffle, whole-stage
  codegen, no Python;
- the gazetteer join is `broadcast()` by default (real gazetteers like
  GeoNames are ~10M rows / ~1 GB — at or under the practical broadcast
  ceiling; pass ``broadcast_gazetteer=False`` to fall back to a shuffle
  join on `term`, and salt hot stopword-like terms upstream if skewed);
- per-(doc, place) scores partial-aggregate map-side before the one real
  shuffle on the document key; the top-k window re-uses the same key so
  AQE coalesces rather than re-plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["geocode_toponyms"]


def geocode_toponyms(
    docs: DataFrame,
    gazetteer: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1,
    broadcast_gazetteer: bool = True,
) -> DataFrame:
    """Resolve each document to its top-``k`` gazetteer places.

    ``gazetteer`` must have columns ``term`` (lowercase alias string),
    ``place_id`` (long, unique per place — ties break on it), ``population``
    (long place prior), ``lat``, ``lon``.  One place may own many alias
    terms and one term may be claimed by many places (ambiguity); the
    score ``mention_count * population`` picks the winner, deterministic
    under any partitioning because both factors are integers.

    Returns ``(id_col, place_id, score, lat, lon, rank)`` with
    ``rank`` in 1..k, ordered within a document by descending score then
    ascending place_id.  Documents with no gazetteer hit are absent
    (callers wanting them keep a left anti-join on the result).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from open_vector_tile_spark.functions.text import WS_SPLIT

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), WS_SPLIT)).alias("term"),
    ).where(F.col("term") != "")
    gaz = F.broadcast(gazetteer) if broadcast_gazetteer else gazetteer
    hits = toks.join(gaz, "term")
    # mention count sums across ALL alias terms of a place; population/lat/
    # lon are functionally dependent on place_id, so first() is deterministic
    scored = (
        hits.groupBy(id_col, "place_id")
        .agg(
            (F.count("*") * F.first("population")).cast("long").alias("score"),
            F.first("lat").alias("lat"),
            F.first("lon").alias("lon"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("place_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "place_id", "score", "lat", "lon", "rank")
    )

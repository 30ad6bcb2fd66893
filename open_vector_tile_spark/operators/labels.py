"""Per-tile label placement culling — the selection stage of tile rendering.

A z4 tile over a dense corpus carries thousands of candidate label points;
renderers of the reference's tiles (vector-tile clients) can only place a
handful without collisions.  The standard scale shape is grid-bucket
culling: quantize each candidate's in-tile position into spacing-sized
buckets, keep the best-scored candidate per bucket (labels closer than
``spacing`` always share a bucket or a neighbor — the cheap, shuffle-light
approximation every production tiler uses), then cap the survivors per
tile.  Reference parity: the reference codec stores the resulting point
layers; it has no selection stage (it is a codec) — this operator is the
Spark-native producer in front of it.

Scale shape (100 TB / ~10^11 candidates):
- stage 1 is a ``groupBy(tile, bucket).agg(max_by(...))`` — PARTIAL
  aggregation combines map-side, so only one winner row per bucket ever
  shuffles (not the full candidate set);
- stage 2 ranks the per-bucket winners inside each tile — input is already
  bounded by (extent/spacing)^2 rows per tile, so the window is tiny;
- ties break on the unique numeric id, deterministic under any
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cull_labels"]


def cull_labels(
    candidates: DataFrame,
    *,
    spacing: int,
    per_tile_cap: int,
    score_col: str = "score",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    tile_cols: tuple[str, str] = ("tile_x", "tile_y"),
) -> DataFrame:
    """Grid-bucket label culling.

    ``candidates`` columns: tile keys, integer in-tile coords ``x``/``y``
    (extent units), a numeric ``score`` (higher wins) and a UNIQUE numeric
    ``id`` (deterministic tie-break: lower id wins equal scores).  Returns
    the surviving rows (all input columns) plus ``rank`` (1..cap within the
    tile by descending score, then ascending id).
    """
    if spacing < 1:
        raise ValueError(f"spacing must be >= 1, got {spacing}")
    if per_tile_cap < 1:
        raise ValueError(f"per_tile_cap must be >= 1, got {per_tile_cap}")
    tx, ty = tile_cols
    reserved = {"_bx", "_by", "rank"} & set(candidates.columns)
    if reserved:
        raise ValueError(
            f"candidates must not carry reserved columns {sorted(reserved)}: "
            "'_bx'/'_by' are internal bucket indices and 'rank' is the output "
            "rank — rename them before calling cull_labels"
        )
    payload = [c for c in candidates.columns]
    bucketed = candidates.withColumn(
        "_bx", F.floor(F.col(x_col) / spacing).cast("long")
    ).withColumn("_by", F.floor(F.col(y_col) / spacing).cast("long"))
    # max of (score, -id) == highest score, then lowest id — unique ids make
    # the max_by deterministic, so the partial agg is safe to combine in any
    # order on any partitioning
    winner = F.max_by(
        F.struct(*payload),
        F.struct(F.col(score_col), (-F.col(id_col)).alias("_neg_id")),
    ).alias("_win")
    winners = (
        bucketed.groupBy(tx, ty, "_bx", "_by")
        .agg(winner)
        .select("_win.*")
    )
    w = Window.partitionBy(tx, ty).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        winners.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_tile_cap)
    )

"""Map matching: snap points to their nearest line segment.

The tile stack's classic *point→line* join — GPS pings to road segments,
geotagged pages to street centerlines, label anchors to contours.  The
reference's data model stores line layers as vertex chains
(open-vector-tile VectorLines; see reference `src/vectorTile.spec.ts`
line-geometry cases); this operator answers the inverse lookup the
engine needs when ingest attaches loose points to those lines.

Semantics: for each point, the ``k`` nearest segments within ``radius``
(planar Euclidean point-to-segment distance, endpoints clamped), ties
broken on segment id — fully deterministic under any partitioning.
Coordinates are generic planar doubles: feed it extent-quantized tile
space, a local projection, or small-extent lon/lat.

Scale shape (the two-phase cell-prefilter pattern of
operators/spatial_join.py, applied to segments):
- each segment explodes to the grid cells covering its radius-expanded
  bbox (sequence + explode, map-side; cover size is guarded — a
  degenerate over-long segment fails loudly via raise_error instead of
  silently exploding the join);
- each point lands in exactly ONE cell, so the (gx, gy) equi-join emits
  every candidate pair at most once — no post-join dedup shuffle;
- exact distance + clamp arithmetic is whole-stage-codegen column math
  (no Python), and the final per-point rank is one window on the point
  key, pruned map-side by WindowGroupLimit.

At 100 TB: points shuffle once on the cell key, segments (the small,
static side — a road network is dim-table-sized next to a ping corpus)
broadcast when they fit; candidate density is bounded by cell_size ≈
radius so the refine stage is O(candidates), never O(P×S).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snap_to_segments"]


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    *,
    radius: float,
    cell_size: float | None = None,
    k: int = 1,
    max_cells_per_segment: int = 4096,
    broadcast_segments: bool = True,
) -> DataFrame:
    """(pid, seg_id, t, dist): the ``k`` nearest segments within
    ``radius`` of each point; unmatched points emit no rows.

    ``points``   = (pid, x, y); ``segments`` = (seg_id, x1, y1, x2, y2).
    ``t`` in [0,1] is the normalized position of the closest point along
    the segment (0 at (x1,y1)); zero-length segments behave as points
    (t = 0).  ``dist`` is exact planar distance — computed as one fixed
    double-op chain so an engine replaying the same formula (the DuckDB
    oracle twin) reproduces it bit-for-bit.
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cs = float(cell_size) if cell_size is not None else float(radius)
    if cs <= 0:
        raise ValueError(f"cell_size must be > 0, got {cs}")

    r = F.lit(float(radius))
    # radius-expanded bbox cover; the cover is a superset of the true
    # radius corridor (a point within `radius` of the segment lies inside
    # the expanded bbox, and its cell therefore overlaps it)
    gx_lo = F.floor((F.least("x1", "x2") - r) / cs).cast("long")
    gx_hi = F.floor((F.greatest("x1", "x2") + r) / cs).cast("long")
    gy_lo = F.floor((F.least("y1", "y2") - r) / cs).cast("long")
    gy_hi = F.floor((F.greatest("y1", "y2") + r) / cs).cast("long")
    n_cells = (gx_hi - gx_lo + 1) * (gy_hi - gy_lo + 1)
    # the guard is woven into the sequence bound (not a separate column a
    # projection prune could silently drop): an over-long segment fails
    # the job loudly instead of exploding the join
    gx_hi_guarded = F.when(
        n_cells > F.lit(int(max_cells_per_segment)),
        F.raise_error(
            F.concat(
                F.lit("snap_to_segments: segment cover exceeds "),
                F.lit(str(int(max_cells_per_segment))),
                F.lit(" cells (seg_id="),
                F.col("seg_id").cast("string"),
                F.lit("); raise cell_size or split the segment"),
            )
        ).cast("long"),
    ).otherwise(gx_hi)
    seg_cells = (
        segments.withColumn("gx", F.explode(F.sequence(gx_lo, gx_hi_guarded)))
        .withColumn("gy", F.explode(F.sequence(gy_lo, gy_hi)))
    )
    if broadcast_segments:
        seg_cells = F.broadcast(seg_cells)

    pts = points.withColumn(
        "gx", F.floor(F.col("x") / cs).cast("long")
    ).withColumn("gy", F.floor(F.col("y") / cs).cast("long"))

    cand = pts.join(seg_cells, ["gx", "gy"])

    # exact point→segment distance, one fixed IEEE op chain
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    len2 = dx * dx + dy * dy
    dot = (F.col("x") - F.col("x1")) * dx + (F.col("y") - F.col("y1")) * dy
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.greatest(dot / len2, F.lit(0.0)), F.lit(1.0))
    )
    cand = cand.withColumn("t", t)
    ex = F.col("x") - (F.col("x1") + F.col("t") * dx)
    ey = F.col("y") - (F.col("y1") + F.col("t") * dy)
    cand = cand.withColumn("dist2", ex * ex + ey * ey).where(
        F.col("dist2") <= F.lit(float(radius) * float(radius))
    )

    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy(F.asc("dist2"), F.asc("seg_id"))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.lit(int(k)))
        .select("pid", "seg_id", "t", F.sqrt("dist2").alias("dist"))
    )

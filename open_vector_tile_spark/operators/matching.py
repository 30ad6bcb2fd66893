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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snap_to_segments", "hausdorff_join"]


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


# ---------------------------------------------------------------------------
# trajectory similarity: Hausdorff distance join
# ---------------------------------------------------------------------------


def hausdorff_join(
    points: DataFrame,
    *,
    max_dist: float,
    id_col: str = "track_id",
    x_col: str = "x",
    y_col: str = "y",
    cell_size: float | None = None,
    max_cover: int = 4096,
) -> DataFrame:
    """All-pairs trajectory-similarity self-join under the symmetric
    Hausdorff distance: pairs of tracks with
    ``H(A,B) = max(h(A,B), h(B,A)) <= max_dist``, where the directed
    ``h(A,B) = max_{a in A} min_{b in B} |a-b|`` (planar Euclidean).
    Output: ``(id_a, id_b, h_ab, h_ba, hausdorff)`` with ``id_a < id_b``.

    The GPS/trajectory twin of the text near-dup family: commuter routes,
    repeated crawls of a moving host, duplicate user tracks.

    Scale shape (three prefilters, each exact — no false negatives):
    1. per-track bbox in ONE partial-agg shuffle;
    2. candidate generation WITHOUT the all-pairs cross join: every
       track's ``max_dist``-expanded bbox explodes to its covering cells
       (size >= max_dist, cover guarded by raise_error) and pairs meet
       through the cell equi-join; a pair sharing k cells is emitted k
       times, deduped by the distinct on the (tiny) candidate id table;
    3. mutual bbox containment: ``h(A,B) <= t`` forces
       ``bbox(A) subset-of bbox(B) expanded by t`` — both directions must
       hold, a far stronger prune than mere bbox overlap.
    The exact stage joins each side's points through the candidate table
    (bounded by track length, never |P|^2), fans each joined row into its
    two directed roles with ONE explode (no double-scan union), and
    reduces with min-per-point then max-per-direction partial aggs.
    min/max never accumulate floats, so with integer-valued coordinates
    every distance is exact and the whole operator is bit-stable on any
    partitioning — the oracle replays it verbatim.
    """
    if max_dist <= 0:
        raise ValueError(f"max_dist must be > 0, got {max_dist}")
    cs = float(cell_size) if cell_size is not None else 4.0 * float(max_dist)
    if cs < max_dist:
        raise ValueError(f"cell_size must be >= max_dist, got {cs} < {max_dist}")
    t = float(max_dist)
    t2 = t * t

    pts = points.select(
        F.col(id_col).alias("tid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    bbox = pts.groupBy("tid").agg(
        F.min("px").alias("x0"),
        F.min("py").alias("y0"),
        F.max("px").alias("x1"),
        F.max("py").alias("y1"),
    )

    # covering cells of the t-expanded bbox, cover-guarded
    cx0 = F.floor((F.col("x0") - F.lit(t)) / F.lit(cs)).cast("long")
    cx1 = F.floor((F.col("x1") + F.lit(t)) / F.lit(cs)).cast("long")
    cy0 = F.floor((F.col("y0") - F.lit(t)) / F.lit(cs)).cast("long")
    cy1 = F.floor((F.col("y1") + F.lit(t)) / F.lit(cs)).cast("long")
    n_cells = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    guard = F.when(
        n_cells > F.lit(int(max_cover)),
        F.raise_error(
            F.concat(
                F.lit("hausdorff_join: bbox covers > max_cover cells for track "),
                F.col("tid").cast("string"),
            )
        ).cast("long"),
    ).otherwise(cx1)
    cells = bbox.select(
        "tid",
        "x0",
        "y0",
        "x1",
        "y1",
        F.explode(F.sequence(cx0, guard)).alias("cgx"),
        F.sequence(cy0, cy1).alias("_cys"),
    ).select("tid", "x0", "y0", "x1", "y1", "cgx", F.explode("_cys").alias("cgy"))

    a = cells.select(
        F.col("tid").alias("id_a"),
        F.col("x0").alias("ax0"),
        F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        "cgx",
        "cgy",
    )
    b = cells.select(
        F.col("tid").alias("id_b"),
        F.col("x0").alias("bx0"),
        F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        "cgx",
        "cgy",
    )
    cand = (
        # merge hint: same ReusedExchange rationale as dedup's LSH self-join
        # (broadcast build would re-run the bbox agg + cell explode twice)
        a.hint("merge")
        .join(b, ["cgx", "cgy"])
        .filter(F.col("id_a") < F.col("id_b"))
        # mutual t-expanded containment (exact necessary condition)
        .filter(
            (F.col("ax0") >= F.col("bx0") - F.lit(t))
            & (F.col("ax1") <= F.col("bx1") + F.lit(t))
            & (F.col("ay0") >= F.col("by0") - F.lit(t))
            & (F.col("ay1") <= F.col("by1") + F.lit(t))
            & (F.col("bx0") >= F.col("ax0") - F.lit(t))
            & (F.col("bx1") <= F.col("ax1") + F.lit(t))
            & (F.col("by0") >= F.col("ay0") - F.lit(t))
            & (F.col("by1") <= F.col("ay1") + F.lit(t))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    # Exact stage (r6 rewrite, guide 4.2): the old formulation joined each
    # candidate pair's point sets row-by-row — |A| x |B| rows PER PAIR
    # materialized through an explode and three aggregation shuffles
    # (measured 32 s of the sf0.1 full-surface sweep at 1.7k-point
    # tracks).  Both directed distances are min/max reductions over the
    # SAME |A| x |B| squared-distance matrix, so one chunked numpy pass
    # per pair (~4 MB temporaries, the knn mmap-threshold discipline)
    # computes h(A,B) and h(B,A) together, moving only |A|+|B| points per
    # candidate instead of |A| x |B| rows.  Every d2 is (ax-bx)^2 +
    # (ay-by)^2 in IEEE double, the same single expression the old column
    # form evaluated, and min/max accumulate nothing — results are
    # bit-identical on any partitioning (integer-valued inputs stay
    # exact), which the brute-force-oracle parity pins.
    tracks = pts.groupBy("tid").agg(
        F.collect_list("px").alias("_xs"), F.collect_list("py").alias("_ys")
    )
    ta = tracks.select(
        F.col("tid").alias("id_a"), F.col("_xs").alias("_ax"), F.col("_ys").alias("_ay")
    )
    tb = tracks.select(
        F.col("tid").alias("id_b"), F.col("_xs").alias("_bx"), F.col("_ys").alias("_by")
    )
    withpts = cand.join(ta, "id_a").join(tb, "id_b")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<h2ab: double, h2ba: double>")
    def pair_h2(ax_s: pd.Series, ay_s: pd.Series, bx_s: pd.Series, by_s: pd.Series) -> pd.DataFrame:
        out_ab = np.empty(len(ax_s))
        out_ba = np.empty(len(ax_s))
        for i in range(len(ax_s)):
            ax = np.asarray(ax_s[i], dtype=np.float64)
            ay = np.asarray(ay_s[i], dtype=np.float64)
            bx = np.asarray(bx_s[i], dtype=np.float64)
            by = np.asarray(by_s[i], dtype=np.float64)
            # chunk A rows so each d2 block stays ~4 MB (malloc reuse, no
            # kernel mmap churn); col-mins fold across chunks for h(B,A)
            step = max(1, (4 * 1024 * 1024 // 8) // max(1, len(bx)))
            row_best = np.empty(len(ax))
            col_best = np.full(len(bx), np.inf)
            for s in range(0, len(ax), step):
                dx = ax[s : s + step, None] - bx[None, :]
                dy = ay[s : s + step, None] - by[None, :]
                d2 = dx * dx + dy * dy
                row_best[s : s + step] = d2.min(axis=1)
                np.minimum(col_best, d2.min(axis=0), out=col_best)
            out_ab[i] = row_best.max()
            out_ba[i] = col_best.max()
        return pd.DataFrame({"h2ab": out_ab, "h2ba": out_ba})

    h2 = withpts.select(
        "id_a", "id_b", pair_h2("_ax", "_ay", "_bx", "_by").alias("_h")
    )
    out = (
        h2.filter(F.greatest(F.col("_h.h2ab"), F.col("_h.h2ba")) <= F.lit(t2))
        .select(
            "id_a",
            "id_b",
            F.sqrt(F.col("_h.h2ab")).alias("h_ab"),
            F.sqrt(F.col("_h.h2ba")).alias("h_ba"),
            F.greatest(
                F.sqrt(F.col("_h.h2ab")), F.sqrt(F.col("_h.h2ba"))
            ).alias("hausdorff"),
        )
    )
    return out

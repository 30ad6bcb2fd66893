"""Polygon rasterization — vector -> raster coverage, all in Catalyst.

The north-star pipeline moves both directions between rasters and vector
layers ("raster layers gridded/vectorized per tile"): `vectorize.py`
(marching squares) lifts rasters to polygons; this module burns polygons
back onto a cell grid.  Polygons are taken as triangles (any ring can be
fan/ear-triangulated upstream — the reference itself ships per-polygon
tessellation indices for exactly this purpose, see `indices`/`tessellation`
in the OVT spec and `codec/mvt.py`'s tessellation writers, so triangles
are the natural wire-level unit to rasterize).

Numerics: a cell (gx, gy) is covered iff its CENTER lies inside the
triangle.  With integer vertices and centers at half-integers, every edge
test is the sign of an integer cross product in doubled coordinates —
exact, branch-free, identical on any engine; boundary centers (cross
product exactly 0) count as covered from either winding.

Scale shape: bbox-bounded cell expansion via two `sequence`+`explode`
generators (map-side, whole-stage codegen, no Python, no shuffle) and a
single partial-aggregated groupBy when the caller wants per-triangle
stats.  The explosion factor is the triangle's bbox area in cells — the
same bounded-cover idiom as the spatial join's `polygon_covering_df`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rasterize_triangles"]


def _edge(ax: Column, ay: Column, bx: Column, by: Column, px: Column, py: Column) -> Column:
    """Sign-carrying cross product (b-a) x (p-a); p is in doubled coords,
    a/b in unit coords (doubled inside)."""
    return (bx - ax) * (py - 2 * ay) - (by - ay) * (px - 2 * ax)


def rasterize_triangles(
    tris: DataFrame,
    *,
    id_col: str = "tri_id",
    coords: tuple[str, str, str, str, str, str] = ("x0", "y0", "x1", "y1", "x2", "y2"),
) -> DataFrame:
    """Covered cells per triangle: ``(id_col, gx, gy)``.

    ``coords`` are integer (long-castable) vertex columns on the target
    grid.  Degenerate (collinear) triangles have zero interior; they cover
    only cells whose center lies exactly ON the carrier line (all three
    edge tests zero — e.g. a 45-degree segment through half-integer
    centers), which the boundary-inclusive rule keeps deterministically.
    Point-degenerate triangles (all three vertices equal) have no carrier
    line and cover nothing.
    """
    x0, y0, x1, y1, x2, y2 = [F.col(c).cast("long") for c in coords]
    # a point-degenerate "triangle" (all vertices equal) zeroes every edge
    # test identically, and the empty-range clamp would still nominate one
    # candidate cell — drop such rows: a point contains no cell center
    point_degenerate = (
        (x0 == x1) & (x1 == x2) & (y0 == y1) & (y1 == y2)
    )
    tris = tris.where(~point_degenerate)
    gx_min = F.least(x0, x1, x2)
    gx_max = F.greatest(x0, x1, x2)
    gy_min = F.least(y0, y1, y2)
    gy_max = F.greatest(y0, y1, y2)
    # centers live at +0.5: the first candidate cell starts at the min
    # vertex, the last candidate ends one below the max vertex.  Guard the
    # empty range (sequence() would count DOWN for inverted bounds).
    cells = (
        tris.withColumn(
            "gx", F.explode(F.sequence(gx_min, F.greatest(gx_min, gx_max - 1)))
        )
        .withColumn(
            "gy", F.explode(F.sequence(gy_min, F.greatest(gy_min, gy_max - 1)))
        )
    )
    px = 2 * F.col("gx") + 1
    py = 2 * F.col("gy") + 1
    e01 = _edge(x0, y0, x1, y1, px, py)
    e12 = _edge(x1, y1, x2, y2, px, py)
    e20 = _edge(x2, y2, x0, y0, px, py)
    inside = ((e01 >= 0) & (e12 >= 0) & (e20 >= 0)) | (
        (e01 <= 0) & (e12 <= 0) & (e20 <= 0)
    )
    return cells.where(inside).select(id_col, "gx", "gy")

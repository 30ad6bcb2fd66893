"""Geometry simplification for zoom pyramids.

A z14 coastline re-encoded at z5 carries ~500× more vertices than a pixel
can show; producers simplify per zoom before quantization (the reference
encodes whatever it is given — simplification, like clipping, is the
producer-side stage this engine supplies on top of the codec).

Two complementary ops:

* :func:`simplify_dp_np` — Douglas–Peucker with the textbook
  segment-distance metric, iterative stack, numpy-vectorized distance scan
  per split (no per-vertex Python in the hot loop).  Plugs into the
  distributed featurizers via ``simplify_px`` (tolerance in extent pixels,
  applied after clipping, before quantization).  Correctness is pinned by
  pytest against a scalar reference over randomized polylines — the
  recursive max-decomposition is not SQL-expressible, so this op is
  deliberately NOT a driver oracle query.
* vertex collapse — dropping consecutive vertices that quantize to the
  same pixel — IS SQL-expressible (lag window) and is exposed as the
  driver query `simplify_collapse` with a full DuckDB hash oracle.  The
  quantize-collapse pass runs implicitly in any renderer; making it an
  explicit operator keeps low-zoom tiles O(visible pixels).

Scale shape: both are per-geometry map work inside the featurizers'
mapInPandas pass — no shuffle, no state; simplification only SHRINKS the
bytes that reach the (zoom, x, y) shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dp_keep_mask(xy: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask of Douglas–Peucker over an OPEN polyline's xy
    (n,2).  Segment distance (not infinite-line), matching the classic
    algorithm: interior points project onto the chord clamped to [0,1]."""
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    t2 = tol * tol
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a, b = xy[i], xy[j]
        seg = xy[i + 1 : j]
        d = b - a
        l2 = float(d @ d)
        if l2 == 0.0:
            diff = seg - a
            dist2 = np.einsum("ij,ij->i", diff, diff)
        else:
            t = np.clip(((seg - a) @ d) / l2, 0.0, 1.0)
            proj = a + t[:, None] * d
            diff = seg - proj
            dist2 = np.einsum("ij,ij->i", diff, diff)
        k = int(np.argmax(dist2))
        if dist2[k] > t2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_dp_np(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker simplify an open polyline (n,2+) to tolerance
    ``tol`` (same units as the coordinates).  Endpoints always survive;
    extra columns (z, …) ride along on the keep-mask."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) <= 2:
        return pts.copy()
    return pts[_dp_keep_mask(pts[:, :2], tol)]


def simplify_ring_np(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker for a CLOSED ring (open vertex list, no repeated
    first vertex — the featurizers' convention).  The ring is closed by
    appending vertex 0, simplified as a polyline, and re-opened; a ring
    reduced below 3 vertices returns empty (caller drops it — an outer
    ring collapsing deletes its polygon from that tile)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 3:
        return ring.copy()
    closed = np.concatenate([ring, ring[:1]])
    keep = _dp_keep_mask(closed[:, :2], tol)
    out = closed[:-1][keep[:-1]]
    if len(out) < 3:
        return out[:0]
    return out


def collapse_quantized(
    df: DataFrame,
    id_cols: Sequence[str],
    order_col: str,
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Remove consecutive duplicate quantized vertices from an exploded
    vertex table — the pixel-collapse simplification every renderer runs
    after quantization (two source vertices landing on the same low-zoom
    pixel encode as a useless 0-delta in the command stream).

    ``df`` holds one row per vertex, ordered by ``order_col`` within each
    geometry key ``id_cols``.  A vertex survives iff it is the geometry's
    first or differs from its predecessor in (x, y) — one lag window, one
    shuffle on the geometry key; at 100 TB the window partitions are
    single geometries (bounded, skew-free).  SQL-expressible verbatim,
    driver-oracled as `simplify_collapse`."""
    w = Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(order_col)
    px_prev = F.lag(x_col).over(w)
    py_prev = F.lag(y_col).over(w)
    keep = (
        px_prev.isNull()
        | (F.col(x_col) != px_prev)
        | (F.col(y_col) != py_prev)
    )
    return df.withColumn("_keep", keep).filter("_keep").drop("_keep")

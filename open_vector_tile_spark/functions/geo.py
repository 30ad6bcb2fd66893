"""Geospatial cell indexing + geometry predicates.

Cell scheme: web-mercator ZXY tiles (public slippy-map tiling). A cell id at
resolution ``z`` packs ``(z, x, y)`` into one int64: ``(z << 58) | (x << 29) | y``
(supports z <= 28).  This doubles as the engine's tile key, so the spatial
join's cell prefilter (SURVEY §2.4 J1) and the tiler's shuffle key
(north_rule: shuffle on (zoom, tile_x, tile_y)) are the same partitioning —
one shuffle serves both.

Two implementations of each transform:
- Column-expression (JVM-side, whole-stage-codegen) for the hot path:
  :func:`tile_x_col` / :func:`tile_y_col` / :func:`cell_col` build pure
  pyspark.sql Column trees (no Python UDF).
- numpy (:func:`tile_xy_np`) for use inside Arrow UDFs (PIP refinement, kNN
  kernels) and for the pytest oracles.

The exact point-in-polygon test re-expresses the reference's ring-orientation
semantics (signed area / classifyRings, reference src/mapbox/vectorFeature.ts:
357-395): a point is inside a polygon when it is inside the outer ring and
outside every hole; ray-casting is winding-agnostic.
"""

from __future__ import annotations

import math

import numpy as np

try:  # Spark optional: numpy paths usable without it (pytest oracles)
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    _HAS_SPARK = True
except ImportError:  # pragma: no cover
    _HAS_SPARK = False

MAX_LAT = 85.05112877980659  # web-mercator clamp
_Z_SHIFT = 58
_X_SHIFT = 29

# ---------------------------------------------------------------------------
# numpy cell kernels
# ---------------------------------------------------------------------------


def merc_x_np(lon) -> np.ndarray:
    """lon -> [0,1) web-mercator x."""
    return (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0


def merc_y_np(lat) -> np.ndarray:
    """lat -> [0,1) web-mercator y (clamped)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    s = np.sin(np.radians(lat))
    return 0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)


def tile_xy_np(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << zoom
    tx = np.clip(np.floor(merc_x_np(lon) * n), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(merc_y_np(lat) * n), 0, n - 1).astype(np.int64)
    return tx, ty


def cell_id_np(lon, lat, zoom: int) -> np.ndarray:
    tx, ty = tile_xy_np(lon, lat, zoom)
    return pack_cell_np(zoom, tx, ty)


def pack_cell_np(zoom, tx, ty) -> np.ndarray:
    return (
        (np.int64(zoom) << np.int64(_Z_SHIFT))
        | (np.asarray(tx, dtype=np.int64) << np.int64(_X_SHIFT))
        | np.asarray(ty, dtype=np.int64)
    )


def unpack_cell_np(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    mask = np.int64((1 << _X_SHIFT) - 1)
    return c >> np.int64(_Z_SHIFT), (c >> np.int64(_X_SHIFT)) & mask, c & mask


def cell_ring_np(zoom: int, tx: int, ty: int, r: int) -> np.ndarray:
    """Cells of the square ring at Chebyshev distance exactly r (r=0 -> the
    cell itself). X wraps around the antimeridian; Y is clamped."""
    n = 1 << zoom
    if r == 0:
        return pack_cell_np(zoom, np.array([tx]), np.array([ty]))
    xs, ys = [], []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            if max(abs(dx), abs(dy)) != r:
                continue
            y = ty + dy
            if 0 <= y < n:
                xs.append((tx + dx) % n)
                ys.append(y)
    if not xs:
        return np.empty(0, dtype=np.int64)
    return pack_cell_np(zoom, np.array(xs), np.array(ys))


def cover_polygon_np(rings: list, zoom: int):
    """Tiles intersecting a polygon (outer ring), by per-tile-row slab spans:
    for each tile row, x-extent of the outer ring clipped to the row's slab.
    A strict subset of the bbox covering for non-rectangular shapes
    (conservative superset of the exact cover — the PIP refinement stays
    exact); holes never extend coverage, so only ring 0 matters."""
    outer = np.asarray(rings[0], dtype=np.float64)
    n = 1 << zoom
    px = merc_x_np(outer[:, 0]) * n
    py = merc_y_np(outer[:, 1]) * n
    if len(px) >= 2 and px[0] == px[-1] and py[0] == py[-1]:
        px, py = px[:-1], py[:-1]
    x1, y1 = px, py
    x2, y2 = np.roll(px, -1), np.roll(py, -1)
    row_lo = int(np.clip(np.floor(py.min()), 0, n - 1))
    row_hi = int(np.clip(np.floor(py.max()), 0, n - 1))
    txs_out, tys_out = [], []
    for row in range(row_lo, row_hi + 1):
        lo, hi = float(row), float(row + 1)
        # edges overlapping the slab [lo, hi)
        emin, emax = np.minimum(y1, y2), np.maximum(y1, y2)
        sel = (emax >= lo) & (emin <= hi)
        if not sel.any():
            continue
        ax, ay, bx, by = x1[sel], y1[sel], x2[sel], y2[sel]
        # clip each edge segment to the slab, track x extremes
        with np.errstate(divide="ignore", invalid="ignore"):
            t_lo = np.clip((lo - ay) / (by - ay), 0.0, 1.0)
            t_hi = np.clip((hi - ay) / (by - ay), 0.0, 1.0)
        t_lo = np.where(np.isfinite(t_lo), t_lo, 0.0)
        t_hi = np.where(np.isfinite(t_hi), t_hi, 1.0)
        xa = ax + (bx - ax) * t_lo
        xb = ax + (bx - ax) * t_hi
        xmin = min(xa.min(), xb.min())
        xmax = max(xa.max(), xb.max())
        c0 = int(np.clip(np.floor(xmin), 0, n - 1))
        c1 = int(np.clip(np.floor(xmax), 0, n - 1))
        cols = np.arange(c0, c1 + 1, dtype=np.int64)
        txs_out.append(cols)
        tys_out.append(np.full(len(cols), row, dtype=np.int64))
    if not txs_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(txs_out), np.concatenate(tys_out)


def cover_bbox_np(lon_min, lat_min, lon_max, lat_max, zoom: int):
    """All (tx, ty) tiles intersecting a lon/lat bbox (polygon covering)."""
    x0, y1 = tile_xy_np([lon_min], [lat_min], zoom)  # lat_min -> larger ty
    x1, y0 = tile_xy_np([lon_max], [lat_max], zoom)
    txs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.int64)
    tys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(txs, tys)
    return gx.ravel(), gy.ravel()


# ---------------------------------------------------------------------------
# Spark column expressions (JVM-side; mirror the numpy math exactly)
# ---------------------------------------------------------------------------

if _HAS_SPARK:

    def merc_x_col(lon: Column) -> Column:
        return (lon + F.lit(180.0)) / F.lit(360.0)

    def merc_y_col(lat: Column) -> Column:
        clamped = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat))
        s = F.sin(F.radians(clamped))
        return F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(4.0 * math.pi)

    def tile_x_col(lon: Column, zoom: int) -> Column:
        n = 1 << zoom
        return F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor(merc_x_col(lon) * F.lit(float(n)))),
        ).cast("long")

    def tile_y_col(lat: Column, zoom: int) -> Column:
        n = 1 << zoom
        return F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor(merc_y_col(lat) * F.lit(float(n)))),
        ).cast("long")

    def cell_col(lon: Column, lat: Column, zoom: int) -> Column:
        return pack_cell_col(F.lit(zoom), tile_x_col(lon, zoom), tile_y_col(lat, zoom))

    def pack_cell_col(zoom: Column, tx: Column, ty: Column) -> Column:
        return (
            F.shiftleft(zoom.cast("long"), _Z_SHIFT)
            .bitwiseOR(F.shiftleft(tx.cast("long"), _X_SHIFT))
            .bitwiseOR(ty.cast("long"))
        )

    def quantize_lon_col(lon: Column) -> Column:
        """F8: 24-bit quantization as a pure column expr (src/util.ts:322-324)."""
        return F.floor((lon + F.lit(180.0)) * F.lit(16777215.0) / F.lit(360.0) + F.lit(0.5)).cast(
            "long"
        )

    def quantize_lat_col(lat: Column) -> Column:
        return F.floor((lat + F.lit(90.0)) * F.lit(16777215.0) / F.lit(180.0) + F.lit(0.5)).cast(
            "long"
        )

    def encode_offset_col(offset: Column) -> Column:
        """F11 (src/base/vectorFeature.ts:609-611)."""
        return F.floor(offset * F.lit(1000.0)).cast("long")

    def remap_value_col(value: Column, vmin: Column, vmax: Column, extent: int) -> Column:
        """F13 grid remap (src/open/gridLayer.ts:98-100)."""
        return F.floor((value - vmin) * F.lit(float(extent)) / (vmax - vmin) + F.lit(0.5)).cast(
            "long"
        )

    def transform_point_col(p: Column, extent: int) -> Column:
        """P13 extent quantization (src/base/vectorFeature.ts:584-602)."""
        return F.floor(p * F.lit(float(extent)) + F.lit(0.5)).cast("long")

    def quadkey_col(tx: Column, ty: Column, zoom: int) -> Column:
        """Bing-maps quadkey of tile (tx, ty) at ``zoom`` — one base-4
        digit per level, MSB first (the key scheme behind the reference's
        `bing` benchmark fixture; Microsoft Bing tile system).  Pure
        shift/mask/concat column expression; quadkeys prefix-nest (a
        child's key starts with its parent's), which is what makes them a
        directory layout / range-scan key for tilesets."""
        if zoom < 1:
            raise ValueError(f"quadkey needs zoom >= 1, got {zoom}")
        digits = [
            (
                F.shiftright(tx.cast("long"), i).bitwiseAND(F.lit(1))
                + F.shiftright(ty.cast("long"), i).bitwiseAND(F.lit(1)) * 2
            ).cast("string")
            for i in range(zoom - 1, -1, -1)
        ]
        return F.concat(*digits)

    GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def geohash_col(lon: Column, lat: Column, precision: int = 6) -> Column:
        """Standard geohash (Niemeyer; the Elasticsearch/Lucene cell key):
        lon/lat bisection bits interleaved lon-first, 5 bits per base-32
        character.  Implemented as quantize → Morton spread (the same
        mask chain as the Z-order layout key, layout.py:spread_bits16) →
        per-character shift/mask + substring into the base-32 alphabet —
        all codegen column exprs, SQL-twin-able verbatim.  ``precision``
        in characters, even values ≤ 12 keep the bit split symmetric
        (this implementation supports 1..6: 15+15 interleaved bits)."""
        if not 1 <= precision <= 6:
            raise ValueError(f"precision must be in [1, 6], got {precision}")
        from ..operators.layout import spread_bits16

        nbits = 15
        lonq = F.greatest(
            F.lit(0),
            F.least(
                F.lit((1 << nbits) - 1),
                F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nbits))),
            ),
        ).cast("long")
        latq = F.greatest(
            F.lit(0),
            F.least(
                F.lit((1 << nbits) - 1),
                F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nbits))),
            ),
        ).cast("long")
        # 30-bit Morton code, lon bits in the odd (higher) positions: the
        # MSB is lon's top bisection bit, exactly geohash's lon-first order
        mort = F.shiftleft(spread_bits16(lonq), 1).bitwiseOR(spread_bits16(latq))
        chars = [
            F.substring(
                F.lit(GEOHASH_B32),
                (F.shiftright(mort, 25 - 5 * k).bitwiseAND(F.lit(31)) + 1).cast("int"),
                1,
            )
            for k in range(precision)
        ]
        return F.concat(*chars)

    def geodesic_ring_area_m2(
        vertices: "DataFrame",  # noqa: F821
        id_cols: list,
        seq_col: str = "seq",
        lon_col: str = "lon",
        lat_col: str = "lat",
    ):
        """Spherical ring area (m²) from an exploded OPEN-ring vertex table
        — the geodesic counterpart of planar shoelace, per Chamberlain &
        Duquette (JPL 2007; the turf.js/PostGIS spherical-excess
        approximation):

            area = |Σ_edges rad(λ2−λ1)·(2 + sin φ1 + sin φ2)| · R²/2

        The wrap edge (last→first) comes from a first_value window, the
        per-edge terms sum with the repo's sorted-fold so the double is
        bit-stable across engines, and the whole thing is one shuffle on
        the ring key (driver oracle `geodesic_area`)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*id_cols).orderBy(seq_col)
        wall = (
            Window.partitionBy(*id_cols)
            .orderBy(seq_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        lon2 = F.coalesce(F.lead(lon_col).over(w), F.first(lon_col).over(wall))
        lat2 = F.coalesce(F.lead(lat_col).over(w), F.first(lat_col).over(wall))
        # wrap the edge's longitude delta into [-180, 180): an edge from
        # 179 to -179 is a 2-degree step, not -358 — without the wrap a
        # ring straddling the antimeridian is off by orders of magnitude.
        # floor-based wrap (not %) so Spark and DuckDB agree on negatives.
        dl = lon2 - F.col(lon_col)
        dl = dl - F.lit(360.0) * F.floor((dl + F.lit(180.0)) / F.lit(360.0))
        term = F.radians(dl) * (
            F.lit(2.0) + F.sin(F.radians(F.col(lat_col))) + F.sin(F.radians(lat2))
        )
        per_edge = vertices.withColumn("_term", term)
        return per_edge.groupBy(*id_cols).agg(
            (
                F.abs(
                    F.aggregate(
                        F.sort_array(F.collect_list("_term")),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
                * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)
            ).alias("area_m2")
        )


# ---------------------------------------------------------------------------
# distance + point-in-polygon (numpy, used inside Arrow UDFs)
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6_371_008.8


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, vectorized + broadcastable."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def points_in_ring_np(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast: are points inside the ring (winding-agnostic)?

    px/py: (n,) point coords.  ring: (m, 2) closed or open ring.
    Fully vectorized over n*m edge tests.
    """
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1, y1 = ring[:, 0], ring[:, 1]  # (m,)
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    px = np.asarray(px, dtype=np.float64)[:, None]  # (n,1)
    py = np.asarray(py, dtype=np.float64)[:, None]
    crosses = (y1 > py) != (y2 > py)  # edge straddles the horizontal ray
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hit = crosses & (px < xint)
    return (hit.sum(axis=1) % 2).astype(bool)


def points_in_polygon_np(px, py, rings: list) -> np.ndarray:
    """Exact PIP with holes: inside outer ring (ring 0) and outside every
    hole (reference hole semantics via classifyRings winding,
    src/mapbox/vectorFeature.ts:357-381).  Degenerate (zero-area) rings are
    dropped, matching the reference."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if len(px) == 0:
        return np.zeros(0, dtype=bool)
    live = [r for r in rings if _ring_area(r) != 0.0]
    if not live:
        return np.zeros(len(px), dtype=bool)
    inside = points_in_ring_np(px, py, np.asarray(live[0]))
    for hole in live[1:]:
        inside &= ~points_in_ring_np(px, py, np.asarray(hole))
    return inside


def _ring_area(ring) -> float:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    xp, yp = np.roll(x, 1), np.roll(y, 1)
    return float(np.sum((xp - x) * (y + yp)))


if _HAS_SPARK:

    def viewport_tiles(
        viewports: "DataFrame",
        min_lon: str = "min_lon",
        min_lat: str = "min_lat",
        max_lon: str = "max_lon",
        max_lat: str = "max_lat",
        zoom: str = "zoom",
        max_tiles: int = 4096,
    ) -> "DataFrame":
        """The tile server's inverse query: a (bbox, zoom) viewport ->
        the exploded set of (tile_x, tile_y) keys that cover it — what a
        map client requests per frame, and the key set a tileset scan
        prunes on.

        Per-row ``zoom`` (different clients at different zooms in one
        table).  Antimeridian-crossing viewports (min_lon > max_lon)
        split into two x-ranges — the standard slippy-map convention.
        Pure column expressions end-to-end (pow/floor/sequence/explode,
        no Python, no shuffle): cover size is data, not plan, so the
        whole frontier of viewport requests fans out map-side.

        No silent caps: a viewport covering more than ``max_tiles`` tiles
        emits ONE row with NULL tile_x/tile_y and ``oversized=true``
        instead of exploding (the caller decides whether to re-request at
        a lower zoom); every output row carries ``n_tiles`` so the cap is
        auditable.
        """
        if max_tiles < 1:
            raise ValueError(f"max_tiles must be >= 1, got {max_tiles}")
        zc = F.col(zoom).cast("double")
        n = F.pow(F.lit(2.0), zc)

        def _tx(c: Column) -> Column:
            return F.greatest(
                F.lit(0.0), F.least(n - F.lit(1.0), F.floor(merc_x_col(c) * n))
            ).cast("long")

        def _ty(c: Column) -> Column:
            return F.greatest(
                F.lit(0.0), F.least(n - F.lit(1.0), F.floor(merc_y_col(c) * n))
            ).cast("long")

        x0, x1 = _tx(F.col(min_lon)), _tx(F.col(max_lon))
        y0, y1 = _ty(F.col(max_lat)), _ty(F.col(min_lat))  # north = smaller y
        last = (n - F.lit(1.0)).cast("long")
        # crossing box whose two arcs land in overlapping tile ranges
        # (x1 >= x0 — e.g. both edges inside ONE tile at low zoom, or a
        # near-global box): the union is the full x row; emitting both
        # ranges would duplicate tiles and overcount n_tiles
        ranges = (
            F.when(
                F.col(min_lon) <= F.col(max_lon),
                F.array(F.struct(x0.alias("a"), x1.alias("b"))),
            )
            .when(
                x1 >= x0,
                F.array(F.struct(F.lit(0).cast("long").alias("a"), last.alias("b"))),
            )
            .otherwise(
                F.array(
                    F.struct(x0.alias("a"), last.alias("b")),
                    F.struct(F.lit(0).cast("long").alias("a"), x1.alias("b")),
                )
            )
        )
        xspan = F.aggregate(
            ranges, F.lit(0).cast("long"), lambda acc, r: acc + r["b"] - r["a"] + 1
        )
        base = (
            viewports.withColumn("_rs", ranges)
            .withColumn("_y0", y0)
            .withColumn("_y1", y1)
            .withColumn("n_tiles", xspan * (y1 - y0 + 1))
        )
        keep = [c for c in viewports.columns]
        ok = (
            base.filter(F.col("n_tiles") <= max_tiles)
            .select(*keep, "n_tiles", "_y0", "_y1", F.explode("_rs").alias("_r"))
            .select(
                *keep,
                "n_tiles",
                "_y0",
                "_y1",
                F.explode(F.sequence(F.col("_r.a"), F.col("_r.b"))).alias("tile_x"),
            )
            .select(
                *keep,
                "n_tiles",
                F.explode(F.sequence(F.col("_y0"), F.col("_y1"))).alias("tile_y"),
                "tile_x",
            )
            .select(*keep, "n_tiles", "tile_x", "tile_y", F.lit(False).alias("oversized"))
        )
        big = base.filter(F.col("n_tiles") > max_tiles).select(
            *keep,
            "n_tiles",
            F.lit(None).cast("long").alias("tile_x"),
            F.lit(None).cast("long").alias("tile_y"),
            F.lit(True).alias("oversized"),
        )
        return ok.unionByName(big)

    def geodesic_densify(
        df: DataFrame,
        *,
        id_cols: list[str],
        n_segments: int,
        lon1_col: str = "lon1",
        lat1_col: str = "lat1",
        lon2_col: str = "lon2",
        lat2_col: str = "lat2",
    ) -> DataFrame:
        """Great-circle densification -> one row per waypoint:
        ``(*id_cols, seg_idx, lon, lat, degenerate)`` with seg_idx
        0..n_segments inclusive (endpoints kept).

        Long geodesic edges drawn as straight lines in tile space cut
        corners badly at low zooms — flight routes, shipping lanes,
        cable maps all densify first.  Spherical linear interpolation
        (slerp): p(t) = (sin((1-t)ω)·A + sin(tω)·B) / sin ω on unit
        vectors, ω the central angle from the haversine chain.

        Pure column math, map-side only (one explode, NO shuffle, no
        UDF) — same fixed IEEE chains in the SQL twin.  Degenerate
        cases: coincident endpoints (ω = 0) emit the start point for
        every waypoint; exactly antipodal endpoints (sin ω = 0, ω > 0 —
        the great circle is ambiguous) emit null coordinates with
        ``degenerate`` = true rather than an arbitrary path.
        """
        if n_segments < 1:
            raise ValueError(f"n_segments must be >= 1, got {n_segments}")
        lon1, lat1 = F.col(lon1_col), F.col(lat1_col)
        lon2, lat2 = F.col(lon2_col), F.col(lat2_col)
        dlat = F.radians(lat2 - lat1)
        dlon = F.radians(lon2 - lon1)
        h = (
            F.sin(dlat / 2) ** 2
            + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
        )
        sh = F.least(F.lit(1.0), F.sqrt(h))
        omega = F.lit(2.0) * F.asin(sh)
        ax = F.cos(F.radians(lat1)) * F.cos(F.radians(lon1))
        ay = F.cos(F.radians(lat1)) * F.sin(F.radians(lon1))
        az = F.sin(F.radians(lat1))
        bx = F.cos(F.radians(lat2)) * F.cos(F.radians(lon2))
        by = F.cos(F.radians(lat2)) * F.sin(F.radians(lon2))
        bz = F.sin(F.radians(lat2))
        base = df.select(
            *id_cols,
            omega.alias("_om"),
            sh.alias("_sh"),
            F.sin(omega).alias("_so"),
            ax.alias("_ax"),
            ay.alias("_ay"),
            az.alias("_az"),
            bx.alias("_bx"),
            by.alias("_by"),
            bz.alias("_bz"),
            lon1.alias("_lon1"),
            lat1.alias("_lat1"),
        ).select(
            *id_cols,
            "_om", "_sh", "_so", "_ax", "_ay", "_az", "_bx", "_by", "_bz",
            "_lon1", "_lat1",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_segments)))).alias(
                "seg_idx"
            ),
        )
        t = F.col("seg_idx").cast("double") / F.lit(float(n_segments))
        f1 = F.sin((F.lit(1.0) - t) * F.col("_om")) / F.col("_so")
        f2 = F.sin(t * F.col("_om")) / F.col("_so")
        x = f1 * F.col("_ax") + f2 * F.col("_bx")
        y = f1 * F.col("_ay") + f2 * F.col("_by")
        z = f1 * F.col("_az") + f2 * F.col("_bz")
        lat_i = F.degrees(F.atan2(z, F.sqrt(x * x + y * y)))
        lon_i = F.degrees(F.atan2(y, x))
        zero = F.col("_om") == 0.0
        # antipodal detection via the CLAMPED haversine hitting 1.0, not
        # sin(omega) == 0: sin(pi) is 1.2e-16 in floats, so a sin test
        # never fires and the slerp silently collapses to garbage
        anti = F.col("_sh") == 1.0
        return base.select(
            *id_cols,
            "seg_idx",
            F.when(zero, F.col("_lon1")).when(anti, F.lit(None)).otherwise(
                lon_i
            ).alias("lon"),
            F.when(zero, F.col("_lat1")).when(anti, F.lit(None)).otherwise(
                lat_i
            ).alias("lat"),
            anti.alias("degenerate"),
        )


# ---------------------------------------------------------------------------
# Google Encoded Polyline (precision 5): the web's route wire format
# ---------------------------------------------------------------------------
#
# The interchange format web pages actually carry GPS routes in (Google
# Maps / OSRM / Valhalla URLs and JSON payloads): quantize to 1e-5 deg,
# delta-encode, zigzag, emit little-endian 5-bit chunks as printable ASCII
# (+63, 0x20 continuation bit).  Same coding ideas as the OVT geometry
# stream (delta + zigzag; reference src/util.ts zigzag/zagzig) on a
# text-safe alphabet.  Both directions are PURE column expressions —
# higher-order array functions, no Python, no shuffle; decode returns the
# QUANTIZED integers (exact; divide by 1e5 only at the edge).


def _let_col(expr, body):
    """Evaluate ``expr`` once, pass to ``body`` as a lambda variable (the
    1-element-transform let-binding from operators/dedup.py)."""
    from pyspark.sql import functions as F

    return F.element_at(F.transform(F.array(expr), body), 1)


def _polyline_chunks(v):
    """Non-negative zigzagged value -> its 5-bit-chunk ASCII string.
    Seven unrolled chunk slots cover |delta| < 2^34 (lat/lon deltas fit in
    28 bits); slot i emits iff it is slot 0 or bits remain at/above it."""
    from pyspark.sql import functions as F

    parts = []
    for i in range(7):
        rem = F.shiftright(v, 5 * i)
        chunk = rem.bitwiseAND(F.lit(31))
        more = F.shiftright(v, 5 * (i + 1)) > 0
        code = F.when(more, chunk.bitwiseOR(F.lit(32))).otherwise(chunk) + F.lit(63)
        emit = (rem > 0) if i else F.lit(True)
        parts.append(F.when(emit, F.char(code)).otherwise(F.lit("")))
    return F.concat(*parts)


def _zigzag64(d):
    from pyspark.sql import functions as F

    return F.shiftleft(d, 1).bitwiseXOR(F.shiftright(d, 63))


def encode_polyline(lats, lons):
    """(array<double> lats, array<double> lons) -> polyline5 string.
    Quantization is JS ``Math.round`` (floor(x*1e5 + 0.5)) for parity with
    the canonical encoder."""
    from pyspark.sql import functions as F

    def q(arr):
        return F.transform(
            arr, lambda x: F.floor(x * F.lit(1e5) + F.lit(0.5)).cast("long")
        )

    def deltas(arr):
        # d_i = a_i - a_{i-1} (a_{-1} = 0); element_at is 1-based, the
        # transform index 0-based, so element_at(arr, i) IS the previous
        return F.transform(
            arr,
            lambda x, i: x
            - F.when(i > 0, F.element_at(arr, i)).otherwise(F.lit(0).cast("long")),
        )

    def enc_arr(arr):
        return F.transform(deltas(arr), lambda d: _polyline_chunks(_zigzag64(d)))

    return _let_col(
        q(lats),
        lambda qla: _let_col(
            q(lons),
            lambda qlo: F.array_join(
                F.zip_with(enc_arr(qla), enc_arr(qlo), lambda a, b: F.concat(a, b)),
                "",
            ),
        ),
    )


def decode_polyline(s):
    """polyline5 string -> array<struct<ilat: long, ilon: long>> of the
    QUANTIZED coordinates (multiply by 1e-5 for degrees).  A stateful
    scan expressed as F.aggregate over the character codes: accumulate
    5-bit chunks until a byte without the 0x20 continuation bit closes a
    value, un-zigzag, then a second fold interleave-cumsums the deltas."""
    from pyspark.sql import functions as F

    codes = F.filter(
        F.transform(F.split(s, ""), lambda c: F.ascii(c) - F.lit(63)),
        lambda c: c >= 0,  # drops the '' artifact of splitting empty input
    )
    # chunk slots are disjoint bit ranges, so OR == ADD: track a running
    # multiplier (1, 32, 1024, ...) instead of a shift count — shiftleft
    # needs a literal bit count, a multiplier stays pure column math
    vals = F.aggregate(
        codes,
        F.struct(
            F.array().cast("array<long>").alias("vals"),
            F.lit(0).cast("long").alias("cur"),
            F.lit(1).cast("long").alias("mult"),
        ),
        lambda acc, c: _let_col(
            acc["cur"] + c.bitwiseAND(F.lit(31)).cast("long") * acc["mult"],
            lambda cur2: F.when(
                c >= 32,
                F.struct(
                    acc["vals"].alias("vals"),
                    cur2.alias("cur"),
                    (acc["mult"] * F.lit(32)).alias("mult"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(
                        acc["vals"],
                        F.array(
                            F.shiftrightunsigned(cur2, 1).bitwiseXOR(
                                -cur2.bitwiseAND(F.lit(1))
                            )
                        ),
                    ).alias("vals"),
                    F.lit(0).cast("long").alias("cur"),
                    F.lit(1).cast("long").alias("mult"),
                )
            ),
        ),
        lambda acc: acc["vals"],
    )
    # interleaved deltas [dlat0, dlon0, dlat1, ...] -> de-interleave (filter
    # by index) -> per-point prefix sums.  The slice+fold cumsum is O(n^2)
    # per route — routes are short (10^2-10^3 points); a 10^6-point
    # monster belongs in the events/track operators, not a polyline.
    def cumsum_at(arr, i):
        return F.aggregate(
            F.slice(arr, F.lit(1), i), F.lit(0).cast("long"), lambda a, x: a + x
        )

    return _let_col(
        vals,
        lambda v: _let_col(
            F.filter(v, lambda x, i: i % 2 == 0),
            lambda latd: _let_col(
                F.filter(v, lambda x, i: i % 2 == 1),
                lambda lond: F.when(
                    F.size(latd) == 0,
                    F.array().cast("array<struct<ilat:bigint,ilon:bigint>>"),
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(latd)),
                        lambda i: F.struct(
                            cumsum_at(latd, i).alias("ilat"),
                            cumsum_at(lond, i).alias("ilon"),
                        ),
                    )
                ),
            ),
        ),
    )

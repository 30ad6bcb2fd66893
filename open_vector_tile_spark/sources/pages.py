"""Deterministic synthetic fixtures (FIXTURES.md §1-5).

Every generator is a pure function of ``(seed, row_index)`` — two runs and two
parallelism levels produce identical rows (scaling-efficiency evidence
protocol needs byte-identical inputs).  numpy-vectorized; emitted as pandas
DataFrames (small/smoke) or written once to parquet for bench scale.

Input-table shape fixed by BASELINE.json input_hint:
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
LANGS = ("en", "de", "fr", "es", "pt")
CITIES = (
    "Berlin", "Lagos", "Osaka", "Quito", "Perth", "Oslo", "Cusco", "Dakar",
    "Hanoi", "Tunis", "Miami", "Seoul", "Cairo", "Pune", "Lima", "Kyiv",
)
# three dense "mega-cell" hotspots (skew: 5% of rows — i % 20 == 0 —
# FIXTURES.md §1; the dedicated 90%-mega-cell skew test builds its own
# corpus in tests/test_plan_shape.py)
HOTSPOTS = ((13.40, 52.52), (-74.00, 40.71), (139.69, 35.69))


def _frac(x: np.ndarray) -> np.ndarray:
    return x - np.floor(x)


def page_coords(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pure-function coordinates: hash-like frac(sin) spread, with rows where
    ``i % 20 == 0`` (5%) pulled into one of 3 urban hotspots (~1.7% of all
    rows per hot city — city-scale skew, exercises AQE/salting without being
    a degenerate single-cell corpus)."""
    i = np.asarray(i, dtype=np.float64)
    lon = -180.0 + 360.0 * _frac(np.sin(i * 12.9898) * 43758.5453)
    lat = -85.0 + 170.0 * _frac(np.sin(i * 78.2330) * 12345.6789)
    hot = (i.astype(np.int64) % 20) == 0
    hidx = (i.astype(np.int64) // 20) % len(HOTSPOTS)
    hlon = np.array([h[0] for h in HOTSPOTS])[hidx]
    hlat = np.array([h[1] for h in HOTSPOTS])[hidx]
    # ~1 degree metro-area jitter inside the hotspot
    jlon = 1.0 * (_frac(np.sin(i * 3.9898) * 9871.123) - 0.5)
    jlat = 1.0 * (_frac(np.sin(i * 5.1234) * 8765.432) - 0.5)
    lon = np.where(hot, hlon + jlon, lon)
    lat = np.where(hot, hlat + jlat, lat)
    return np.round(lon, 5), np.round(lat, 5)


def pages_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """The pages table (FIXTURES.md §1)."""
    i = np.arange(start, start + n, dtype=np.int64)
    lon, lat = page_coords(i)
    city = np.array(CITIES)[i % len(CITIES)]
    urls = np.char.add(
        np.char.add("https://example", (i % 97).astype(str)),
        np.char.add(".org/p/", i.astype(str)),
    )
    text = np.array(
        [
            f"Report {int(ii)}: events in {c} ({la:.5f}, {lo:.5f}) drew attention."
            for ii, c, la, lo in zip(i, city, lat, lon)
        ]
    )
    html = np.array([f"<html><body><p>{t}</p></body></html>".encode() for t in text], dtype=object)
    ts = pd.Timestamp("2025-01-01T00:00:00Z").tz_localize(None) + pd.to_timedelta(i * 137, unit="s")
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": np.array(LANGS)[i % len(LANGS)],
        }
    )


def polygons_pdf(n: int = 50) -> pd.DataFrame:
    """Seeded convex-ish rings around grid anchors; 10% with one hole; two
    degenerate zero-area rings; one crossing a tile boundary
    (FIXTURES.md §2)."""
    rows = []
    for pid in range(n):
        rng = np.random.RandomState(SEED + pid)
        # anchor grid covers the globe away from poles
        cx = -170.0 + (pid % 10) * 34.0 + rng.uniform(-3, 3)
        cy = -60.0 + (pid // 10) * 24.0 + rng.uniform(-3, 3)
        if pid == 7:
            # polygon deliberately straddling the z4 tile boundary at lon=0
            cx = 0.0
        nv = int(rng.randint(8, 33))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(2.0, 8.0) * (1.0 + 0.2 * np.sin(3 * ang))
        xs = cx + rad * np.cos(ang)
        ys = np.clip(cy + rad * np.sin(ang) * 0.7, -84.0, 84.0)
        outer = np.stack([xs, ys], axis=1)
        outer = np.vstack([outer, outer[:1]])
        rings = [outer.ravel().tolist()]
        if pid in (3, 13, 23, 33, 43):  # 10% holes
            hr = rad.min() * 0.3
            hx = cx + hr * np.cos(ang[:8])
            hy = cy + hr * np.sin(ang[:8]) * 0.7
            hole = np.stack([hx, hy], axis=1)
            hole = np.vstack([hole, hole[:1]])
            rings.append(hole.ravel().tolist())
        if pid in (48, 49):  # degenerate: zero-area ring
            rings = [[cx, cy, cx + 1.0, cy, cx, cy, cx, cy]]
        rows.append(
            {
                "poly_id": pid,
                "layer": "admin" if pid % 2 == 0 else "landuse",
                "ring_xy": rings,
                "name": f"poly-{pid}",
                "kind": ("park", "city", "zone")[pid % 3],
                "rank": pid % 11,
            }
        )
    return pd.DataFrame(rows)


def pois_pdf(n: int = 100) -> pd.DataFrame:
    """kNN anchors (FIXTURES.md §3)."""
    i = np.arange(n, dtype=np.int64)
    lon = -180.0 + 360.0 * _frac(np.sin((i + 0.5) * 91.17) * 47453.77)
    lat = -80.0 + 160.0 * _frac(np.sin((i + 0.5) * 31.77) * 65421.99)
    return pd.DataFrame(
        {
            "poi_id": i,
            "lon": np.round(lon, 5),
            "lat": np.round(lat, 5),
            "category": np.array(["food", "fuel", "hotel", "museum"])[i % 4],
            "name": [f"poi-{int(x)}" for x in i],
        }
    )


def grid_input(size: int = 32, extent: int = 8192) -> dict:
    """Raster layer source (FIXTURES.md §4)."""
    idx = np.arange(size * size, dtype=np.float64)
    x = idx % size
    y = idx // size
    return {
        "name": "elevation",
        "size": size,
        "extent": extent,
        "data": 1000.0 * np.sin(x / 7.0) * np.cos(y / 5.0) - 500.0,
    }


def image_input(size: int = 64) -> dict:
    """Opaque image bytes (FIXTURES.md §5)."""
    data = bytes((i * 7 + 13) % 256 for i in range(size * size))
    return {"name": "satellite", "type": "raw", "width": size, "height": size, "image": data}


def pages_spark(spark, n: int, partitions: int = 32):
    """Pages as a Spark DataFrame, generated distributed but deterministically:
    spark.range drives the row index; coordinates/text built per-partition with
    the same numpy pure functions via mapInPandas (no driver materialization,
    scales to bench sizes)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if len(idx) == 0:
                continue
            # pages_pdf is pure in the absolute index -> parallelism-invariant
            if (np.diff(idx) == 1).all():
                yield pages_pdf(len(idx), start=int(idx[0]))
                continue
            # non-contiguous batch: one vectorized call per contiguous run
            runs = np.split(idx, np.where(np.diff(idx) != 1)[0] + 1)
            yield pd.concat(
                [pages_pdf(len(r), start=int(r[0])) for r in runs],
                ignore_index=True,
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema)

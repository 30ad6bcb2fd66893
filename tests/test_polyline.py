"""Google Encoded Polyline codec: documented test vector, independent
python-reference parity, quantized round-trip, edge shapes."""

import math

import numpy as np
from pyspark.sql import functions as F

from open_vector_tile_spark.functions.geo import decode_polyline, encode_polyline


def _enc_ref(points):
    """Independent scalar encoder (canonical algorithm)."""
    out = []
    plat = plon = 0
    for lat, lon in points:
        ilat = math.floor(lat * 1e5 + 0.5)
        ilon = math.floor(lon * 1e5 + 0.5)
        for d in (ilat - plat, ilon - plon):
            v = ~(d << 1) if d < 0 else (d << 1)
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        plat, plon = ilat, ilon
    return "".join(out)


def _roundtrip(spark, routes):
    df = spark.createDataFrame(
        [(i, [p[0] for p in pts], [p[1] for p in pts]) for i, pts in routes.items()],
        "id int, lats array<double>, lons array<double>",
    )
    enc = df.select("id", encode_polyline(F.col("lats"), F.col("lons")).alias("pl"))
    dec = enc.select("id", "pl", decode_polyline(F.col("pl")).alias("pts"))
    return {
        r["id"]: (r["pl"], [(p["ilat"], p["ilon"]) for p in r["pts"]])
        for r in dec.collect()
    }


def test_polyline_google_documented_vector(spark):
    pts = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
    got = _roundtrip(spark, {1: pts})[1]
    assert got[0] == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert got[1] == [(3850000, -12020000), (4070000, -12095000), (4325200, -12645300)]


def test_polyline_matches_reference_randomized(spark):
    rng = np.random.default_rng(29)
    routes = {}
    for i in range(30):
        n = int(rng.integers(1, 25))
        lat0, lon0 = rng.uniform(-85, 85), rng.uniform(-179, 179)
        pts = [
            (
                float(lat0 + rng.uniform(-0.5, 0.5)),
                float(lon0 + rng.uniform(-0.5, 0.5)),
            )
            for _ in range(n)
        ]
        routes[i] = pts
    got = _roundtrip(spark, routes)
    for i, pts in routes.items():
        assert got[i][0] == _enc_ref(pts), i
        want_ints = [
            (math.floor(a * 1e5 + 0.5), math.floor(b * 1e5 + 0.5)) for a, b in pts
        ]
        assert got[i][1] == want_ints, i


def test_polyline_edges(spark):
    routes = {
        1: [(0.0, 0.0)],  # single zero point -> '??'
        2: [(1.0, 1.0), (1.0, 1.0)],  # zero delta
        3: [(-89.999, -179.999), (89.999, 179.999)],  # extreme swing
        4: [],  # empty route
    }
    got = _roundtrip(spark, routes)
    assert got[1][0] == "??" and got[1][1] == [(0, 0)]
    assert got[2][0] == _enc_ref(routes[2]) and got[2][1][0] == got[2][1][1]
    assert got[3][0] == _enc_ref(routes[3])
    assert got[3][1] == [(-8999900, -17999900), (8999900, 17999900)]
    assert got[4] == ("", [])

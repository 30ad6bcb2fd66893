"""Trajectory speed / teleport gate (operators/events.py track_speed)."""

import datetime as dt
import math
import random

import pytest

from open_vector_tile_spark.operators.events import track_speed

R = 6_371_008.8


def _hav(lon1, lat1, lon2, lat2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2.0 * R * math.asin(min(1.0, math.sqrt(a)))


def _py_track(rows, max_speed):
    """rows = [(user, ts_us, lon, lat, seq)] -> {seq: (dt_s, dist, speed, bad)}"""
    out = {}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[4])):
        u = r[0]
        prev = by_user.get(u)
        if prev is None:
            out[r[4]] = (None, None, None, False)
        else:
            dt_us = r[1] - prev[1]
            dist = _hav(prev[2], prev[3], r[2], r[3])
            speed = dist / (dt_us / 1e6) if dt_us > 0 else None
            bad = (speed is not None and speed > max_speed) or (
                dt_us == 0 and dist > 0
            )
            out[r[4]] = (dt_us / 1e6, dist, speed, bad)
        by_user[u] = r
    return out


def _df(spark, rows):
    data = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=ts_us), lon, lat, seq)
        for u, ts_us, lon, lat, seq in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, lon double, lat double, seq long"
    )


def test_known_track(spark):
    rows = [
        (1, 0, 13.40, 52.52, 0),           # first ping
        (1, 10_000_000, 13.41, 52.52, 1),  # ~678 m in 10 s -> ~68 m/s ok
        (1, 11_000_000, 14.00, 53.00, 2),  # huge jump in 1 s -> implausible
        (1, 11_000_000, 14.00, 53.00, 3),  # duplicate ping -> fine
        (1, 12_000_000, 14.50, 53.00, 4),  # dt>0 but teleport speed
        (2, 0, 0.0, 0.0, 5),               # separate track
    ]
    df = _df(spark, rows)
    got = {
        r["seq"]: (r["dt_s"], r["dist_m"], r["speed_mps"], r["implausible"])
        for r in track_speed(df, order_cols=("seq",)).collect()
    }
    want = _py_track(rows, 70.0)
    assert set(got) == set(want)
    for k in want:
        for gv, wv in zip(got[k], want[k]):
            if wv is None:
                assert gv is None, (k, got[k], want[k])
            elif isinstance(wv, bool):
                assert gv == wv, (k, got[k], want[k])
            else:
                assert gv == pytest.approx(wv, rel=1e-12), (k, got[k], want[k])
    assert not got[0][3] and not got[1][3] and not got[3][3] and not got[5][3]
    assert got[2][3] and got[4][3]


def test_randomized_parity_and_determinism(spark):
    rng = random.Random(13)
    rows = []
    seq = 0
    for u in range(20):
        t = 0
        lon, lat = rng.uniform(-10, 10), rng.uniform(40, 50)
        for _ in range(rng.randint(1, 15)):
            rows.append((u, t, lon, lat, seq))
            seq += 1
            t += rng.choice([0, 1_000_000, 30_000_000])
            lon += rng.uniform(-0.01, 0.01)
            lat += rng.uniform(-0.01, 0.01)
    df = _df(spark, rows)
    got = {
        r["seq"]: (r["dt_s"], r["dist_m"], r["speed_mps"], r["implausible"])
        for r in track_speed(df, order_cols=("seq",), max_speed_mps=30.0).collect()
    }
    want = _py_track(rows, 30.0)
    assert set(got) == set(want)
    for k in want:
        for gv, wv in zip(got[k], want[k]):
            if wv is None:
                assert gv is None
            elif isinstance(wv, bool):
                assert gv == wv
            else:
                assert gv == pytest.approx(wv, rel=1e-12)
    got2 = {
        r["seq"]: r["implausible"]
        for r in track_speed(
            df.repartition(7), order_cols=("seq",), max_speed_mps=30.0
        ).collect()
    }
    assert got2 == {k: v[3] for k, v in got.items()}


def test_validation(spark):
    df = _df(spark, [(1, 0, 0.0, 0.0, 0)])
    with pytest.raises(ValueError):
        track_speed(df, max_speed_mps=0.0)


def test_null_coordinates_yield_null_distance(spark):
    # a ping with missing fix must not smear antipodal distances
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0, 10.0, 0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 10), None, None, 1),
        (1, dt.datetime(2024, 1, 1, 0, 0, 20), 10.0, 10.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, lon double, lat double, seq long"
    )
    got = {
        r["seq"]: (r["dist_m"], r["speed_mps"], r["implausible"])
        for r in track_speed(df, order_cols=("seq",)).collect()
    }
    assert got[1] == (None, None, False)
    assert got[2] == (None, None, False)  # prev fix unknown

"""Calendar resample + LOCF gap fill and trailing range-window stats:
python-reference parity, gap semantics, frame boundary inclusion, and
repartition invariance."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.events import resample_fill, rolling_stats

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows, npart=None):
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    return df.repartition(npart) if npart else df


def _ts(minutes, seconds=0, micros=0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds, microseconds=micros)


def _ref_resample(rows, step_s):
    """Independent python replay: dict-of-buckets + explicit LOCF walk."""
    out = {}
    per_key = {}
    for u, ts, v in rows:
        per_key.setdefault(u, []).append((ts, v))
    for u, evs in per_key.items():
        b = {}
        for ts, v in evs:
            us = int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
            # rebuild exact micros (total_seconds loses precision on huge
            # values; fine at 2024 epoch scale with micros below)
            us = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
            k = us // (step_s * 1_000_000)
            b.setdefault(k, []).append((ts, v))
        last_fill = None
        for k in range(min(b), max(b) + 1):
            evs_k = sorted(b.get(k, []), key=lambda p: (p[0], p[1]))
            if evs_k:
                v_last = evs_k[-1][1]
                last_fill = v_last
                out[(u, k)] = (
                    len(evs_k),
                    sum(v for _, v in evs_k),
                    v_last,
                    last_fill,
                )
            else:
                out[(u, k)] = (0, 0.0, None, last_fill)
    return out


def _collect_resample(df, step_s):
    got = {}
    for r in df.collect():
        us = (r["bucket_ts"] - dt.datetime(1970, 1, 1)) // dt.timedelta(
            microseconds=1
        )
        k = us // (step_s * 1_000_000)
        got[(r["user_id"], k)] = (r["n_obs"], r["v_sum"], r["v_last"], r["v_fill"])
    return got


def test_resample_matches_reference_randomized(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        rows.append(
            (
                int(rng.integers(0, 5)),
                _ts(int(rng.integers(0, 60 * 48)), int(rng.integers(0, 60))),
                float(np.round(rng.uniform(0, 50), 2)),
            )
        )
    step = 3600
    got = _collect_resample(
        resample_fill(_ev(spark, rows, 7), step_seconds=step), step
    )
    ref = _ref_resample(rows, step)
    assert set(got) == set(ref)
    for k in ref:
        g, r = got[k], ref[k]
        assert g[0] == r[0] and g[2] == r[2] and g[3] == r[3], k
        assert g[1] == pytest.approx(r[1], abs=1e-9), k


def test_resample_gap_rows_and_locf(spark):
    rows = [(1, _ts(0), 5.0), (1, _ts(200), 7.0)]  # hours 0 and 3, gap 1-2
    got = _collect_resample(resample_fill(_ev(spark, rows)), 3600)
    assert len(got) == 4
    assert got[(1, 473352)] == (1, 5.0, 5.0, 5.0)  # 2024-01-01T00 bucket
    assert got[(1, 473353)] == (0, 0.0, None, 5.0)  # gap carries 5.0
    assert got[(1, 473354)] == (0, 0.0, None, 5.0)
    assert got[(1, 473355)] == (1, 7.0, 7.0, 7.0)


def test_resample_last_tie_on_ts_is_max_value(spark):
    t = _ts(10)
    rows = [(1, t, 2.0), (1, t, 9.0), (1, t, 4.0)]
    got = _collect_resample(resample_fill(_ev(spark, rows)), 3600)
    ((n, s, vl, vf),) = got.values()
    assert (n, vl, vf) == (3, 9.0, 9.0) and s == pytest.approx(15.0)


def test_resample_repartition_invariance(spark):
    rows = [
        (u, _ts(m * 37, m % 60), float(u * 10 + m % 7))
        for u in range(3)
        for m in range(40)
    ]
    a = _collect_resample(resample_fill(_ev(spark, rows, 1)), 3600)
    b = _collect_resample(resample_fill(_ev(spark, rows, 13)), 3600)
    assert a == b


def _ref_rolling(rows, win_s, scale=100):
    out = {}
    per_key = {}
    for i, (u, ts, v) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, v))
    for u, evs in per_key.items():
        for ts, v in evs:
            lo = ts - dt.timedelta(seconds=win_s)
            ticks = [round(w * scale) for t2, w in evs if lo <= t2 <= ts]
            s = sum(ticks)
            out.setdefault((u, ts), []).append(
                (
                    len(ticks),
                    s / scale,
                    s / len(ticks) / scale,
                    min(ticks) / scale,
                    max(ticks) / scale,
                )
            )
    return out


def test_rolling_matches_reference_randomized(spark):
    rng = np.random.default_rng(23)
    rows = [
        (
            int(rng.integers(0, 4)),
            _ts(int(rng.integers(0, 240)), int(rng.integers(0, 60))),
            float(np.round(rng.uniform(-5, 20), 2)),
        )
        for _ in range(200)
    ]
    got = {}
    out = rolling_stats(_ev(spark, rows, 9), window_seconds=1800).collect()
    for r in out:
        got.setdefault((r["user_id"], r["ts"]), []).append(
            (r["n_win"], r["sum_win"], r["mean_win"], r["min_win"], r["max_win"])
        )
    ref = _ref_rolling(rows, 1800)
    assert set(got) == set(ref)
    for k in ref:
        assert sorted(got[k]) == pytest.approx(sorted(ref[k])), k


def test_rolling_range_boundaries_inclusive(spark):
    # events exactly window_seconds apart: the older one IS in the frame
    rows = [(1, _ts(0), 1.0), (1, _ts(0, 0, 1), 2.0), (1, _ts(1, 0, 1), 4.0)]
    out = {
        r["ts"]: (r["n_win"], r["sum_win"])
        for r in rolling_stats(_ev(spark, rows), window_seconds=60).collect()
    }
    assert out[_ts(0)] == (1, 1.0)
    assert out[_ts(0, 0, 1)] == (2, 3.0)
    # third event: exactly 60s after the second (peer at -window included),
    # 60s + 1us after the first (excluded)
    assert out[_ts(1, 0, 1)] == (2, 6.0)


def test_rolling_ts_peers_share_frame(spark):
    t = _ts(5)
    rows = [(1, t, 1.0), (1, t, 2.0), (1, _ts(4), 10.0)]
    out = rolling_stats(_ev(spark, rows), window_seconds=120).collect()
    peers = [r for r in out if r["ts"] == t]
    assert len(peers) == 2
    for r in peers:  # RANGE frame: both peers see each other + the earlier row
        assert (r["n_win"], r["sum_win"]) == (3, 13.0)


def test_rolling_repartition_invariance(spark):
    rows = [
        (u, _ts(m * 11, (m * 7) % 60), float((m * 13 + u) % 40) / 4)
        for u in range(3)
        for m in range(50)
    ]
    def run(n):
        return sorted(
            (r["user_id"], r["ts"], r["n_win"], r["sum_win"], r["min_win"])
            for r in rolling_stats(_ev(spark, rows, n), window_seconds=900).collect()
        )
    assert run(2) == run(17)


def test_validation(spark):
    df = _ev(spark, [(1, _ts(0), 1.0)])
    with pytest.raises(ValueError):
        resample_fill(df, step_seconds=0)
    with pytest.raises(ValueError):
        rolling_stats(df, window_seconds=-1)
    with pytest.raises(ValueError):
        rolling_stats(df, scale=0)


def test_ewma_matches_reference(spark):
    from open_vector_tile_spark.operators.events import ewma

    rng = np.random.default_rng(101)
    rows = [
        (
            int(rng.integers(0, 4)),
            _ts(int(rng.integers(0, 500)), int(rng.integers(0, 60))),
            float(np.round(rng.uniform(-3, 9), 2)),
        )
        for _ in range(250)
    ]
    got = {
        (r["user_id"], r["ts_us"], r["value"]): r["ewma"]
        for r in ewma(_ev(spark, rows, 7), alpha=0.3).collect()
    }
    per = {}
    for u, ts, v in rows:
        us = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        per.setdefault(u, []).append((us, v))
    n_checked = 0
    for u, evs in per.items():
        evs.sort()
        s = None
        for us, v in evs:
            s = v if s is None else 0.3 * v + 0.7 * s
            assert got[(u, us, v)] == s, (u, us, v)  # bit-exact
            n_checked += 1
    assert n_checked == len(rows)


def test_ewma_single_event_and_alpha_one(spark):
    from open_vector_tile_spark.operators.events import ewma

    rows = [(1, _ts(0), 5.0), (1, _ts(10), 7.0)]
    got = sorted(
        (r["ts_us"], r["ewma"]) for r in ewma(_ev(spark, rows), alpha=1.0).collect()
    )
    assert [v for _, v in got] == [5.0, 7.0]  # alpha=1: no smoothing
    with pytest.raises(ValueError):
        ewma(_ev(spark, rows), alpha=0.0)


def test_cusum_matches_reference_and_detects_shift(spark):
    from open_vector_tile_spark.operators.events import cusum

    rng = np.random.default_rng(113)
    rows = []
    for u in range(3):
        for i in range(60):
            # level shift of +4 halfway through for user 1
            base = 10.0 + (4.0 if (u == 1 and i >= 30) else 0.0)
            rows.append(
                (u, _ts(i * 5), float(np.round(base + rng.uniform(-1, 1), 2)))
            )
    got = {
        (r["user_id"], r["ts_us"]): (r["cusum_hi"], r["cusum_lo"], r["alarm"])
        for r in cusum(_ev(spark, rows, 7), slack=1.0, threshold=5.0).collect()
    }
    # python reference (exact-tick mean, same chains)
    per = {}
    for u, ts, v in rows:
        us = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        per.setdefault(u, []).append((us, v))
    for u, evs in per.items():
        evs.sort()
        mu = sum(round(v * 100) for _, v in evs) / 100.0 / len(evs)
        hi = lo = 0.0
        for us, v in evs:
            hi = max(0.0, hi + (v - mu - 1.0))
            lo = max(0.0, lo + (mu - v - 1.0))
            g = got[(u, us)]
            assert g[0] == hi and g[1] == lo, (u, us)  # bit-exact
            assert g[2] == (hi > 5.0 or lo > 5.0)
    # the shifted user alarms, the stable users never do
    assert any(a for (u, _), (_, _, a) in got.items() if u == 1)
    assert not any(a for (u, _), (_, _, a) in got.items() if u != 1)


def test_cusum_validation(spark):
    from open_vector_tile_spark.operators.events import cusum

    df = _ev(spark, [(1, _ts(0), 1.0)])
    with pytest.raises(ValueError):
        cusum(df, threshold=0)
    with pytest.raises(ValueError):
        cusum(df, scale=0)

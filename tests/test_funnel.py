"""Funnel automaton: python-reference parity, tie/anchor semantics, depth
edges, repartition invariance."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.events import funnel

T0 = dt.datetime(2024, 1, 1)
EPOCH = dt.datetime(1970, 1, 1)


def _ts(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


def _us(t):
    return (t - EPOCH) // dt.timedelta(microseconds=1)


def _ref(rows, steps):
    per_key = {}
    sidx = {s: i for i, s in enumerate(steps)}
    for u, ts, typ in rows:
        if typ in sidx:
            per_key.setdefault(u, []).append((_us(ts), sidx[typ]))
    out = {}
    for u, evs in per_key.items():
        evs.sort()
        nxt, hits = 0, []
        for ts, i in evs:
            if i == nxt and (nxt == 0 or ts >= hits[-1]):
                nxt += 1
                hits.append(ts)
        hits += [None] * (len(steps) - len(hits))
        out[u] = (nxt, *hits)
    return out


def _run(spark, rows, steps, npart=None):
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    if npart:
        df = df.repartition(npart)
    res = funnel(df, steps).collect()
    return {
        r["user_id"]: tuple([r["depth"]] + [r[f"ts{i+1}_us"] for i in range(len(steps))])
        for r in res
    }


STEPS = ["view", "click", "purchase"]


def test_simple_conversion(spark):
    rows = [
        (1, _ts(0), "view"),
        (1, _ts(10), "click"),
        (1, _ts(20), "purchase"),
        (2, _ts(0), "view"),
        (2, _ts(5), "purchase"),  # skips click: depth 1
    ]
    got = _run(spark, rows, STEPS)
    assert got[1] == (3, _us(_ts(0)), _us(_ts(10)), _us(_ts(20)))
    assert got[2] == (1, _us(_ts(0)), None, None)


def test_out_of_order_step_ignored_and_greedy_anchor(spark):
    rows = [
        (1, _ts(0), "click"),     # before any view: ignored
        (1, _ts(5), "view"),
        (1, _ts(3), "purchase"),  # before view: ignored
        (1, _ts(9), "click"),
        # greedy anchor: view at 5 is the anchor even though a later view
        # (at 8) would also work
        (1, _ts(8), "view"),
        (1, _ts(12), "purchase"),
    ]
    got = _run(spark, rows, STEPS)
    assert got[1] == (3, _us(_ts(5)), _us(_ts(9)), _us(_ts(12)))


def test_same_timestamp_tie_counts_in_step_order(spark):
    t = _ts(7)
    rows = [(1, t, "view"), (1, t, "click"), (1, t, "purchase")]
    got = _run(spark, rows, STEPS)
    assert got[1] == (3, _us(t), _us(t), _us(t))


def test_depth_zero_and_absent_users(spark):
    rows = [
        (1, _ts(0), "click"),  # funnel-relevant but never step 1
        (2, _ts(0), "error"),  # not funnel-relevant at all
    ]
    got = _run(spark, rows, STEPS)
    assert got[1] == (0, None, None, None)
    assert 2 not in got


def test_matches_reference_randomized(spark):
    rng = np.random.default_rng(61)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for _ in range(600):
        rows.append(
            (
                int(rng.integers(0, 25)),
                _ts(int(rng.integers(0, 5000)), int(rng.integers(0, 3))),
                str(rng.choice(types)),
            )
        )
    got = _run(spark, rows, STEPS, npart=9)
    assert got == _ref(rows, STEPS)


def test_repartition_invariance(spark):
    rows = [
        (u, _ts((u * 7 + i * 13) % 400, i), ["view", "click", "purchase"][i % 3])
        for u in range(6)
        for i in range(30)
    ]
    assert _run(spark, rows, STEPS, 2) == _run(spark, rows, STEPS, 17)


def test_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), "view")], ["user_id", "ts", "event_type"])
    with pytest.raises(ValueError):
        funnel(df, [])

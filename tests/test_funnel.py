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


def test_cohort_retention_basic(spark):
    from open_vector_tile_spark.operators.events import cohort_retention

    rows = [
        (1, _ts(0), "view"),            # cohort p0
        (1, _ts(7 * 86400 + 5), "view"),  # active p1
        (2, _ts(10), "click"),          # cohort p0, only p0
        (3, _ts(7 * 86400 + 9), "view"),  # cohort p1
        (3, _ts(21 * 86400), "view"),   # active p3 -> offset 2
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        (r["cohort_p"], r["offset"]): (r["n_active"], r["cohort_size"])
        for r in cohort_retention(df).collect()
    }
    p0 = _us(_ts(0)) // (7 * 86400 * 1_000_000)
    assert got[(p0, 0)] == (2, 2)
    assert got[(p0, 1)] == (1, 2)
    assert got[(p0 + 1, 0)] == (1, 1)
    assert got[(p0 + 1, 2)] == (1, 1)
    assert (p0, 2) not in got


def test_cohort_retention_reference_randomized(spark):
    from open_vector_tile_spark.operators.events import cohort_retention

    rng = np.random.default_rng(71)
    rows = [
        (int(rng.integers(0, 12)), _ts(int(rng.integers(0, 40 * 86400))), "x")
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).repartition(7)
    got = {
        (r["cohort_p"], r["offset"]): (r["n_active"], r["cohort_size"])
        for r in cohort_retention(df).collect()
    }
    # reference
    per = {}
    for u, ts, _ in rows:
        per.setdefault(u, set()).add(_us(ts) // (7 * 86400 * 1_000_000))
    ref = {}
    sizes = {}
    for u, ps in per.items():
        c = min(ps)
        sizes[c] = sizes.get(c, 0) + 1
    for u, ps in per.items():
        c = min(ps)
        for p in ps:
            k = (c, p - c)
            ref[k] = ref.get(k, (0,))[0] + 1, 0
    ref = {k: (n, sizes[k[0]]) for k, (n, _) in ref.items()}
    assert got == ref


def test_event_transitions(spark):
    from open_vector_tile_spark.operators.events import event_transitions

    rows = [
        (1, 1, _ts(0), "view"),
        (1, 2, _ts(1), "click"),
        (1, 3, _ts(2), "view"),
        (2, 4, _ts(0), "view"),
        (2, 5, _ts(1), "click"),
        (3, 6, _ts(0), "error"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {
        (r["src_type"], r["dst_type"]): r["n"]
        for r in event_transitions(df).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_event_transitions_tie_order_deterministic(spark):
    from open_vector_tile_spark.operators.events import event_transitions

    t = _ts(5)
    rows = [(1, 10, t, "a"), (1, 11, t, "b"), (1, 12, t, "c")]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {
        (r["src_type"], r["dst_type"]): r["n"]
        for r in event_transitions(df).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_cohort_validation(spark):
    from open_vector_tile_spark.operators.events import cohort_retention

    df = spark.createDataFrame([(1, _ts(0), "x")], ["user_id", "ts", "event_type"])
    with pytest.raises(ValueError):
        cohort_retention(df, period_seconds=0)


def test_event_paths_trigrams(spark):
    from open_vector_tile_spark.operators.events import event_paths
    import pytest as _pt

    rows = [
        (1, 1, _ts(0), "a"), (1, 2, _ts(1), "b"), (1, 3, _ts(2), "c"),
        (1, 4, _ts(3), "a"),
        (2, 5, _ts(0), "a"), (2, 6, _ts(1), "b"),  # too short for n=3
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {r["path"]: r["cnt"] for r in event_paths(df, n=3).collect()}
    assert got == {"a>b>c": 1, "b>c>a": 1}
    got2 = {r["path"]: r["cnt"] for r in event_paths(df, n=2).collect()}
    assert got2 == {"a>b": 2, "b>c": 1, "c>a": 1}
    with _pt.raises(ValueError):
        event_paths(df, n=1)


def test_funnel_repeated_steps_rejected(spark):
    """A repeated step type can never advance past the repeat (the when-chain
    maps each type to its FIRST index), so it must fail loudly."""
    df = spark.createDataFrame([(1, _ts(0), "view")], ["user_id", "ts", "event_type"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, ["view", "click", "view"])


def test_event_paths_null_types_dropped(spark):
    """concat_ws skips NULLs: without the up-front filter a (a, NULL, c)
    run would emit 'a>c' and be indistinguishable from a real 2-step path."""
    from open_vector_tile_spark.operators.events import event_paths

    rows = [
        (1, 1, _ts(0), "a"), (1, 2, _ts(1), None), (1, 3, _ts(2), "c"),
        (2, 4, _ts(0), "a"), (2, 5, _ts(1), "c"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {r["path"]: r["cnt"] for r in event_paths(df, n=2).collect()}
    # user 1's null row contributes no path; only user 2's real a>c and
    # user 1's a..c-with-null-removed (a>c after the drop) remain
    assert got == {"a>c": 2}

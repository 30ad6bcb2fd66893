"""Sparse all-pairs cosine join vs a bit-exact python reference."""

from __future__ import annotations

import math
import random
import re

import pytest

from open_vector_tile_spark.operators.similarity import sparse_cosine_pairs

WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_pairs(rows, df_cap=100, min_cos=0.5):
    toks = {i: [t for t in WS.split(txt.lower()) if t] for i, txt in rows}
    tf: dict[tuple, float] = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0.0) + 1.0
    df: dict[str, int] = {}
    for (_i, t) in tf:
        df[t] = df.get(t, 0) + 1
    kept = {t for t, d in df.items() if 2 <= d <= df_cap}
    w = {(i, t): v / df[t] for (i, t), v in tf.items() if t in kept}

    def fold(vals):
        acc = 0.0
        for v in sorted(vals):
            acc = acc + v
        return acc

    norms = {}
    for i in toks:
        sq = [w[(i, t)] * w[(i, t)] for t in set(t for (j, t) in w if j == i)]
        n = math.sqrt(fold(sq))
        if n > 0:
            norms[i] = n
    out = {}
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if a not in norms or b not in norms:
                continue
            shared = [t for t in kept if (a, t) in w and (b, t) in w]
            if not shared:
                continue
            dot = fold([w[(a, t)] * w[(b, t)] for t in shared])
            cos = dot / (norms[a] * norms[b])
            if cos >= min_cos:
                out[(a, b)] = cos
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sparse_cosine_pairs(df, **kw).collect()
    return {(r.doc_a, r.doc_b): r.cos for r in got}


def test_known_duplicates(spark):
    rows = [
        (1, "quick brown fox jumps"),
        (2, "quick brown fox jumps"),
        (3, "completely different words entirely"),
        (4, "quick brown fox leaps"),
    ]
    got = _run(spark, rows, min_cos=0.3)
    want = _py_pairs(rows, min_cos=0.3)
    assert got == want
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got


def test_df_cap_drops_stopwordish_terms(spark):
    # 'the' appears in every doc; with df_cap=3 it contributes nothing
    rows = [(i, f"the tok{i % 2}") for i in range(1, 7)]
    got = _run(spark, rows, df_cap=3, min_cos=0.1)
    want = _py_pairs(rows, df_cap=3, min_cos=0.1)
    assert got == want
    for (a, b), c in got.items():
        assert a % 2 == b % 2 and c == 1.0


def test_randomized_bit_exact_parity(spark):
    rng = random.Random(20260819)
    vocab = [f"w{k}" for k in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25))))
        for i in range(50)
    ]
    for kw in ({"min_cos": 0.2}, {"min_cos": 0.6, "df_cap": 10}):
        got = _run(spark, rows, **kw)
        want = _py_pairs(rows, **kw)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])  # bit-exact


def test_partitioning_invariance_and_validation(spark):
    rows = [(i, f"alpha beta w{i % 3} gamma") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, sparse_cosine_pairs(df.coalesce(1)).collect()))
    many = sorted(map(tuple, sparse_cosine_pairs(df.repartition(7)).collect()))
    assert one == many
    with pytest.raises(ValueError):
        sparse_cosine_pairs(df, df_cap=1)

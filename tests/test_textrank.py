"""TextRank keywords: bit-exact parity with a scalar reference, graph
semantics (bridge words outrank repeated-phrase words), degenerate docs,
partition invariance."""

import re

import numpy as np
import pytest

from open_vector_tile_spark.operators.retrieval import textrank_keywords


def _ref_scores(text, damping=0.85, n_iter=4):
    """Scalar TextRank with the SAME fixed float chain (sorted-fold sums)."""
    words = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    nodes = sorted(set(words))
    edges = set()
    for a, b in zip(words, words[1:]):
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    score = {v: 1.0 for v in nodes}
    base = 1.0 - damping
    for _ in range(n_iter):
        contrib = {}
        for s, t in edges:
            contrib.setdefault(t, []).append(score[s] / float(deg[s]))
        new = {}
        for v in nodes:
            acc = 0.0
            for c in sorted(contrib.get(v, [])):
                acc = acc + c
            new[v] = base + damping * acc
        score = new
    return score


def _run(spark, texts, k=50, **kw):
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = textrank_keywords(df, k=k, deterministic=True, **kw).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], {})[r["term"]] = (r["score"], r["rank"])
    return out


_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def test_textrank_matches_reference_bit_exact(spark):
    rng = np.random.default_rng(13)
    texts = {
        i: " ".join(rng.choice(_WORDS, size=int(rng.integers(1, 40))))
        for i in range(25)
    }
    got = _run(spark, texts)
    for i, t in texts.items():
        want = _ref_scores(t)
        got_scores = {w: s for w, (s, _) in got[i].items()}
        assert got_scores == want, i  # doubles bit-equal


def test_textrank_bridge_word_beats_repeated_phrase(spark):
    # 'hub' co-occurs with every other word; 'spam' repeats in one context
    text = (
        "hub alpha hub beta hub gamma hub delta "
        "spam eggs spam eggs spam eggs spam eggs"
    )
    got = _run(spark, {1: text})[1]
    assert got["hub"][1] == 1  # top keyword by graph centrality
    assert got["hub"][0] > got["spam"][0]


def test_textrank_isolated_and_single_word_docs(spark):
    got = _run(spark, {1: "lonely", 2: "a b"})
    assert got[1]["lonely"][0] == pytest.approx(0.15)  # 1-d fixed point
    # two-word doc: symmetric graph, both converge to 1.0
    assert got[2]["a"][0] == 1.0 and got[2]["b"][0] == 1.0
    # rank tie broken on term
    assert got[2]["a"][1] == 1 and got[2]["b"][1] == 2


def test_textrank_top_k_cut(spark):
    text = " ".join(f"w{i}" for i in range(20))
    got = _run(spark, {1: text}, k=3)
    assert len(got[1]) == 3
    assert sorted(r for _, r in got[1].values()) == [1, 2, 3]


def test_textrank_validation(spark):
    df_args = {1: "a b c"}
    with pytest.raises(ValueError):
        _run(spark, df_args, damping=1.0)
    with pytest.raises(ValueError):
        _run(spark, df_args, n_iter=0)


@pytest.mark.slow
def test_textrank_repartition_invariant(spark):
    rng = np.random.default_rng(19)
    texts = {
        i: " ".join(rng.choice(_WORDS, size=20)) for i in range(12)
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    a = sorted(
        map(tuple, textrank_keywords(df, k=4, deterministic=True).collect())
    )
    b = sorted(
        map(
            tuple,
            textrank_keywords(
                df.repartition(7, "text"), k=4, deterministic=True
            ).collect(),
        )
    )
    assert a == b

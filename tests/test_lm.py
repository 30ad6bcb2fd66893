"""Bigram LM + Stupid Backoff perplexity scoring (operators/lm.py)."""

import math
import random

import pytest

from open_vector_tile_spark.operators.lm import perplexity_score, train_bigram_lm

ALPHA = 0.4


def _py_score(train_texts, score_rows, alpha=ALPHA):
    """Scalar reference: returns {doc_id: (n_bigrams, avg_nll|None)}."""
    uni, big = {}, {}
    n_tokens = 0
    for t in train_texts:
        ts = [w for w in t.lower().split() if w]
        n_tokens += len(ts)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for doc_id, t in score_rows:
        ts = [w for w in t.lower().split() if w]
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out[doc_id] = (0, None)
            continue
        ll = 0.0
        for a, b in pairs:
            if (a, b) in big:
                s = big[(a, b)] / uni[a]
            else:
                s = alpha * (uni.get(b, 1) / n_tokens)
            ll += math.log(s)
        out[doc_id] = (len(pairs), -ll / len(pairs))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_corpus(spark):
    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    score = [
        (1, "the cat sat"),          # all bigrams seen
        (2, "the zebra sat"),        # unseen bigrams, one OOV unigram
        (3, "cat"),                  # 1 token -> no bigrams
        (4, ""),                     # empty
    ]
    tdf = _docs(spark, [(i, t) for i, t in enumerate(train)])
    sdf = _docs(spark, score)
    model = train_bigram_lm(tdf)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in perplexity_score(sdf, model).collect()
    }
    want = _py_score(train, score)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        if want[k][1] is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    # sanity: in-distribution text scores better than unseen text
    assert got[1][1] < got[2][1]


def test_backoff_branches(spark):
    """Exercise all three branches: seen bigram / unseen bigram + seen
    unigram / OOV unigram floor."""
    train = ["x y x y"]
    score = [(1, "x y"), (2, "y y"), (3, "x q")]
    tdf = _docs(spark, [(0, train[0])])
    sdf = _docs(spark, score)
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in perplexity_score(sdf, train_bigram_lm(tdf)).collect()
    }
    n = 4  # train tokens
    assert got[1] == pytest.approx(-math.log(2 / 2), rel=1e-12)  # x->y seen: 2/2
    assert got[2] == pytest.approx(-math.log(ALPHA * 2 / n), rel=1e-12)
    assert got[3] == pytest.approx(-math.log(ALPHA * 1 / n), rel=1e-12)  # OOV q


def test_randomized_parity_and_determinism(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda lo, hi: " ".join(
        rng.choice(vocab) for _ in range(rng.randint(lo, hi))
    )
    rows = [(i, mk(0, 40)) for i in range(120)]
    train_rows = [(i, t) for i, t in rows if i % 2 == 0]
    tdf = _docs(spark, train_rows)
    sdf = _docs(spark, rows)
    model = train_bigram_lm(tdf)
    out = perplexity_score(sdf, model)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"]) for r in out.collect()}
    want = _py_score([t for _, t in train_rows], rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        if want[k][1] is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    # bit-stable across partitionings (sorted fold pins the add order)
    got2 = {
        r["doc_id"]: r["avg_nll"]
        for r in perplexity_score(sdf.repartition(7), model).collect()
    }
    for k in got:
        assert got2[k] == got[k][1] or (got2[k] is None and got[k][1] is None)


def test_alpha_validation(spark):
    tdf = _docs(spark, [(0, "a b")])
    model = train_bigram_lm(tdf)
    with pytest.raises(ValueError):
        perplexity_score(tdf, model, alpha=0.0)
    with pytest.raises(ValueError):
        perplexity_score(tdf, model, alpha=1.5)


# ---------------------------------------------------------------- phrase search


def _py_phrase(rows, phrase):
    words = phrase.lower().split()
    out = {}
    for doc_id, t in rows:
        ts = [w for w in t.lower().split() if w]
        hits = [
            i
            for i in range(len(ts) - len(words) + 1)
            if ts[i : i + len(words)] == words
        ]
        if hits:
            out[doc_id] = (len(hits), hits[0])
    return out


def test_phrase_search_known(spark):
    from open_vector_tile_spark.operators.retrieval import phrase_search

    rows = [
        (1, "the cat sat on the mat"),
        (2, "THE  CAT\tsat"),              # case + whitespace runs
        (3, "cat the sat"),                # words present, order wrong
        (4, "the cat the cat sat"),        # second occurrence only
        (5, "la la la"),                   # overlapping matches
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for phrase in ("the cat sat", "la la", "cat"):
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }
        assert got == _py_phrase(rows, phrase), phrase


def test_phrase_search_randomized_and_prebuilt_index(spark):
    import random

    from open_vector_tile_spark.operators.retrieval import (
        build_positional_postings,
        phrase_search,
    )

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_positional_postings(df).localCheckpoint()
    for phrase in ("a b", "b b b", "c a d", "a"):
        want = _py_phrase(rows, phrase)
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }
        assert got == want, phrase
        got_idx = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase, positions=idx).collect()
        }
        assert got_idx == want, phrase


def test_phrase_search_validation(spark):
    from open_vector_tile_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(df, "   ")
    with pytest.raises(ValueError):
        phrase_search(df, [])
    with pytest.raises(ValueError):
        phrase_search(df, ["a", ""])


def test_empty_training_slice_raises(spark):
    tdf = _docs(spark, [(0, "   "), (1, "")])
    with pytest.raises(ValueError, match="no tokens"):
        train_bigram_lm(tdf)


def test_phrase_list_whitespace_rejected(spark):
    from open_vector_tile_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame([(1, "new york")], "doc_id long, text string")
    with pytest.raises(ValueError, match="single words"):
        phrase_search(df, ["new york"])

"""Shingle-containment dedup: brute-force parity, asymmetric detection of
sub-documents Jaccard misses, df-cap lower-bound behavior."""

import numpy as np
import pytest

from open_vector_tile_spark.operators.dedup import containment_pairs


def _shingle_set(text, n=3):
    import re

    w = re.split(r"\s+", text.strip().lower()) if text.strip() else []
    if not w:
        return set()
    if len(w) <= n:
        return {" ".join(w)} - {""}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} - {""}


def _brute(texts, threshold, n=3):
    sets = {i: _shingle_set(t, n) for i, t in texts.items() if _shingle_set(t, n)}
    out = {}
    ids = sorted(sets)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            inter = len(sets[ia] & sets[ib])
            if inter == 0:
                continue
            c_ab = inter / len(sets[ia])
            c_ba = inter / len(sets[ib])
            if max(c_ab, c_ba) >= threshold:
                out[(ia, ib)] = (inter, len(sets[ia]), len(sets[ib]))
    return out


def _run(spark, texts, threshold, **kw):
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = containment_pairs(df, threshold=threshold, **kw).collect()
    return {(r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"]) for r in rows}


_WORDS = "the quick brown fox jumps over a lazy dog near riverbank stone".split()


def test_containment_matches_bruteforce_randomized(spark):
    rng = np.random.default_rng(31)
    texts = {
        i: " ".join(rng.choice(_WORDS, size=int(rng.integers(2, 30))))
        for i in range(40)
    }
    # plant sub-documents: doc 100+i is a verbatim slice of doc i
    for i in range(5):
        w = texts[i].split()
        texts[100 + i] = " ".join(w[: max(4, len(w) // 2)])
    for thr in (0.5, 0.8, 1.0):
        assert _run(spark, texts, thr) == _brute(texts, thr)


def test_containment_catches_what_jaccard_misses(spark):
    body = " ".join(f"w{i}" for i in range(200))
    snippet = " ".join(f"w{i}" for i in range(10))  # 5% of the body
    got = _run(spark, {1: body, 2: snippet}, 0.95)
    inter, size_a, size_b = got[(1, 2)]
    assert inter == size_b  # snippet fully contained
    jaccard = inter / (size_a + size_b - inter)
    assert jaccard < 0.05  # jaccard-threshold dedup would never pair these


def test_containment_empty_and_no_overlap(spark):
    got = _run(spark, {1: "alpha beta gamma", 2: "   ", 3: "delta epsilon zeta"}, 0.1)
    assert got == {}


def test_containment_df_cap_is_lower_bound(spark):
    texts = {i: "common phrase here plus unique" + str(i) for i in range(10)}
    full = _run(spark, texts, 0.3)
    capped = _run(spark, texts, 0.3, max_df=3)
    assert set(capped) <= set(full)  # cap only removes evidence, never adds


def test_containment_threshold_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, {1: "a b c d"}, 0.0)


def test_containment_repartition_invariant(spark):
    rng = np.random.default_rng(41)
    texts = {
        i: " ".join(rng.choice(_WORDS, size=12)) for i in range(30)
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    a = sorted(map(tuple, containment_pairs(df, threshold=0.4).collect()))
    b = sorted(
        map(
            tuple,
            containment_pairs(df.repartition(11, "text"), threshold=0.4).collect(),
        )
    )
    assert a == b

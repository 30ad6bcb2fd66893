"""duplicate_spans (operators/dedup.py): window-fingerprint rendering of
Lee et al.'s ExactSubstr dedup.  Brute-force python oracle: count every
W-token window by its TOKEN TUPLE (no hashing), mark positions whose
window occurs >= min_count times, merge overlapping/adjacent positions.
"""

from collections import Counter

import pytest

from open_vector_tile_spark.operators.dedup import duplicate_spans


def _py_spans(texts: dict, window: int, min_count: int = 2):
    toks = {i: t.split() for i, t in texts.items()}
    counts = Counter()
    for ts in toks.values():
        for p in range(len(ts) - window + 1):
            counts[tuple(ts[p : p + window])] += 1
    out = {}
    for i, ts in toks.items():
        pos = [
            p
            for p in range(len(ts) - window + 1)
            if counts[tuple(ts[p : p + window])] >= min_count
        ]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1]:  # overlap/adjacent -> extend
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + window))
            else:
                spans.append((p, p + window))
        for s, e in spans:
            out[(i, s)] = (e, len(ts))
    return out


def _run(spark, texts, window, min_count=2):
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = duplicate_spans(df, window=window, min_count=min_count).collect()
    got = {}
    for r in rows:
        got[(r["doc_id"], r["span_start"])] = (r["span_end"], r["n_tokens"])
        assert r["span_tokens"] == r["span_end"] - r["span_start"]
    return got


def test_cross_doc_planted_passage(spark):
    passage = " ".join(f"q{i}" for i in range(12))
    texts = {
        0: "a0 a1 a2 a3 " + passage + " z0 z1",
        1: "b0 b1 " + passage + " y0 y1 y2 y3",
        2: "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12",  # clean
    }
    got = _run(spark, texts, window=8)
    assert got == _py_spans(texts, 8)
    # doc 0: passage tokens are [4, 16) -> 5 duplicate windows merge to one span
    assert got[(0, 4)] == (16, 18)
    assert got[(1, 2)] == (14, 18)
    assert not any(d == 2 for d, _ in got)


def test_within_doc_repetition_counts(spark):
    rep = " ".join(f"r{i}" for i in range(9))
    texts = {7: rep + " mid0 mid1 " + rep}
    got = _run(spark, texts, window=9)
    assert got == _py_spans(texts, 9)
    assert set(got) == {(7, 0), (7, 11)}


def test_short_docs_and_window_boundary(spark):
    texts = {
        0: "x0 x1 x2",        # shorter than window: no grams, no spans
        1: "x0 x1 x2",
        2: "s0 s1 s2 s3",     # exactly window: one gram
        3: "s0 s1 s2 s3",
    }
    got = _run(spark, texts, window=4)
    assert got == _py_spans(texts, 4)
    assert set(got) == {(2, 0), (3, 0)}
    assert got[(2, 0)] == (4, 4)


def test_randomized_parity_and_min_count(spark):
    import random

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    shared = [" ".join(rng.choice(vocab) for _ in range(15)) for _ in range(3)]
    texts = {}
    for d in range(25):
        words = [rng.choice(vocab) for _ in range(rng.randrange(5, 60))]
        if d % 3 == 0:
            ins = rng.randrange(0, len(words))
            words[ins:ins] = shared[d % len(shared)].split()
        texts[d] = " ".join(words)
    for mc in (2, 3):
        assert _run(spark, texts, window=10, min_count=mc) == _py_spans(
            texts, 10, mc
        ), f"min_count={mc}"


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_spans(df, window=1)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)


# ---------------------------------------------------------------------------
# cdc_chunks


def _py_cdc(texts: dict, boundary_hex: int):
    import hashlib

    thr = format(boundary_hex, "02x")
    out = {}
    for i, t in texts.items():
        words = t.split()
        chunks, cur = [], []
        for w in words:
            cur.append(w)
            if hashlib.md5(w.encode()).hexdigest()[:2] < thr:
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        for ci, ws in enumerate(chunks):
            joined = " ".join(ws)
            out[(i, ci)] = (
                len(ws),
                hashlib.md5(joined.encode()).hexdigest(),
            )
    return out


def test_cdc_matches_python_reference_and_is_content_defined(spark):
    import random

    from open_vector_tile_spark.operators.dedup import cdc_chunks

    rng = random.Random(9)
    vocab = [f"tok{i}" for i in range(200)]
    base = [rng.choice(vocab) for _ in range(300)]
    edited = list(base)
    edited[150:150] = ["INSERTED", "WORDS"]  # one edit mid-document
    texts = {0: " ".join(base), 1: " ".join(edited)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = cdc_chunks(df, boundary_hex=16).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_words"], r["chunk_hash"]) for r in rows}
    assert got == _py_cdc(texts, 16)
    # content-defined property: all chunks except the edited one dedup
    h0 = {v[1] for (d, _), v in got.items() if d == 0}
    h1 = {v[1] for (d, _), v in got.items() if d == 1}
    assert len(h0) > 5
    assert len(h0 - h1) <= 1 and len(h1 - h0) <= 2  # only the edit region differs


def test_cdc_trailing_chunk_and_empty(spark):
    from open_vector_tile_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(0, "solo"), (1, None), (2, "  "), (3, "a b")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df, boundary_hex=4, keep_text=True).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # no words -> no chunks
    assert sum(r["n_words"] for r in by_doc[3]) == 2
    text3 = " ".join(
        r["chunk_text"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])
    )
    assert text3 == "a b"  # chunks reassemble the document
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc_chunks(df, boundary_hex=0)

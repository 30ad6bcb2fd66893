"""Bigram collocation mining (operators/collocations.py)."""

from collections import Counter

from open_vector_tile_spark.operators.collocations import bigram_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, min_count, top_k):
    toks = [[t for t in s.lower().split() if t] for s in texts]
    n_total = sum(len(ts) for ts in toks)
    uni = Counter(t for ts in toks for t in ts)
    big = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    rows = [
        # mirror the operator's overflow-free IEEE chain exactly:
        # double(n_ab) * N / n_a / n_b (NOT products-first)
        (a, b, c, uni[a], uni[b], float(c) * n_total / uni[a] / uni[b])
        for (a, b), c in big.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:top_k]


def test_known_corpus(spark):
    texts = [
        "new york is big",
        "new york has new parks",
        "york new city",
        "big parks in new york",
    ]
    out = bigram_collocations(_docs(spark, texts), min_count=3, top_k=10).collect()
    got = [(r.a, r.b, r.n_ab, r.n_a, r.n_b, r.lift) for r in out]
    assert got == _brute(texts, 3, 10)
    assert got[0][:2] == ("new", "york")  # 3 adjacent occurrences


def test_no_cross_document_bigrams(spark):
    # 'alpha' ends doc 0, 'beta' starts doc 1: never a bigram
    out = bigram_collocations(
        _docs(spark, ["x alpha", "beta y"]), min_count=1, top_k=10
    ).collect()
    assert ("alpha", "beta") not in {(r.a, r.b) for r in out}


def test_whitespace_and_short_docs(spark):
    # single-token and empty docs contribute no bigrams; tabs delimit
    texts = ["solo", "", "a\tb a\tb a  b"]
    out = bigram_collocations(_docs(spark, texts), min_count=1, top_k=10).collect()
    got = [(r.a, r.b, r.n_ab, r.n_a, r.n_b, r.lift) for r in out]
    assert got == _brute(texts, 1, 10)


def test_randomized_brute_parity_and_determinism(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, 5, size=int(rng.integers(0, 12))))
        for _ in range(60)
    ]
    df = _docs(spark, texts)
    a = bigram_collocations(df, min_count=2, top_k=15).collect()
    b = bigram_collocations(df.repartition(7), min_count=2, top_k=15).collect()
    got = [(r.a, r.b, r.n_ab, r.n_a, r.n_b, r.lift) for r in a]
    assert got == _brute(texts, 2, 15)
    assert got == [(r.a, r.b, r.n_ab, r.n_a, r.n_b, r.lift) for r in b]


def test_driver_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = entry.queries()["collocations"](spark, sf).toPandas()
    want = con.execute(entry.oracle_sql()["collocations"]).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c

"""DSIR importance selection: bit-exact python parity of the log-free
ratio chain, enrichment behavior, empty docs, partitioning invariance."""

import hashlib
import math
from collections import Counter

import pytest


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n_buckets


def _py_dsir(rows, target_ids, n_buckets, keep_frac, smoothing=1):
    """rows: [(id, text)] -> {id: (score, rank, selected)} via the exact
    IEEE chain the operator fixes: term = double(c)*t*Dr/r/Dt, sorted fold."""
    doc_b = {}
    for i, t in rows:
        grams = [
            f"{a} {b}"
            for a, b in zip(*(lambda ws: (ws, ws[1:]))([w for w in t.lower().split() if w]))
        ]
        doc_b[i] = Counter(_bucket(g, n_buckets) for g in grams)
    raw = Counter()
    tgt = Counter()
    for i, c in doc_b.items():
        raw.update(c)
        if i in target_ids:
            tgt.update(c)
    r_b = {b: raw.get(b, 0) + smoothing for b in range(n_buckets)}
    t_b = {b: tgt.get(b, 0) + smoothing for b in range(n_buckets)}
    d_r = sum(r_b.values())
    d_t = sum(t_b.values())
    scores = {}
    for i, c in doc_b.items():
        terms = sorted(
            float(cb) * t_b[b] * d_r / r_b[b] / d_t for b, cb in c.items()
        )
        acc = 0.0
        for x in terms:
            acc += x
        scores[i] = acc
    order = sorted(scores, key=lambda i: (-scores[i], i))
    n_keep = math.ceil(len(rows) * keep_frac)
    return {
        i: (scores[i], r, r < n_keep) for r, i in enumerate(order)
    }


def _run(spark, rows, target_ids, **kw):
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators.dsir import dsir_select

    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = dsir_select(df, F.col("doc_id").isin(list(target_ids)), **kw)
    return {r["id"]: (r["score"], r["rank"], r["selected"]) for r in out.collect()}


class TestDsir:
    def test_python_parity_bit_exact(self, spark):
        rows = [
            (0, "spark shuffle join agg window"),
            (1, "cat dog cat dog bird"),
            (2, "spark join spark join spark"),
            (3, "dog bird dog bird"),
            (4, "spark window agg"),
            (5, "lonely"),            # no bigrams -> 0.0
            (6, ""),                  # empty -> 0.0
        ]
        target = {0, 2}
        got = _run(spark, rows, target, n_buckets=32, keep_frac=0.4)
        want = _py_dsir(rows, target, 32, 0.4)
        assert got == want

    def test_enrichment_selects_target_like_docs(self, spark):
        # docs 0-4 share the target vocabulary; 5-9 are off-domain
        rows = [(i, "alpha beta gamma delta " * 3) for i in range(5)] + [
            (i, "zog qux mumble frotz " * 3) for i in range(5, 10)
        ]
        got = _run(spark, rows, {0, 1}, n_buckets=64, keep_frac=0.5)
        selected = {i for i, (_, _, s) in got.items() if s}
        assert selected == {0, 1, 2, 3, 4}

    def test_repartition_invariance(self, spark):
        rows = [(i, f"w{i % 4} w{(i + 1) % 5} w{(i + 2) % 3} common tail")
                for i in range(40)]
        target = set(range(0, 40, 7))
        a = _run(spark, rows, target, n_buckets=16, keep_frac=0.3)
        from pyspark.sql import functions as F

        from open_vector_tile_spark.operators.dsir import dsir_select

        df = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(13)
        out = dsir_select(
            df, F.col("doc_id").isin(list(target)), n_buckets=16, keep_frac=0.3
        )
        b = {r["id"]: (r["score"], r["rank"], r["selected"]) for r in out.collect()}
        assert a == b == _py_dsir(rows, target, 16, 0.3)

    def test_keep_frac_one_keeps_all(self, spark):
        rows = [(i, "a b c") for i in range(5)]
        got = _run(spark, rows, {0}, n_buckets=8, keep_frac=1.0)
        assert all(s for _, _, s in got.values())

    def test_validation(self, spark):
        from pyspark.sql import functions as F

        from open_vector_tile_spark.operators.dsir import dsir_select

        df = spark.createDataFrame([(1, "x y")], "doc_id LONG, text STRING")
        for kw in ({"keep_frac": 0.0}, {"n_buckets": 0}, {"smoothing": 0}):
            with pytest.raises(ValueError):
                dsir_select(df, F.lit(True), **kw)

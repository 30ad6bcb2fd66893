"""connected_components / dedup_components vs a pure-python union-find."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.graph import connected_components, dedup_components


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)

    def comp(self, x):
        # min-id labeling: union() always parents the larger root under the
        # smaller, so every root IS the component minimum.
        return self.find(x)


def _check(spark, edges):
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    want = {x: uf.comp(x) for x in uf.p}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want


def test_cc_chain_star_and_singleton_edge(spark):
    edges = (
        [(i, i + 1) for i in range(0, 40)]          # one long chain (diameter 40)
        + [(100, j) for j in range(101, 110)]       # star
        + [(200, 201)]                              # pair
        + [(300, 300)]                              # self-loop only -> singleton
    )
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    # self-loop node is dropped by a != b but must not crash; other nodes exact
    for x, w in ((0, 0), (40, 0), (105, 100), (201, 200)):
        assert out[x] == w
    assert 300 not in out  # pure self-loop: no symmetric edge survives


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (5, 4), (4, 5)]
    _check(spark, edges)


def test_dedup_components_on_minhash_pairs(spark):
    """End-to-end: minhash near-dup pairs -> clusters -> canonical keeps.

    Verified-Jaccard threshold makes the pair set deterministic; clusters
    checked against union-find over the same pairs.
    """
    from open_vector_tile_spark.operators.dedup import minhash_dedup

    docs_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_dedup(docs_df, threshold=0.5)
    plist = [(r["id_a"], r["id_b"]) for r in pairs.select("id_a", "id_b").collect()]
    out = dedup_components(docs_df, pairs).collect()

    uf = _UF()
    for a, b in plist:
        uf.union(a, b)
    n_docs = docs_df.count()
    comp_of = {}
    for r in out:
        comp_of[r["doc_id"]] = r["component"]
    assert len(comp_of) == n_docs
    from collections import Counter

    sizes = Counter(comp_of.values())
    for r in out:
        want = uf.comp(r["doc_id"]) if r["doc_id"] in uf.p else r["doc_id"]
        assert r["component"] == want
        assert r["comp_size"] == sizes[r["component"]]
    # canonical-keep filter drops exactly (cluster_size - 1) docs per cluster
    kept = [r for r in out if r["component"] == r["doc_id"]]
    assert len(kept) == len(sizes)


def test_cc_max_rounds_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(0, 64)], "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=1)


def test_dedup_components_rejects_string_ids(spark):
    docs = spark.createDataFrame([("doc-1",), ("doc-2",)], "doc_id string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(TypeError, match="integral ids"):
        dedup_components(docs, pairs)
    # integral frame + string pair column is equally rejected
    docs_i = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs_s = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(TypeError, match="integral ids"):
        dedup_components(docs_i, pairs_s)


def test_cc_releases_per_round_checkpoints(spark):
    """A long chain runs several rounds; superseded per-round label
    checkpoints must be unpersisted or executor storage grows O(rounds)."""
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200)], "src long, dst long"
    )
    labels = connected_components(df)
    assert labels.filter(F.col("comp") != 0).count() == 0
    after = sc._jsc.sc().getPersistentRDDs().size()
    # only the RETURNED label table may remain pinned (plus whatever was
    # pinned before the call) — no per-round accumulation, no edge table
    assert after - before <= 1, f"leaked {after - before} pinned RDDs"

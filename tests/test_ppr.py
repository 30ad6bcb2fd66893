"""Personalized PageRank / TrustRank: bit-exact scalar parity, seed-locality
semantics, unreachable-node zeroing, mass conservation, invariance."""

import numpy as np
import pytest

from open_vector_tile_spark.operators.graph import personalized_pagerank


def _ref(edges, seeds, damping=0.85, n_iter=5):
    """Scalar reference with the same sorted-fold float chains."""
    es = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({n for e in es for n in e} | set(seeds))
    deg = {n: sum(1 for s, _ in es if s == n) for n in nodes}
    sv = 1.0 / float(len(set(seeds)))
    v = {n: (sv if n in set(seeds) else 0.0) for n in nodes}
    rank = dict(v)
    base = 1.0 - damping
    for _ in range(n_iter):
        contrib = {}
        for s, t in es:
            contrib.setdefault(t, []).append(rank[s] / float(deg[s]))
        dm = 0.0
        for r in sorted(rank[n] for n in nodes if deg[n] == 0):
            dm += r
        new = {}
        for n in nodes:
            acc = 0.0
            for c in sorted(contrib.get(n, [])):
                acc += c
            new[n] = base * v[n] + damping * (acc + dm * v[n])
        rank = new
    return rank


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(list(edges), ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["id"])
    rows = personalized_pagerank(e, s, deterministic=True, **kw).collect()
    return {r["id"]: (r["rank"], r["is_seed"]) for r in rows}


def test_ppr_matches_reference_bit_exact(spark):
    rng = np.random.default_rng(37)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2))}
    seeds = [0, 1, 2]
    got = _run(spark, edges, seeds)
    want = _ref(edges, seeds)
    assert {k: v[0] for k, v in got.items()} == want


def test_ppr_seed_locality_beats_global_popularity(spark):
    # a 'link farm' star (everyone points at node 9) far from the seed
    # cluster 0-1-2; trust must NOT flow to the farm
    edges = [(0, 1), (1, 2), (2, 0)] + [(i, 9) for i in range(3, 9)]
    got = _run(spark, edges, [0])
    assert got[9][0] == 0.0  # unreachable from the seed: exactly zero
    assert got[1][0] > 0.0 and got[2][0] > 0.0


def test_ppr_mass_conservation_and_seed_flags(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)]
    got = _run(spark, edges, [0, 2])
    assert sum(r for r, _ in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got[0][1] and got[2][1] and not got[1][1]


def test_ppr_isolated_seed_and_validation(spark):
    # seed 99 appears in no edge: teleport still lands there
    got = _run(spark, [(0, 1)], [99])
    assert got[99][0] > 0.0 and got[0][0] == 0.0
    with pytest.raises(ValueError):
        _run(spark, [(0, 1)], [])
    with pytest.raises(ValueError):
        _run(spark, [(0, 1)], [0], damping=1.5)


@pytest.mark.slow
def test_ppr_repartition_invariant(spark):
    rng = np.random.default_rng(43)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 25, (80, 2))]
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(0,), (5,)], ["id"])
    a = sorted(
        map(tuple, personalized_pagerank(e, s, deterministic=True).collect())
    )
    b = sorted(
        map(
            tuple,
            personalized_pagerank(
                e.repartition(9, "dst"), s, deterministic=True
            ).collect(),
        )
    )
    assert a == b

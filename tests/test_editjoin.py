"""Edit-similarity join: brute-force parity (pins the prefix filter as
loss-free), short-string path, exact-dup mode, partitioning invariance."""

import random

import pytest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def _brute(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            if abs(len(sa) - len(sb)) <= d and _lev(sa, sb) <= d:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, _lev(sa, sb)))
    return out


def _run(spark, rows, **kw):
    from open_vector_tile_spark.operators.editjoin import edit_similarity_join

    df = spark.createDataFrame(rows, "id LONG, s STRING")
    return {
        (r["id_l"], r["id_r"], r["dist"])
        for r in edit_similarity_join(df, **kw).collect()
    }


class TestEditJoin:
    @pytest.mark.parametrize("seed,d,q", [(0, 1, 3), (1, 2, 3), (2, 2, 2), (3, 3, 3)])
    def test_randomized_brute_parity(self, spark, seed, d, q):
        rng = random.Random(seed)
        rows = []
        for i in range(60):
            base = "".join(rng.choice("abc") for _ in range(rng.randint(1, 14)))
            rows.append((i, base))
        assert _run(spark, rows, max_dist=d, q=q) == _brute(rows, d)

    def test_url_variants(self, spark):
        rows = [
            (1, "https://example.com/page/17?v=1"),
            (2, "https://example.com/page/17?v=2"),   # dist 1 to id 1
            (3, "https://example.com/page/18?v=1"),   # dist 1 to id 1
            (4, "https://example.com/other/999?x=9"),  # far from all
            (5, "https://example.com/page/17?v=1"),   # exact dup of id 1
        ]
        got = _run(spark, rows, max_dist=2, q=3)
        assert (1, 5, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got
        assert (2, 3, 2) in got
        assert not any(4 in (l, r) for l, r, _ in got)

    def test_all_short_strings(self, spark):
        # every string below the vacuous-bound cutoff: pure brute path
        rows = [(1, "ab"), (2, "ac"), (3, "b"), (4, "xyz"), (5, "ab")]
        got = _run(spark, rows, max_dist=1, q=3)
        assert got == _brute(rows, 1)

    def test_exact_duplicates_d0(self, spark):
        rows = [(1, "hello"), (2, "hello"), (3, "hellx"), (4, "hello")]
        got = _run(spark, rows, max_dist=0, q=3)
        assert got == {(1, 2, 0), (1, 4, 0), (2, 4, 0)}

    def test_null_strings_dropped(self, spark):
        rows = [(1, "abc"), (2, None), (3, "abc")]
        got = _run(spark, rows, max_dist=1, q=3)
        assert got == {(1, 3, 0)}

    @pytest.mark.slow
    def test_repartition_invariance(self, spark):
        from open_vector_tile_spark.operators.editjoin import edit_similarity_join

        rng = random.Random(7)
        rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(2, 10))))
                for i in range(40)]
        df = spark.createDataFrame(rows, "id LONG, s STRING")
        a = {(r["id_l"], r["id_r"], r["dist"])
             for r in edit_similarity_join(df, max_dist=2).collect()}
        b = {(r["id_l"], r["id_r"], r["dist"])
             for r in edit_similarity_join(df.repartition(11), max_dist=2).collect()}
        assert a == b == _brute(rows, 2)

    def test_validation(self, spark):
        from open_vector_tile_spark.operators.editjoin import edit_similarity_join

        df = spark.createDataFrame([(1, "x")], "id LONG, s STRING")
        with pytest.raises(ValueError):
            edit_similarity_join(df, max_dist=-1)
        with pytest.raises(ValueError):
            edit_similarity_join(df, q=1)

"""BPE trainer tests: python-reference parity, greedy-fold semantics,
degenerate corpora, partitioning invariance, encode reassembly."""

from collections import Counter

import pytest


def _py_bpe(word_freqs: dict[str, int], num_merges: int):
    """Reference BPE trainer: dict-of-words, greedy left-to-right apply."""
    vocab = {w: [c for c in w] for w in word_freqs}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties on (lhs, rhs) ascending
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = lhs + rhs
        merges.append((rank, lhs, rhs, merged, cnt))
        for w, syms in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def _freqs(texts):
    c: Counter = Counter()
    for t in texts:
        c.update(w for w in t.lower().split() if w)
    return dict(c)


class TestBpeTrain:
    def test_known_corpus(self, spark):
        from open_vector_tile_spark.operators.bpe import bpe_train

        texts = ["low low low low low", "lower lower", "newest newest newest",
                 "widest widest", "new new newer"]
        got = [tuple(r) for r in bpe_train(_docs_df(spark, texts), num_merges=10)
               .orderBy("rank").collect()]
        want, _ = _py_bpe(_freqs(texts), 10)
        assert got == want

    def test_greedy_overlap_run(self, spark):
        # "aaaa" with merge (a,a): greedy -> [aa, aa]; "aaaaa" -> [aa, aa, a]
        from open_vector_tile_spark.operators.bpe import bpe_train

        texts = ["aaaa aaaa aaaaa"]
        got = [tuple(r) for r in bpe_train(_docs_df(spark, texts), num_merges=3)
               .orderBy("rank").collect()]
        want, vocab = _py_bpe(_freqs(texts), 3)
        assert got == want
        # round 1 pair count: aaaa has 3 adjacent (a,a), aaaaa has 4 -> 2*3+4
        assert got[0][:3] == (1, "a", "a") and got[0][4] == 10

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_randomized_parity(self, spark, seed):
        import random

        from open_vector_tile_spark.operators.bpe import bpe_train

        rng = random.Random(seed)
        alphabet = "abcde"
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
                for _ in range(rng.randint(3, 20))
            )
            for _ in range(30)
        ]
        got = [tuple(r) for r in bpe_train(_docs_df(spark, texts), num_merges=8)
               .orderBy("rank").collect()]
        want, _ = _py_bpe(_freqs(texts), 8)
        assert got == want

    def test_early_stop_fully_fused(self, spark):
        # every word is one char: no pairs ever -> empty merge table
        from open_vector_tile_spark.operators.bpe import bpe_train

        got = bpe_train(_docs_df(spark, ["a b c a b"]), num_merges=5).collect()
        # round 1 merges exist only between... all words are single chars
        assert got == []

    @pytest.mark.slow
    def test_repartition_invariance(self, spark):
        from open_vector_tile_spark.operators.bpe import bpe_train

        texts = ["the cat sat on the mat", "the bat and the rat", "cat cat mat"]
        base = _docs_df(spark, texts)
        a = [tuple(r) for r in bpe_train(base, num_merges=6).orderBy("rank").collect()]
        b = [tuple(r) for r in bpe_train(base.repartition(7), num_merges=6)
             .orderBy("rank").collect()]
        assert a == b

    def test_validation(self, spark):
        from open_vector_tile_spark.operators.bpe import bpe_train

        with pytest.raises(ValueError):
            bpe_train(_docs_df(spark, ["x"]), num_merges=0)


class TestBpeEncode:
    def test_subword_counts_match_reference(self, spark):
        from open_vector_tile_spark.operators.bpe import (
            bpe_subword_counts,
            bpe_train,
        )

        texts = ["low low lower lowest", "new newer newest new", "low new"]
        docs = _docs_df(spark, texts)
        merges = [tuple(r) for r in bpe_train(docs, num_merges=6).collect()]
        got = {
            r["subword"]: (r["n_words"], r["n_occurrences"])
            for r in bpe_subword_counts(docs, merges).collect()
        }
        freqs = _freqs(texts)
        _, vocab = _py_bpe(freqs, 6)
        want_words: Counter = Counter()
        want_occ: Counter = Counter()
        for w, syms in vocab.items():
            for s in set(syms):
                want_words[s] += 1
            for s in syms:
                want_occ[s] += freqs[w]
        assert got == {s: (want_words[s], want_occ[s]) for s in want_occ}

    def test_segmentation_reassembles_words(self, spark):
        # applying merges never loses or reorders characters
        from pyspark.sql import functions as F

        from open_vector_tile_spark.operators.bpe import (
            _word_freqs,
            bpe_apply_merges,
            bpe_train,
        )

        texts = ["abcabc abc cab bca", "abcd dcba abcabc"]
        docs = _docs_df(spark, texts)
        merges = [tuple(r) for r in bpe_train(docs, num_merges=5).collect()]
        words = bpe_apply_merges(_word_freqs(docs, "text"), merges)
        bad = words.where(
            F.concat_ws("", F.col("syms")) != F.col("word")
        ).count()
        assert bad == 0

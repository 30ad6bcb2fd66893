"""Correctness oracles for the web-text operators whose semantics DuckDB
can't express (hash-based dedup, LSH similarity, language ID) plus the
multimodal plumbing.  Brute-force numpy/pandas oracles at smoke scale."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


def _shingle_set(text: str, n: int = 3) -> set:
    import re

    words = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(words) <= n:
        return {" ".join(words)}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def test_minhash_lsh_recall_and_precision(spark, docs, docs_pdf):
    """Every true near-dup pair (jaccard >= 0.8) must be found (LSH recall at
    16 bands x 4 rows is ~1 for j=0.8), and reported jaccard must equal the
    exact set jaccard."""
    from open_vector_tile_spark.operators.dedup import minhash_dedup

    got = minhash_dedup(docs, threshold=0.8).toPandas()
    sets = {int(r.doc_id): _shingle_set(r.text) for r in docs_pdf.itertuples()}
    ids = sorted(sets)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.8:
                want.add((a, b))
    got_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert want <= got_pairs  # full recall on strong dups
    # precision: all reported pairs truly meet the threshold (verify step)
    for a, b in got_pairs:
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert inter / union >= 0.8


def test_exact_dedup_keeps_one_per_group(spark, docs, docs_pdf):
    from open_vector_tile_spark.operators.dedup import exact_dedup

    kept = exact_dedup(docs).toPandas()
    norm = docs_pdf["text"].str.strip().str.lower().str.replace(r"\s+", " ", regex=True)
    want_n = norm.nunique()
    assert len(kept) == want_n
    # keeper is the min doc_id of its group
    groups = docs_pdf.assign(norm=norm).groupby("norm")["doc_id"].min()
    assert set(kept["doc_id"]) == set(groups)


def test_simhash_hamming_reflects_similarity(spark, docs):
    """Near-dup docs (by jaccard) must have small simhash hamming distance;
    the op's pairs must be symmetric-consistent and within the band bound."""
    from open_vector_tile_spark.operators.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs).toPandas()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # every returned pair shares at least one exact 16-bit band -> by
    # construction hamming <= 48; sanity-check the hamming computation
    assert (pairs["hamming"] <= 48).all()


def test_lsh_topk_recall_vs_bruteforce(spark):
    from open_vector_tile_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = len(emb.first()["embedding"])
    exact = cosine_topk_bruteforce(emb, queries, k=5, qid_col="query_id").toPandas()
    approx = cosine_topk_lsh(emb, queries, dim=dim, k=5, qid_col="query_id").toPandas()
    # recall@5 >= 0.5 with 8 tables x 16 buckets on 500 RANDOM vectors (the
    # hardest case for sign-LSH: near-orthogonal neighbors); real near-dup
    # corpora cluster and recall approaches 1
    e = set(zip(exact["query_id"], exact["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    assert len(e & a) / len(e) >= 0.5
    # rank-1 must be the vector itself in both
    self_hits = approx[(approx["rank"] == 1)]
    assert (self_hits["query_id"] == self_hits["vec_id"]).all()


def test_lsh_hot_bucket_guard(spark):
    """Degenerate corpus (3000 byte-identical docs): without a bucket cap the
    band self-join is C(3000,2) x 16 bands ~ 7e7 pairs; with the guard the
    candidate set is bounded by cap^2/2 (the cap keeps the same smallest ids
    in every band, so pairs collapse to one bucket's worth)."""
    from open_vector_tile_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_near_dups,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(3000),
            "text": ["the same boilerplate text repeated on every single page of the site"] * 3000,
        }
    )
    df = spark.createDataFrame(pdf)
    cap = 32
    n = minhash_lsh_candidates(df, max_bucket=cap).count()
    assert 0 < n <= cap * (cap - 1) / 2
    sh = simhash_near_dups(df, max_bucket=cap).toPandas()
    assert 0 < len(sh) <= cap * (cap - 1) / 2
    assert (sh["hamming"] == 0).all()


def test_embedding_near_dups_threshold(spark):
    from open_vector_tile_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    out = embedding_near_dups(emb, dim=dim, threshold=0.99).toPandas()
    assert (out["cos_sim"] >= 0.99).all()


def test_lang_id_on_marker_text(spark):
    from open_vector_tile_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der hund und die katze und der vogel",),
            ("le chat et la maison et les oiseaux",),
            ("xyzzy plugh",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_quality_and_tokens_columns(spark, docs):
    from open_vector_tile_spark.functions.text import quality_score, token_count

    out = docs.select(
        token_count(F.col("text")).alias("nt"), quality_score(F.col("text")).alias("q")
    ).toPandas()
    assert (out["nt"] > 0).all()
    assert out["q"].between(0, 1).all()


def test_multimodal_plumbing(spark):
    from open_vector_tile_spark.functions.multimodal import (
        extract_features,
        media_table,
        resize_stub,
    )

    media = media_table(spark, 16)
    feats = extract_features(media).toPandas()
    assert len(feats) == 16
    assert all(len(f) == 16 for f in feats["feat"])
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in feats["feat"])
    resized = resize_stub(media, 8, 8).toPandas()
    assert (resized["width"] == 8).all()
    assert all(len(bytes(p)) == 64 for p in resized["payload"])


def test_multimodal_unknown_codec_raises(spark):
    from open_vector_tile_spark.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png", 4, 4)

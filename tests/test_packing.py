"""Distributed prefix-sum / sequence-packing oracle tests.

The packing operator computes each document's absolute token offset in key
order (exclusive prefix sum) without a global single-task window; every test
compares against the trivially-correct pandas cumsum.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.packing import distributed_cumsum, pack_sequences


def _naive(pdf: pd.DataFrame, val: str) -> pd.Series:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    return pdf[val].cumsum().shift(1, fill_value=0)


@pytest.mark.parametrize("bucket_width", [1, 7, 64, 10_000_000])
def test_cumsum_matches_naive(spark, bucket_width):
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(100_000, size=400, replace=False))  # sparse keys
    toks = rng.integers(0, 500, size=400)
    toks[::17] = 0  # empty docs interleaved
    pdf = pd.DataFrame({"doc_id": ids.astype("int64"), "n": toks.astype("int64")})
    got = (
        distributed_cumsum(
            spark.createDataFrame(pdf).repartition(8), "doc_id", "n",
            bucket_width=bucket_width,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    want = _naive(pdf, "n")
    assert got["cum_excl"].tolist() == want.tolist()
    assert got["doc_id"].tolist() == pdf.sort_values("doc_id")["doc_id"].tolist()


def test_cumsum_keys_beyond_double_precision(spark):
    """Order keys above 2^53: float-division bucketing would misbucket;
    the integral DIV path must not."""
    base = 1 << 60
    ids = [base + i for i in (0, 1, 2, 4097, 4098, 9000)]
    pdf = pd.DataFrame({"doc_id": ids, "n": [5, 7, 11, 13, 17, 19]})
    got = (
        distributed_cumsum(spark.createDataFrame(pdf), "doc_id", "n", bucket_width=4096)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["cum_excl"].tolist() == [0, 5, 12, 23, 36, 53]


def test_pack_sequences_semantics(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "n_tokens": [100, 0, 2000, 48, 5000]}
    )
    got = (
        pack_sequences(spark.createDataFrame(pdf), "n_tokens", seq_len=1024)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["start"].tolist() == [0, 100, 100, 2100, 2148]
    assert got["seq_id"].tolist() == [0, 0, 0, 2, 2]
    assert got["seq_offset"].tolist() == [0, 100, 100, 52, 100]
    # doc 3 spans tokens [100, 2100) -> windows 0..2; doc 5 [2148, 7148) -> 2..6
    assert got["n_seqs"].tolist() == [1, 0, 3, 1, 5]


def test_pack_plan_shape(spark):
    """Scale guard: the only unpartitioned window runs over the tiny bucket
    table; the big-table window is hash-partitioned by bucket and the
    offsets join is broadcast."""
    from tests.test_plan_shape import plan_of

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300).alias("n_tokens")
    )
    plan = plan_of(pack_sequences(df, "n_tokens", seq_len=2048, bucket_width=256))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one single-partition exchange (the n_buckets-row offsets table)
    assert plan.count("SinglePartition") == 1
    assert "hashpartitioning(_bkt" in plan


def test_emit_chunks_invariants(spark):
    """Chunk slices tile every document exactly and fill every sequence to
    seq_len (except the final partial one), with offsets consistent with
    pack_sequences' addresses."""
    from open_vector_tile_spark.operators.packing import emit_chunks

    rng = np.random.default_rng(11)
    toks = rng.integers(0, 300, size=200)
    toks[::13] = 0
    pdf = pd.DataFrame(
        {"doc_id": np.arange(200, dtype="int64"), "n": toks.astype("int64")}
    )
    L = 128
    packed = pack_sequences(
        spark.createDataFrame(pdf).repartition(6), "n", seq_len=L, bucket_width=32
    )
    chunks = emit_chunks(packed, "n", seq_len=L).toPandas()
    packed_pd = packed.toPandas().set_index("doc_id")

    # per-doc: slices are contiguous, start at doc_off 0, sum to n_tokens
    for doc, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("seq_id")
        assert grp["doc_off"].iloc[0] == 0
        assert (grp["doc_off"] + grp["n_tok"]).iloc[:-1].tolist() == grp[
            "doc_off"
        ].iloc[1:].tolist()
        assert grp["n_tok"].sum() == packed_pd.loc[doc, "n"]
        assert grp["seq_id"].iloc[0] == packed_pd.loc[doc, "seq_id"]
        assert grp["seq_off"].iloc[0] == packed_pd.loc[doc, "seq_offset"]
        assert (grp["n_tok"] > 0).all()

    # empty docs emit nothing; non-empty all appear
    assert set(chunks["doc_id"]) == set(pdf[pdf["n"] > 0]["doc_id"])

    # per-sequence: full except the last
    per_seq = chunks.groupby("seq_id")["n_tok"].sum().sort_index()
    assert (per_seq.iloc[:-1] == L).all()
    assert 0 < per_seq.iloc[-1] <= L

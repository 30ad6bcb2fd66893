"""Streaming HLL maintenance (streaming/sketches.py): merged micro-batch
registers must equal the batch-whole registers BIT-FOR-BIT (the mergeable-
sketch property is exact, so streaming costs no accuracy)."""

from __future__ import annotations

import pandas as pd
import pytest

from open_vector_tile_spark.functions.sketch import hll_distinct, hll_registers
from open_vector_tile_spark.streaming.sketches import (
    HllStore,
    streaming_hll_distinct,
)


@pytest.fixture()
def batched_corpus(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"g": f"g{(i * 3) % 2}", "item": f"it{i % 700}"} for i in range(4000)
    ]
    # three files -> three micro-batches under maxFilesPerTrigger=1
    for b in range(3):
        pd.DataFrame(rows[b * 1334 : (b + 1) * 1334]).to_parquet(
            src / f"part{b}.parquet"
        )
    return src, rows


def test_streamed_registers_equal_batch_whole(spark, batched_corpus, tmp_path):
    src, rows = batched_corpus
    store = HllStore(str(tmp_path / "hll"), ["g"], p=10)
    stream = (
        spark.readStream.schema("g string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_hll_distinct(stream, store, "item", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    whole = spark.createDataFrame(pd.DataFrame(rows))
    want_regs = sorted(
        (r["g"], r["_j"], r["_r"])
        for r in hll_registers(whole, ["g"], "item", p=10).collect()
    )
    got_regs = sorted(
        (r["g"], r["_j"], r["_r"])
        for r in store.read_registers(spark).collect()
    )
    assert got_regs == want_regs  # bit-identical state, not approximately

    want_est = {
        r["g"]: r["est_distinct"]
        for r in hll_distinct(whole, ["g"], "item", p=10).collect()
    }
    got_est = {r["g"]: r["est_distinct"] for r in store.estimate(spark).collect()}
    assert got_est == want_est


def test_replayed_batch_is_idempotent(spark, batched_corpus, tmp_path):
    src, rows = batched_corpus
    store = HllStore(str(tmp_path / "hll2"), ["g"], p=10)
    whole = spark.createDataFrame(pd.DataFrame(rows))
    b0 = spark.createDataFrame(pd.DataFrame(rows[:1334]))
    b1 = spark.createDataFrame(pd.DataFrame(rows[1334:2668]))
    b2 = spark.createDataFrame(pd.DataFrame(rows[2668:]))
    store.update(b0, "item", 0)
    store.update(b1, "item", 1)
    store.update(b1, "item", 1)  # at-least-once replay of batch 1
    store.update(b2, "item", 2)
    want = sorted(
        (r["g"], r["_j"], r["_r"])
        for r in hll_registers(whole, ["g"], "item", p=10).collect()
    )
    got = sorted(
        (r["g"], r["_j"], r["_r"]) for r in store.read_registers(spark).collect()
    )
    assert got == want


def test_empty_store_estimate_none(spark, tmp_path):
    store = HllStore(str(tmp_path / "none"), ["g"], p=8)
    assert store.estimate(spark) is None


def test_cms_store_streamed_equals_whole(spark, batched_corpus, tmp_path):
    from open_vector_tile_spark.functions.sketch import cms_counters
    from open_vector_tile_spark.streaming.sketches import CmsStore

    src, rows = batched_corpus
    store = CmsStore(str(tmp_path / "cms"), ["g"], width=512, depth=3)
    b = [rows[:1334], rows[1334:2668], rows[2668:]]
    for i, chunk in enumerate(b):
        store.update(spark.createDataFrame(pd.DataFrame(chunk)), "item", i)
    # replay of the middle batch must not double-count
    store.update(spark.createDataFrame(pd.DataFrame(b[1])), "item", 1)
    whole = spark.createDataFrame(pd.DataFrame(rows))
    want = sorted(
        (r["g"], r["_row"], r["_bucket"], r["_cnt"])
        for r in cms_counters(whole, "item", width=512, depth=3, group_cols=["g"]).collect()
    )
    got = sorted(
        (r["g"], r["_row"], r["_bucket"], r["_cnt"])
        for r in store.read_counters(spark).collect()
    )
    assert got == want
    qs = spark.createDataFrame(
        pd.DataFrame({"g": ["g0", "g1"], "item": ["it3", "it3"]})
    )
    est = {r["g"]: r["est_count"] for r in store.estimate(qs, "item").collect()}
    import collections

    true = collections.Counter((r["g"], r["item"]) for r in rows)
    assert est["g0"] >= true[("g0", "it3")]
    assert est["g1"] >= true[("g1", "it3")]

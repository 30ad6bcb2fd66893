"""Prototype A/B: _cap_buckets restructures at sf1.0.

A = current (probe job + conditional cap plan, localCheckpoint)
C = no probe: checkpoint + unconditional two-phase cap in ONE plan
D = no probe, no checkpoint: single repartition(band,hash) shared via
    exchange reuse; counts/window/join all consume the same exchange
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, Window


def band_rows_of(dd, df, id_col="doc_id", text_col="text", num_hashes=64,
                 bands=16, shingle_n=3):
    df = dd._ensure_parallelism(df)
    A = dd._minhash_A(num_hashes)
    rpb = num_hashes // bands

    def emit(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            grams, offs, _wc = dd._batch_gram_hashes(pdf[text_col].tolist(), shingle_n)
            D = len(offs)
            if D == 0:
                continue
            keys = dd._batch_band_keys(grams, offs, A, bands, rpb)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), D),
                "band_hash": keys.ravel(),
            })

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        emit, f"{id_col} {id_t}, band int, band_hash long")


def cand_C(dd, df, max_bucket=256, id_col="doc_id"):
    keys = ["band", "band_hash"]
    br = band_rows_of(dd, df).localCheckpoint(eager=False)
    counts = br.groupBy(*keys).agg(F.count("*").alias("_bc"))
    hot = F.broadcast(counts.filter(F.col("_bc") > max_bucket).select(*keys))
    cold = br.join(hot, on=keys, how="left_anti")
    w = Window.partitionBy(*keys).orderBy(F.col(id_col).asc())
    capped_hot = (br.join(hot, on=keys, how="left_semi")
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    rows = cold.unionByName(capped_hot)
    left = rows.withColumnRenamed(id_col, "id_a")
    right = rows.withColumnRenamed(id_col, "id_b")
    return (left.hint("merge").join(right, on=keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def cand_D(dd, df, max_bucket=256, id_col="doc_id"):
    keys = ["band", "band_hash"]
    br = band_rows_of(dd, df).repartition(*keys)
    counts = br.groupBy(*keys).agg(F.count("*").alias("_bc"))
    hot = F.broadcast(counts.filter(F.col("_bc") > max_bucket).select(*keys))
    cold = br.join(hot, on=keys, how="left_anti")
    w = Window.partitionBy(*keys).orderBy(F.col(id_col).asc())
    capped_hot = (br.join(hot, on=keys, how="left_semi")
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    rows = cold.unionByName(capped_hot)
    left = rows.withColumnRenamed(id_col, "id_a")
    right = rows.withColumnRenamed(id_col, "id_b")
    return (left.hint("merge").join(right, on=keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def main():
    import __spark_entry__ as entry
    from open_vector_tile_spark.plans import get_spark
    from open_vector_tile_spark.operators import dedup as dd

    spark = get_spark("probe-r6c", cores=32)
    docs = entry._load(spark, SF, "documents")

    # hot-bucket corpus: 2000 copies of one text + the real docs
    hotpdf = pd.DataFrame({
        "doc_id": np.arange(1_000_000, 1_002_000, dtype=np.int64),
        "text": ["the same boilerplate text repeated everywhere " * 4] * 2000,
    })
    hot_docs = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(hotpdf))

    def t(tag, fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn().agg(F.count("*")).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag:35s} {best:7.3f}s")

    # warm
    dd.minhash_lsh_candidates(docs).agg(F.count("*")).collect()
    for rnd in range(2):
        t(f"rnd{rnd} A current(probe)", lambda: dd.minhash_lsh_candidates(docs))
        t(f"rnd{rnd} C ckpt+inplan-cap", lambda: cand_C(dd, docs))
        t(f"rnd{rnd} D one-exchange", lambda: cand_D(dd, docs))
    print("--- hot corpus ---")
    for rnd in range(1):
        t(f"hot A current(probe)", lambda: dd.minhash_lsh_candidates(hot_docs))
        t(f"hot C ckpt+inplan-cap", lambda: cand_C(dd, hot_docs))
        t(f"hot D one-exchange", lambda: cand_D(dd, hot_docs))
    # identical results?
    a = dd.minhash_lsh_candidates(docs).collect()
    c = cand_C(dd, docs).collect()
    d = cand_D(dd, docs).collect()
    print("cold identical:", sorted(a) == sorted(c) == sorted(d), len(a))
    ah = dd.minhash_lsh_candidates(hot_docs).collect()
    ch = cand_C(dd, hot_docs).collect()
    dh = cand_D(dd, hot_docs).collect()
    print("hot identical:", sorted(ah) == sorted(ch) == sorted(dh), len(ah))
    spark.stop()


if __name__ == "__main__":
    main()

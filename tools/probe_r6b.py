"""Round-6 probe 2: attribute in-operator cost for knn / dedup verify /
tile_encode at sf1.0."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(name, df, n=3):
    spark = df.sparkSession
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:45s} {best:7.3f}s")
    return best


def main():
    import pandas as pd
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from open_vector_tile_spark.plans import get_spark
    from open_vector_tile_spark.operators import encode_tiles, points_to_features
    from open_vector_tile_spark.operators.dedup import (
        minhash_lsh_candidates, ngram_jaccard_pairs)
    from open_vector_tile_spark.operators.knn import knn_broadcast
    from open_vector_tile_spark.sources import pois_pdf

    spark = get_spark("probe-r6b", cores=CPUS)
    docs_pts = entry._doc_points(entry._load(spark, SF, "documents")).select(
        F.col("doc_id"), F.col("doc_id").cast("string").alias("url"), "lon", "lat", "lang"
    )
    docs_pts_w = docs_pts.repartition(CPUS)

    # knn attribution
    sel = docs_pts_w.select("url", "lon", "lat")
    t("knn scan+shuffle only", sel)

    def ident(batches):
        for pdf in batches:
            yield pdf[["url"]]

    t("knn shuffle+identity-mapInPandas", sel.mapInPandas(ident, "url string"))
    t("knn full fanout", knn_broadcast(docs_pts_w, pois_pdf(200), k=3).groupBy("rank").count())
    t("knn full fanout (no agg)", knn_broadcast(docs_pts_w, pois_pdf(200), k=3))
    # key=doc_id long instead of url string?
    t("knn key=doc_id", knn_broadcast(docs_pts_w, pois_pdf(200), k=3, key="doc_id").groupBy("rank").count())

    # dedup verify attribution
    docs = entry._load(spark, SF, "documents")
    docs_w = docs.repartition(CPUS)
    cand = minhash_lsh_candidates(docs_w)
    t("dedup cand only (fan)", cand.agg(F.count("*")))
    ver = ngram_jaccard_pairs(docs_w, cand)
    t("dedup cand+verify (fan)", ver.agg(F.count("*")))
    n_cand = cand.count()
    print("n candidate pairs:", n_cand)

    # tile encode attribution
    feats = points_to_features(docs_pts_w, zoom=6, layer="docs", extent=4096,
                               id_col="doc_id", props_cols=["lang"])
    key = ["zoom", "tile_x", "tile_y"]
    arranged = feats.repartition(3 * CPUS, *key).sortWithinPartitions(*key, "id")
    t("tile arrange only (96)", arranged)
    t("tile arrange+encode (96)", encode_tiles(feats, partitions=3 * CPUS).agg(
        F.count("*").alias("tiles"), F.sum("n_bytes").alias("bytes")))
    n_tiles = encode_tiles(feats, partitions=3 * CPUS).count()
    print("n tiles:", n_tiles)
    for p in (32, 64, 192):
        t(f"tile encode parts={p}", encode_tiles(feats, partitions=p).agg(
            F.count("*").alias("tiles"), F.sum("n_bytes").alias("bytes")))

    spark.stop()


if __name__ == "__main__":
    main()

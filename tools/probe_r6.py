"""Round-6 optimization probe: per-query noop-sink timings at sf1.0 with
candidate fan-out variants, to attribute cost before changing operators.

Usage: python tools/probe_r6.py [sf_dir]
"""
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
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from open_vector_tile_spark.plans import get_spark
    from open_vector_tile_spark.operators import encode_tiles, points_to_features
    from open_vector_tile_spark.operators.dedup import (
        minhash_dedup, minhash_lsh_candidates, ngram_jaccard_pairs)
    from open_vector_tile_spark.operators.knn import knn_broadcast
    from open_vector_tile_spark.operators.spatial_join import spatial_join
    from open_vector_tile_spark.sources import pois_pdf, polygons_pdf

    spark = get_spark("probe-r6", cores=CPUS)
    docs_pts = entry._doc_points(entry._load(spark, SF, "documents")).select(
        F.col("doc_id"), F.col("doc_id").cast("string").alias("url"), "lon", "lat", "lang"
    )
    docs_pts_w = docs_pts.repartition(CPUS)

    # --- knn ---
    t("knn baseline", knn_broadcast(docs_pts, pois_pdf(200), k=3).groupBy("rank").count())
    t("knn fanout32", knn_broadcast(docs_pts_w, pois_pdf(200), k=3).groupBy("rank").count())

    # --- dedup_minhash ---
    docs = entry._load(spark, SF, "documents")
    t("dedup baseline", minhash_dedup(docs, threshold=0.5).agg(F.count("*")))
    docs_w = docs.repartition(CPUS)
    t("dedup fanout32", minhash_dedup(docs_w, threshold=0.5).agg(F.count("*")))
    # candidate stage alone
    t("dedup cand baseline", minhash_lsh_candidates(docs).agg(F.count("*")))
    t("dedup cand fanout32", minhash_lsh_candidates(docs_w).agg(F.count("*")))

    # --- tile_encode ---
    def te(src, partitions=None):
        feats = points_to_features(src, zoom=6, layer="docs", extent=4096,
                                   id_col="doc_id", props_cols=["lang"])
        return encode_tiles(feats, partitions=partitions).agg(
            F.count("*").alias("tiles"), F.sum("n_bytes").alias("bytes"))
    t("tile_encode baseline", te(docs_pts))
    t("tile_encode fanout-in", te(docs_pts_w))
    t("tile_encode parts=96", te(docs_pts, partitions=3 * CPUS))
    t("tile_encode fan+parts", te(docs_pts_w, partitions=3 * CPUS))

    # --- agg_q1 ---
    t("agg_q1 baseline", entry._q_agg_pushdown(spark, SF))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    t("agg_q1 split8m", entry._q_agg_pushdown(spark, SF))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))

    # --- gridding ---
    t("gridding baseline", entry._q_gridding(spark, SF).agg(F.count("*")))
    ev = entry._load(spark, SF, "events")
    from open_vector_tile_spark.plans import get_spark as _g  # noqa
    # hand-inlined gridding on fanned events
    def gridding_on(src):
        pts = entry._tile_cols(entry._event_points(src))
        size = 32
        mx = entry._merc_x(F.col("lon")) * entry.N_TILES
        my = entry._merc_y(F.col("lat")) * entry.N_TILES
        px = F.greatest(F.lit(0), F.least(F.lit(size - 1), F.floor((mx - F.col("tile_x")) * size))).cast("int")
        py = F.greatest(F.lit(0), F.least(F.lit(size - 1), F.floor((my - F.col("tile_y")) * size))).cast("int")
        return (
            pts.select("tile_x", "tile_y", px.alias("px"), py.alias("py"), F.col("value").alias("v"))
            .groupBy("tile_x", "tile_y", "px", "py")
            .agg(F.avg("v").alias("mean_value"), F.count("*").alias("n"))
            .orderBy("tile_x", "tile_y", "px", "py")
        )
    t("gridding fanout32", gridding_on(ev.repartition(CPUS)).agg(F.count("*")))

    # --- cosine_topk ---
    t("cosine baseline", entry._q_cosine_topk(spark, SF))
    emb = entry._load(spark, SF, "embeddings")
    from open_vector_tile_spark.operators.similarity import cosine_topk_bruteforce
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding"))
    out = cosine_topk_bruteforce(emb.repartition(CPUS), queries, k=5, qid_col="query_id")
    t("cosine fanout32", out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank"))

    # --- spatial_join ---
    t("spatial baseline", spatial_join(docs_pts, polygons_pdf(), zoom=6).groupBy("poly_id").count())
    t("spatial fanout32", spatial_join(docs_pts_w, polygons_pdf(), zoom=6).groupBy("poly_id").count())

    spark.stop()


if __name__ == "__main__":
    main()

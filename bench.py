#!/usr/bin/env python
"""Headline benchmark.  Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries cover the engine's headline operators at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  tile_encode      pages-style points -> spatial tile shuffle -> OVT encode
  spatial_join     cell-prefilter + exact PIP join (synthetic polygon layer)
  knn              broadcast haversine top-3
  dedup_minhash    MinHash+LSH near-dup candidates + verify
  agg_q1           TPC-H Q1-style partial agg
  cosine_topk      embedding brute-force cosine top-5
  gridding         per-tile raster cell means

Set SPARK_GRAFT_BENCH_SCALING=1 to also run the tile_encode job at local[8]
and local[32] on identical input and report throughput + scaling efficiency
(the north_rule two-cluster-size evidence; see BENCH/BASELINE notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_queries(spark, sf_dir):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from open_vector_tile_spark.operators import encode_tiles, points_to_features
    from open_vector_tile_spark.operators.dedup import minhash_dedup
    from open_vector_tile_spark.operators.knn import knn_broadcast
    from open_vector_tile_spark.operators.spatial_join import spatial_join
    from open_vector_tile_spark.sources import pois_pdf, polygons_pdf

    docs_pts = entry._doc_points(entry._load(spark, sf_dir, "documents")).select(
        F.col("doc_id"), F.col("doc_id").cast("string").alias("url"), "lon", "lat", "lang"
    )

    def q_tile_encode():
        feats = points_to_features(
            docs_pts, zoom=6, layer="docs", extent=4096, id_col="doc_id", props_cols=["lang"]
        )
        return encode_tiles(feats).agg(
            F.count("*").alias("tiles"), F.sum("n_bytes").alias("bytes")
        )

    def q_spatial_join():
        return spatial_join(docs_pts, polygons_pdf(), zoom=6).groupBy("poly_id").count()

    def q_knn():
        return knn_broadcast(docs_pts, pois_pdf(200), k=3).groupBy("rank").count()

    def q_dedup_minhash():
        docs = entry._load(spark, sf_dir, "documents")
        return minhash_dedup(docs, threshold=0.5).agg(F.count("*"))

    def q_agg_q1():
        return entry._q_agg_pushdown(spark, sf_dir)

    def q_cosine_topk():
        return entry._q_cosine_topk(spark, sf_dir)

    def q_gridding():
        return entry._q_gridding(spark, sf_dir).agg(F.count("*"))

    return {
        "tile_encode": q_tile_encode,
        "spatial_join": q_spatial_join,
        "knn": q_knn,
        "dedup_minhash": q_dedup_minhash,
        "agg_q1": q_agg_q1,
        "cosine_topk": q_cosine_topk,
        "gridding": q_gridding,
    }


def run_session(cores: int, sf_dir: str) -> dict[str, float]:
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark(f"bench-{cores}", cores=cores)
    try:
        queries = build_queries(spark, sf_dir)
        timings: dict[str, float] = {}
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn().collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        return timings
    finally:
        spark.stop()


def run_scaling(sf_dir: str) -> dict:
    """Same tile_encode job at local[8] vs local[32] on identical input."""
    from open_vector_tile_spark.plans import get_spark

    out = {}
    n_rows = None
    for cores in (8, 32):
        spark = get_spark(f"scale-{cores}", cores=cores)
        try:
            queries = build_queries(spark, sf_dir)
            # warm the JVM + arrow path once
            queries["agg_q1"]().collect()
            t0 = time.perf_counter()
            res = queries["tile_encode"]().collect()
            dt = time.perf_counter() - t0
            if n_rows is None:
                import __spark_entry__ as entry

                n_rows = entry._load(spark, sf_dir, "documents").count()
            out[f"local[{cores}]"] = {
                "sec": round(dt, 3),
                "rows_per_sec": round(n_rows / dt, 1),
                "tiles": int(res[0]["tiles"]),
            }
        finally:
            spark.stop()
    t8 = out["local[8]"]["rows_per_sec"]
    t32 = out["local[32]"]["rows_per_sec"]
    out["scaling_efficiency"] = round((t32 / t8) / 4.0, 3)
    return out


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings = run_session(CPUS, SF_DIR)
    result = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING") == "1":
        result["scaling"] = run_scaling(SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

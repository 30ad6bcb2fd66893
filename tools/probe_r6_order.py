"""Which neighbor inflates dedup_minhash in-suite?  Runs dedup_minhash in
controlled contexts within one session: cold, back-to-back, after each other
headline query, and after an explicit JVM GC.  Prints wall seconds per run.

Finding ledger (session 3): see OPTIMIZATION_r06.md "in-bench vs isolated".
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1.0"


def main():
    import bench
    from open_vector_tile_spark.plans import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("order-probe", cores=32)
    qs = bench.build_queries(spark, SF)
    sc = spark.sparkContext

    def run(name):
        t0 = time.perf_counter()
        qs[name]().collect()
        return time.perf_counter() - t0

    def jgc():
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.5)

    # warmup everything once
    for name in qs:
        run(name)
    jgc()

    seq = [
        ("dedup#cold_after_gc", "dedup_minhash", None),
        ("dedup#b2b_1", "dedup_minhash", None),
        ("dedup#b2b_2", "dedup_minhash", None),
        ("tile_encode", "tile_encode", None),
        ("dedup#after_tile_encode", "dedup_minhash", None),
        ("dedup#b2b_3", "dedup_minhash", None),
        ("knn", "knn", None),
        ("dedup#after_knn", "dedup_minhash", None),
        ("agg_q1", "agg_q1", None),
        ("dedup#after_agg_q1", "dedup_minhash", None),
        ("cosine_topk", "cosine_topk", None),
        ("dedup#after_cosine", "dedup_minhash", None),
        ("gridding", "gridding", None),
        ("dedup#after_gridding", "dedup_minhash", None),
        ("spatial_join", "spatial_join", None),
        ("dedup#after_spatial", "dedup_minhash", None),
        ("tile_encode2", "tile_encode", None),
        ("GC", None, jgc),
        ("dedup#after_tile_encode_then_gc", "dedup_minhash", None),
    ]
    for label, q, pre in seq:
        if pre is not None:
            pre()
            print(f"{label}")
            continue
        sc.setJobDescription(label)
        dt = run(q)
        print(f"{label:36s} {dt:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Reproduce bench.py's exact in-session sequence to locate the ~2s of
per-query inflation vs isolated noop probes (agg_q1 1.06 in-bench vs 0.28
isolated). Runs the bench queries in bench order with .collect() like
bench.py, printing per-pass per-query seconds; then re-times agg_q1 /
gridding / cosine alone at the end of the session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import bench
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark("probe-intf", cores=CPUS)
    queries = bench.build_queries(spark, SF)
    for p in range(3):
        line = []
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn().collect()
            line.append(f"{name}={time.perf_counter()-t0:.3f}")
        print(f"pass{p}: " + " ".join(line))
        import gc
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    # after: isolated re-times in same session
    for name in ("agg_q1", "cosine_topk", "gridding", "knn", "spatial_join"):
        best = min(
            (lambda: (lambda t0: (queries[name]().collect(), time.perf_counter() - t0)[1])(
                time.perf_counter()))()
            for _ in range(3)
        )
        print(f"isolated {name}: {best:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()

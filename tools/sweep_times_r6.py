"""Per-query Spark-side wall time over the ENTIRE queries() surface.

Noop-sink isolation (guide 1.4) with setJobDescription labels; no DuckDB,
no comparison — this is the round-6 operator-wide perf profile used to
find remaining hot spots beyond the headline suite.

Usage: python tools/sweep_times_r6.py [sf_dir] [passes]
Prints one line per query: name, min seconds across passes, rows estimate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    import __spark_entry__ as entry
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark("sweep-times-r6", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sc = spark.sparkContext
    qs = entry.queries()
    out: dict[str, float] = {}
    for p in range(PASSES):
        for name, fn in qs.items():
            sc.setJobDescription(f"sweep{p}:{name}")
            t0 = time.perf_counter()
            try:
                fn(spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as e:  # keep sweeping; report the failure
                out[name] = float("nan")
                print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
                continue
            out[name] = min(out.get(name, dt), dt)
        sc.setJobDescription(None)
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    spark.stop()
    for name, dt in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}")
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()

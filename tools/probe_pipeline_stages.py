"""Per-stage timing probe for the flagship pipeline scaling job.

The pipeline path's measured N->4N efficiency sits well below the fast
path's even in calm windows (0.575 vs 0.827 at 8M rows), and a two-size
fit shows a data-dependent, core-count-invariant component (~10 s at 2M,
~18 s at 8M).  This probe times cumulative sub-chains of the EXACT job
bench.py measures, at one pinned core count, so the non-scaling stage can
be identified by differencing consecutive probes at two core counts:

    taskset -c 0-7 python tools/probe_pipeline_stages.py 8 8000000
    taskset -c 0-1 python tools/probe_pipeline_stages.py 2 8000000

Each probe executes the chain up to stage k with a `noop` sink (full
execution, no result materialization), so stage cost ~= t_k - t_{k-1}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000

    from open_vector_tile_spark.benchjobs import build_pipeline_chain
    from open_vector_tile_spark.plans import get_spark
    from open_vector_tile_spark.sources.tileset import OvtTilesetDataSource

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    data = f"{base}/ovt_bench_pages_{rows}"
    if not os.path.isdir(data):
        print(json.dumps({"error": f"corpus missing: {data}"}))
        return 1

    spark = get_spark(f"probe-{cores}", cores=cores)
    spark.dataSource.register(OvtTilesetDataSource)
    pages = spark.read.parquet(data)

    def chain(upto: str):
        # single-sourced with bench.py's pipeline path (benchjobs module) —
        # the probe MUST time the exact job bench.py publishes
        return build_pipeline_chain(spark, pages, cores, upto=upto)

    stages = ["geoparse", "sjoin", "nn_join", "encode", "write"]
    out_dir = f"{base}/ovt_probe_out_{cores}"
    results = {}
    # warmup (JIT, python workers) on a slice through the full chain
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        chain("encode").limit(1000).write.format("noop").mode("overwrite").save()
    )
    # warm the ovt_tileset sink too (python data-source worker + JIT startup):
    # without this the first timed 'write' stage absorbs one-time sink setup
    # and biases the very delta this probe exists to attribute
    warm_dir = f"{base}/ovt_probe_warm_{cores}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    (
        chain("encode")
        .limit(1000)
        .select("zoom", "tile_x", "tile_y", "tile")
        .write.format("ovt_tileset")
        .option("path", warm_dir)
        .option("layout", "shard")
        .mode("append")
        .save()
    )
    shutil.rmtree(warm_dir, ignore_errors=True)
    for st in stages:
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        if st == "write":
            (
                chain("encode")
                .select("zoom", "tile_x", "tile_y", "tile")
                .write.format("ovt_tileset")
                .option("path", out_dir)
                .option("layout", "shard")
                .mode("append")
                .save()
            )
        else:
            chain(st).write.format("noop").mode("overwrite").save()
        results[st] = round(time.perf_counter() - t0, 3)
    deltas = {}
    prev = 0.0
    for st in stages:
        deltas[st] = round(results[st] - prev, 3)
        prev = results[st]
    print(json.dumps({"cores": cores, "rows": rows,
                      "cumulative": results, "stage_delta": deltas}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

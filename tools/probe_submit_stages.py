#!/usr/bin/env python
"""Per-stage scaling probe under the REAL spark-submit launch form.

The round-4 pipeline scaling gap (2->8 executors at 0.34-0.73 while the
fast path holds 0.8-0.96 on the same axis) was attributed to box
contention, but a same-window control sweep (bench._control_ceilings)
showed the 2->8 axis NOT saturated (cpu 0.94 / memstream 0.98).  So the
serialization is in the JOB under local-cluster specifically — this probe
finds the stage: it times each cumulative sub-chain of
``benchjobs.build_pipeline_chain`` (plus the tileset write) at BOTH
executor counts under ``spark-submit --py-files`` on ``local-cluster``,
exactly like tools/submit_scaling.py, and prints per-stage deltas and
per-stage N->4N efficiencies.

Orchestrate:   python tools/probe_submit_stages.py run [--rows 8000000]
Measure (spark-submit entry; don't call directly):
               ... probe_submit_stages.py measure --data D --cores N ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("scan", "geoparse", "sjoin", "nn_join", "encode", "write")


def measure(args: argparse.Namespace) -> None:
    import shutil

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"ovt-stage-probe-{args.cores}").getOrCreate()
    sc = spark.sparkContext
    deadline = time.time() + 90
    while time.time() < deadline and sc.defaultParallelism < args.cores:
        time.sleep(0.5)
    total_cores = max(sc.defaultParallelism, args.cores)

    from open_vector_tile_spark.benchjobs import (
        build_pipeline_chain,
        write_pipeline_tiles,
    )
    from open_vector_tile_spark.sources.tileset import OvtTilesetDataSource

    spark.dataSource.register(OvtTilesetDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(2 * total_cores, 32)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_dir = f"{base}/ovt_stage_probe_out_{args.cores}"

    # project each truncated chain down to the columns the FULL chain still
    # needs at that point: a bare noop write of chain('geoparse') would
    # materialize every pages column INCLUDING html (which the real chain
    # prunes at the scan), charging the geoparse stage ~2x its true scan
    # bytes and distorting the per-stage attribution this probe exists for
    KEEP = {
        "geoparse": ["url", "lang", "lon", "lat"],
        # "scan" isn't a chain stage: same columns the geoparse stage reads,
        # zero regex — its delta vs geoparse isolates scan/decompress
        # scaling from regex/alloc scaling under the real launch form
        "sjoin": ["url", "lang", "lon", "lat", "poly_id"],
        "nn_join": ["url", "lang", "lon", "lat", "poly_id", "near_poi"],
    }

    def chain(upto: str):
        df = build_pipeline_chain(
            spark, spark.read.parquet(args.data), total_cores, upto=upto
        )
        cols = KEEP.get(upto)
        if cols:
            df = df.select(*[c for c in cols if c in df.columns])
        return df

    # warm both the noop chain and the tileset sink (JIT + worker startup)
    chain("encode").limit(1000).write.format("noop").mode("overwrite").save()
    shutil.rmtree(out_dir, ignore_errors=True)
    write_pipeline_tiles(chain("encode").limit(1000), out_dir)
    shutil.rmtree(out_dir, ignore_errors=True)

    results: dict[str, float] = {}
    for st in STAGES:
        best = None
        for _ in range(max(args.passes, 1)):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            if st == "write":
                write_pipeline_tiles(chain("encode"), out_dir)
            elif st == "scan":
                (
                    spark.read.parquet(args.data)
                    .select("url", "lang", "text")
                    .write.format("noop").mode("overwrite").save()
                )
            else:
                chain(st).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[st] = round(best, 3)
    shutil.rmtree(out_dir, ignore_errors=True)
    print("STAGE_PROBE_JSON " + json.dumps({"cores": total_cores, "cum": results}))
    spark.stop()


def run(args: argparse.Namespace) -> int:
    sys.path.insert(0, REPO)
    from tools.submit_scaling import (
        EXEC_MEM_MB,
        SPARK_SUBMIT,
        ZIP_PATH,
        _build_zip,
        _ensure_corpus,
    )

    _build_zip()
    data = _ensure_corpus(args.rows)
    out = {}
    for execs in (args.execs, 4 * args.execs):
        cmd = [
            "taskset", "-c", f"0-{execs - 1}",
            SPARK_SUBMIT,
            "--master", f"local-cluster[{execs},1,{EXEC_MEM_MB}]",
            "--driver-memory", "4g",
            "--py-files", ZIP_PATH,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
            "--conf", "spark.executorEnv.OPENBLAS_NUM_THREADS=1",
            "--conf", "spark.executorEnv.MKL_NUM_THREADS=1",
            "--conf", "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=1",
            "--conf", "spark.local.dir=/dev/shm/spark-local"
            if os.path.isdir("/dev/shm") else "spark.local.dir=/tmp/spark-local",
            os.path.join(REPO, "tools", "probe_submit_stages.py"),
            "measure", "--data", data, "--cores", str(execs),
            "--passes", str(args.passes),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        for line in proc.stdout.splitlines():
            if line.startswith("STAGE_PROBE_JSON "):
                out[execs] = json.loads(line[len("STAGE_PROBE_JSON "):])
                break
        else:
            sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-3000:] + "\n")
            return 1
        print(json.dumps(out[execs]))
    lo, hi = args.execs, 4 * args.execs
    deltas = {}
    prev_lo = prev_hi = 0.0
    for st in STAGES:
        d_lo = out[lo]["cum"][st] - prev_lo
        d_hi = out[hi]["cum"][st] - prev_hi
        prev_lo, prev_hi = out[lo]["cum"][st], out[hi]["cum"][st]
        deltas[st] = {
            "lo_sec": round(d_lo, 3),
            "hi_sec": round(d_hi, 3),
            "stage_efficiency": round(d_lo / d_hi / 4.0, 3) if d_hi > 0 else None,
        }
    summary = {"kind": "submit_stage_probe", "execs": [lo, hi], "stages": deltas,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(summary, indent=1))
    with open(os.path.join(REPO, "tools", "stage_probe_submit_r5.jsonl"), "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--rows", type=int, default=8000000)
    r.add_argument("--execs", type=int, default=2)
    r.add_argument("--passes", type=int, default=2)
    m = sub.add_parser("measure")
    m.add_argument("--data", required=True)
    m.add_argument("--cores", type=int, required=True)
    m.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    if args.cmd == "run":
        return run(args)
    measure(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

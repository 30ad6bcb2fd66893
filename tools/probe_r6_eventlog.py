"""Event-log forensics for the in-bench inflation: run the bench sequence
with spark.eventLog.enabled, label every query via setJobDescription, then
parse the log: per query = wall span, sum of task executor-run-time, GC
time, scheduling gaps."""
from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
EVDIR = "/tmp/spark-events-r6"


def main():
    os.makedirs(EVDIR, exist_ok=True)
    for f in os.listdir(EVDIR):
        os.unlink(os.path.join(EVDIR, f))
    import bench
    from pyspark.sql import SparkSession
    from open_vector_tile_spark.plans import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # piggyback on get_spark but add event log conf via builder defaults:
    SparkSession.builder.config("spark.eventLog.enabled", "true").config(
        "spark.eventLog.dir", EVDIR
    )
    spark = (
        SparkSession.builder.appName("evlog")
        .master("local[32]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .getOrCreate()
    )
    spark.stop()
    # real session with engine defaults + event log: get_spark reuses
    # builder; easiest is to set the confs via a fresh builder chain
    from pyspark import SparkConf

    b = SparkSession.builder
    b.config("spark.eventLog.enabled", "true")
    b.config("spark.eventLog.dir", EVDIR)
    spark = get_spark("evlog-bench", cores=32)
    assert spark.conf.get("spark.eventLog.enabled") == "true"
    qs = bench.build_queries(spark, SF)
    sc = spark.sparkContext
    for p in range(3):
        for name, fn in qs.items():
            sc.setJobDescription(f"pass{p}:{name}")
            t0 = time.perf_counter()
            fn().collect()
            print(f"pass{p} {name} {time.perf_counter()-t0:.3f}")
        sc.setJobDescription(None)
        import gc
        gc.collect()
        spark._jvm.System.gc()
    # isolated re-runs at end
    for name in ("dedup_minhash", "gridding"):
        for r in range(3):
            sc.setJobDescription(f"iso{r}:{name}")
            t0 = time.perf_counter()
            qs[name]().collect()
            print(f"iso{r} {name} {time.perf_counter()-t0:.3f}")
    sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # parse (handles both single-file and rolling "eventlog_v2_<app>" layouts;
    # rolled segments may be zstd-compressed)
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        segs = sorted(
            f for f in os.listdir(d) if f.startswith("events_")
        )
        import io
        import zstandard

        def _lines():
            for seg in segs:
                p = os.path.join(d, seg)
                if seg.endswith(".zstd"):
                    with open(p, "rb") as fh:
                        r = zstandard.ZstdDecompressor().stream_reader(fh)
                        yield from io.TextIOWrapper(r)
                else:
                    with open(p) as fh:
                        yield from fh
    else:
        def _lines():
            with open(path) as fh:
                yield from fh
    jobs = {}  # jobId -> dict
    stage_to_job = {}
    stages = defaultdict(lambda: {"run": 0, "gc": 0, "fetch": 0, "tasks": 0,
                                  "result_ser": 0, "deser": 0})
    if True:
        for line in _lines():
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                desc = e.get("Properties", {}).get("spark.job.description", "")
                jid = e["Job ID"]
                jobs[jid] = {"desc": desc, "t0": e["Submission Time"], "t1": None}
                for sid in e.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif ev == "SparkListenerJobEnd":
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                s = stages[sid]
                s["run"] += m.get("Executor Run Time", 0)
                s["gc"] += m.get("JVM GC Time", 0)
                s["deser"] += m.get("Executor Deserialize Time", 0)
                s["result_ser"] += m.get("Result Serialization Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                s["fetch"] += srm.get("Fetch Wait Time", 0)
                s["tasks"] += 1
    per_q = defaultdict(lambda: defaultdict(float))
    for sid, s in stages.items():
        jid = stage_to_job.get(sid)
        if jid is None:
            continue
        d = jobs[jid]["desc"]
        for k in ("run", "gc", "fetch", "deser", "result_ser"):
            per_q[d][k] += s[k]
        per_q[d]["tasks"] += s["tasks"]
    for jid, j in sorted(jobs.items()):
        if j["t1"]:
            per_q[j["desc"]]["wall"] += (j["t1"] - j["t0"]) / 1000.0
        per_q[j["desc"]]["jobs"] += 1
    print("\n%-28s %6s %5s %8s %7s %7s %7s %6s" % (
        "query", "wall", "jobs", "task-run", "gc", "fetch", "deser", "tasks"))
    for d in sorted(per_q):
        q = per_q[d]
        print("%-28s %6.2f %5d %8.1f %7.1f %7.1f %7.1f %6d" % (
            d, q["wall"], q["jobs"], q["run"]/1000, q["gc"]/1000,
            q["fetch"]/1000, q["deser"]/1000, q["tasks"]))


if __name__ == "__main__":
    main()

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

    out = {
        "tile_encode": q_tile_encode,
        "spatial_join": q_spatial_join,
        "knn": q_knn,
        "dedup_minhash": q_dedup_minhash,
        "agg_q1": q_agg_q1,
        "cosine_topk": q_cosine_topk,
        "gridding": q_gridding,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED") == "1":
        # round-2 session-2 operators (kept out of the headline total so the
        # metric stays comparable across rounds)
        def q_extract_text():
            return entry._q_extract_text(spark, sf_dir).agg(F.sum("exact"))

        def q_asof_join():
            return entry._q_asof_join(spark, sf_dir).agg(F.count("*"))

        def q_sessionize():
            return entry._q_sessionize(spark, sf_dir).agg(F.count("*"))

        def q_det_sample():
            return entry._q_det_sample(spark, sf_dir).agg(F.count("*"))

        def q_tile_pyramid():
            return entry._q_tile_pyramid(spark, sf_dir).agg(F.sum("n_features"))

        def q_merge_overlay():
            return entry._q_merge_overlay(spark, sf_dir).agg(F.sum("n_features"))

        # round-3 additions: distributed featurizer ingest + distributed
        # salted spatial join (driver-oracled paths)
        def q_polygon_ingest_dist():
            return entry._q_polygon_ingest_dist(spark, sf_dir).agg(F.count("*"))

        def q_spatial_join_dist():
            return entry._q_spatial_join_dist(spark, sf_dir).agg(F.count("*"))

        def q_line_dedup():
            return entry._q_line_dedup(spark, sf_dir).agg(F.sum("n_removed"))

        def q_dedup_clusters():
            return entry._q_dedup_clusters(spark, sf_dir).agg(F.sum("comp_size"))

        def q_gopher_filter():
            return entry._q_gopher_filter(spark, sf_dir).agg(F.sum("passes"))

        def q_url_dedup():
            return entry._q_url_dedup(spark, sf_dir).agg(F.sum("n_docs"))

        def q_decontaminate():
            return entry._q_decontaminate(spark, sf_dir).agg(F.sum("n_hits"))

        def q_weighted_sample():
            return entry._q_weighted_sample(spark, sf_dir).agg(F.count("*"))

        def q_pii_redact():
            return entry._q_pii_redact(spark, sf_dir).agg(F.sum("n_emails"))

        def q_repetition():
            return entry._q_repetition(spark, sf_dir).agg(F.sum("n_lines"))

        def q_corpus_pipeline():
            return entry._q_corpus_pipeline(spark, sf_dir).agg(F.sum("n_chars"))

        def q_mix_sample():
            return entry._q_mix_sample(spark, sf_dir).agg(F.count("*"))

        def q_dedup_apply():
            return entry._q_dedup_apply(spark, sf_dir).agg(F.sum("n_docs"))

        def q_pack_sequences():
            return entry._q_pack_sequences(spark, sf_dir).agg(F.max("seq_id"))

        def q_kmv_distinct():
            return entry._q_kmv_distinct(spark, sf_dir).agg(F.sum("est_distinct"))

        def q_bm25():
            return entry._q_bm25(spark, sf_dir).agg(F.sum("score"))

        def q_zorder_layout():
            return entry._q_zorder_layout(spark, sf_dir).agg(F.sum("zkey"))

        def q_chunk_emit():
            return entry._q_chunk_emit(spark, sf_dir).agg(F.sum("n_tok"))

        def q_epoch_shuffle():
            return entry._q_epoch_shuffle(spark, sf_dir).agg(F.sum("epoch_rank"))

        # round-3 session-3 additions: clipping, hex index, HLL, interval
        # join, TF-IDF, bloom pruning, collapse, marching squares
        def q_clip_lines():
            return entry._q_clip_lines(spark, sf_dir).agg(F.sum("cx1"))

        def q_hex_assign():
            return entry._q_hex_assign(spark, sf_dir).agg(F.sum("hq"))

        def q_hll_distinct():
            return entry._q_hll_distinct(spark, sf_dir).agg(F.sum("harmonic_sum"))

        def q_interval_join():
            return entry._q_interval_join(spark, sf_dir).agg(F.count("*"))

        def q_tfidf_vectors():
            return entry._q_tfidf_vectors(spark, sf_dir).agg(F.sum("weight"))

        def q_bloom_prune_join():
            return entry._q_bloom_prune_join(spark, sf_dir).agg(F.count("*"))

        def q_simplify_collapse():
            return entry._q_simplify_collapse(spark, sf_dir).agg(F.count("*"))

        def q_marching_squares():
            return entry._q_marching_squares(spark, sf_dir).agg(F.sum("n_segments"))

        # round-3 session-4 additions: semantic dedup, distance/bbox range
        # joins, polygon metrics, histogram quantiles, incremental tile diff
        def q_semantic_dedup():
            # bench the PRODUCTION clustered mode (n_centroids ~ sqrt(N));
            # the driver query's exact single-cluster mode exists for the
            # all-pairs oracle and is quadratic by design
            from open_vector_tile_spark.operators.semdedup import semantic_dedup

            emb = entry._load(spark, sf_dir, "embeddings")
            return semantic_dedup(emb, threshold=0.4, n_centroids=16).agg(
                F.sum("keep")
            )

        def q_distance_join():
            return entry._q_distance_join(spark, sf_dir).agg(F.count("*"))

        def q_bbox_join():
            return entry._q_bbox_join(spark, sf_dir).agg(F.count("*"))

        def q_polygon_metrics():
            return entry._q_polygon_metrics(spark, sf_dir).agg(F.sum("area"))

        def q_hist_quantile():
            return entry._q_hist_quantile(spark, sf_dir).agg(F.sum("est"))

        def q_tile_diff():
            return entry._q_tile_diff(spark, sf_dir).agg(F.sum("n_inserted"))

        def q_geocode_tile():
            return entry._q_geocode_tile(spark, sf_dir).agg(F.sum("n_pages"))

        def q_label_cull():
            return entry._q_label_cull(spark, sf_dir).agg(F.count("*"))

        def q_rasterize():
            return entry._q_rasterize(spark, sf_dir).agg(F.sum("n_cells"))

        def q_collocations():
            return entry._q_collocations(spark, sf_dir).agg(F.sum("n_ab"))

        def q_geo_fallback():
            return entry._q_geo_fallback(spark, sf_dir).agg(F.sum("n_pages"))

        def q_crawl_schedule():
            return entry._q_crawl_schedule(spark, sf_dir).agg(F.max("wave"))

        def q_redirect_resolve():
            return entry._q_redirect_resolve(spark, sf_dir).agg(F.sum("n_hops"))

        # round-3 session-6 additions: web graph (links -> hosts -> rank),
        # grid DBSCAN, polygon dissolve
        def q_pagerank():
            return entry._q_pagerank(spark, sf_dir).agg(F.sum("rank"))

        def q_link_extract():
            return entry._q_link_extract(spark, sf_dir).agg(F.count("*"))

        def q_host_rank():
            return entry._q_host_rank(spark, sf_dir).agg(F.sum("rank"))

        def q_spatial_cluster():
            return entry._q_spatial_cluster(spark, sf_dir).agg(F.count("cluster"))

        def q_dissolve():
            return entry._q_dissolve(spark, sf_dir).agg(F.sum("x1"))

        # round-3 session-10 additions: LM perplexity gate, map matching,
        # phrase search, trained classifier, trajectory gate, line anchor,
        # BFS crawl radius, convex hull, adaptive tiling, boilerplate
        def q_lm_perplexity():
            return entry._q_lm_perplexity(spark, sf_dir).agg(F.sum("n_bigrams"))

        def q_snap_match():
            return entry._q_snap_match(spark, sf_dir).agg(F.count("*"))

        def q_phrase_hits():
            return entry._q_phrase_hits(spark, sf_dir).agg(F.sum("n_matches"))

        def q_quality_classifier():
            return entry._q_quality_classifier(spark, sf_dir).agg(F.sum("keep"))

        def q_track_gate():
            return entry._q_track_gate(spark, sf_dir).agg(F.sum("implausible"))

        def q_line_anchor():
            return entry._q_line_anchor(spark, sf_dir).agg(F.sum("total_len"))

        def q_crawl_radius():
            return entry._q_crawl_radius(spark, sf_dir).agg(F.sum("hops"))

        def q_hull_extract():
            return entry._q_hull_extract(spark, sf_dir).agg(F.count("*"))

        def q_adaptive_tiles():
            return entry._q_adaptive_tiles(spark, sf_dir).agg(F.sum("n_points"))

        def q_boilerplate():
            return entry._q_boilerplate(spark, sf_dir).agg(F.sum("n_kept"))

        out.update(
            extract_text=q_extract_text,
            asof_join=q_asof_join,
            sessionize=q_sessionize,
            det_sample=q_det_sample,
            tile_pyramid=q_tile_pyramid,
            merge_overlay=q_merge_overlay,
            polygon_ingest_dist=q_polygon_ingest_dist,
            spatial_join_dist=q_spatial_join_dist,
            line_dedup=q_line_dedup,
            dedup_clusters=q_dedup_clusters,
            gopher_filter=q_gopher_filter,
            url_dedup=q_url_dedup,
            decontaminate=q_decontaminate,
            weighted_sample=q_weighted_sample,
            pii_redact=q_pii_redact,
            repetition=q_repetition,
            corpus_pipeline=q_corpus_pipeline,
            mix_sample=q_mix_sample,
            dedup_apply=q_dedup_apply,
            pack_sequences=q_pack_sequences,
            kmv_distinct=q_kmv_distinct,
            bm25=q_bm25,
            zorder_layout=q_zorder_layout,
            chunk_emit=q_chunk_emit,
            epoch_shuffle=q_epoch_shuffle,
            clip_lines=q_clip_lines,
            hex_assign=q_hex_assign,
            hll_distinct=q_hll_distinct,
            interval_join=q_interval_join,
            tfidf_vectors=q_tfidf_vectors,
            bloom_prune_join=q_bloom_prune_join,
            simplify_collapse=q_simplify_collapse,
            marching_squares=q_marching_squares,
            semantic_dedup=q_semantic_dedup,
            distance_join=q_distance_join,
            bbox_join=q_bbox_join,
            polygon_metrics=q_polygon_metrics,
            hist_quantile=q_hist_quantile,
            tile_diff=q_tile_diff,
            geocode_tile=q_geocode_tile,
            label_cull=q_label_cull,
            rasterize=q_rasterize,
            collocations=q_collocations,
            geo_fallback=q_geo_fallback,
            crawl_schedule=q_crawl_schedule,
            redirect_resolve=q_redirect_resolve,
            pagerank=q_pagerank,
            link_extract=q_link_extract,
            host_rank=q_host_rank,
            spatial_cluster=q_spatial_cluster,
            dissolve=q_dissolve,
            lm_perplexity=q_lm_perplexity,
            snap_match=q_snap_match,
            phrase_hits=q_phrase_hits,
            quality_classifier=q_quality_classifier,
            track_gate=q_track_gate,
            line_anchor=q_line_anchor,
            crawl_radius=q_crawl_radius,
            hull_extract=q_hull_extract,
            adaptive_tiles=q_adaptive_tiles,
            boilerplate=q_boilerplate,
        )
    return out


def run_session(cores: int, sf_dir: str) -> dict[str, float]:
    """Headline timings: per-query MIN over SPARK_GRAFT_BENCH_PASSES (default
    3) passes in one session.  The co-tenant host flips calm<->loaded on
    minute timescales (BENCH.md forensics); a single-shot suite measures the
    window it lands in, min-of-N measures the engine (pass 1 additionally
    pays one-time JVM/codegen/python-worker warmup)."""
    from open_vector_tile_spark.plans import get_spark

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    spark = get_spark(f"bench-{cores}", cores=cores)
    try:
        queries = build_queries(spark, sf_dir)
        timings: dict[str, float] = {}
        for _ in range(passes):
            for name, fn in queries.items():
                t0 = time.perf_counter()
                fn().collect()
                dt = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
            # several queries localCheckpoint (bm25/tfidf postings,
            # pipeline gates); each pass rebuilds them, and the JVM only
            # frees the old checkpointed RDD blocks after a GC notices the
            # dropped references — nudge both sides so pass N+1 doesn't
            # measure pass N's storage pressure (BENCH.md bm25 forensics)
            import gc

            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        return timings
    finally:
        spark.stop()


SCALING_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "4000000"))
# corpus lives in tmpfs: the VM's virtual disk reads at ~20MB/s cold, which
# would otherwise dominate wall time and mask compute scaling entirely
_SCALING_BASE = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
SCALING_DATA = f"{_SCALING_BASE}/ovt_bench_pages_{SCALING_ROWS}"


def _ensure_scaling_corpus() -> None:
    """Deterministic 1M-row pages corpus (seeded pure-function generator),
    written once; identical bytes for both parallelism levels."""
    if os.path.isdir(SCALING_DATA):
        return
    from open_vector_tile_spark.plans import get_spark
    from open_vector_tile_spark.sources import pages_spark

    spark = get_spark("scale-gen", cores=CPUS)
    try:
        pages_spark(spark, SCALING_ROWS, partitions=64).write.mode("overwrite").parquet(
            SCALING_DATA
        )
    finally:
        spark.stop()


def _scale_measure(cores: int) -> dict:
    """One pinned measurement (invoked as a subprocess:
    ``taskset -c 0..N-1 python bench.py --scale-measure N``).

    Subprocess isolation matters twice over: the JVM gateway persists across
    SparkSessions within a python process (a second session would inherit the
    first's CPU affinity), and local[N] alone is NOT an N-core proxy — the
    JVM's shuffle/GC/netty threads happily use every core on the box unless
    the process tree is pinned."""
    from pyspark.sql import functions as F
    from open_vector_tile_spark.functions.text import geoparse
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark(f"scale-{cores}", cores=cores)
    try:
        pages = spark.read.parquet(SCALING_DATA)

        path = os.environ.get("SPARK_GRAFT_SCALING_PATH", "generic")
        # Input cardinality is invariant across passes and parallelism
        # levels — count it ONCE outside the timed region so the pipeline
        # path's measured seconds contain only pipeline work (rows basis
        # for this path = input pages pushed end-to-end; the per-query
        # paths report output features instead, by design).
        pipeline_rows = pages.count() if path == "pipeline" else None

        def job(src, n_rows=None):
            if path == "cpuspark":
                # pure-CPU Spark control: JVM sha2 chain over a range — no
                # shuffle, no parquet, ~zero memory traffic.  If THIS scales
                # at the cpu ceiling while the tile job is flat, Spark and
                # the plan are fine and the gap is the box's memory bus.
                return (
                    spark.range(0, 24_000_000, 1, numPartitions=3 * cores)
                    .select(
                        F.sha2(
                            F.sha2(F.col("id").cast("string"), 256), 256
                        ).alias("h")
                    )
                    .agg(
                        F.count("*").alias("rows"),
                        # force h's evaluation (count(*) alone lets Catalyst
                        # prune the sha2 away entirely)
                        F.sum(F.crc32(F.col("h"))).cast("long").alias("tiles"),
                    )
                )
            pts = geoparse(src)
            if path == "pipeline":
                # FLAGSHIP end-to-end north-star job: geoparse -> cell
                # assign + two-phase polygon join -> kNN POI anchors ->
                # columnar featurize -> bulk OVT encode -> tileset shard
                # write.  One number per parallelism level for the whole
                # pipeline, not per-query minima.  The chain itself is
                # single-sourced in benchjobs.build_pipeline_chain —
                # tools/probe_pipeline_stages.py times cumulative cuts of
                # the SAME definition, so its stage deltas cannot drift
                # from the job published here.
                import shutil

                from open_vector_tile_spark.benchjobs import build_pipeline_chain
                from open_vector_tile_spark.sources.tileset import (
                    OvtTilesetDataSource,
                )

                spark.dataSource.register(OvtTilesetDataSource)
                tiles = build_pipeline_chain(spark, src, cores)
                out_dir = f"{_SCALING_BASE}/ovt_pipeline_out_{cores}"

                class _PipelineJob:
                    """Write is the action.  Deleting the previous pass's
                    output (prepare) and the read-back tile count (finalize)
                    are NOT pipeline work — the measure loop runs them
                    outside the timed region so the published rows/sec
                    contains only geoparse -> join -> kNN -> encode ->
                    shard-write."""

                    def prepare(self):
                        shutil.rmtree(out_dir, ignore_errors=True)

                    def collect(self):
                        from open_vector_tile_spark.benchjobs import (
                            write_pipeline_tiles,
                        )

                        write_pipeline_tiles(tiles, out_dir)
                        got = n_rows if n_rows is not None else src.count()
                        return [{"rows": got, "tiles": None}]

                    def finalize(self, res):
                        from open_vector_tile_spark.benchjobs import (
                            read_back_tile_count,
                        )

                        res[0]["tiles"] = read_back_tile_count(spark, out_dir)
                        return res

                return _PipelineJob()
            if path in ("fast", "verify"):
                # shared with tools/submit_scaling.py — one job definition
                # for both scaling tools (BENCH.md compares their numbers)
                from open_vector_tile_spark.benchjobs import build_tile_bench_job

                return build_tile_bench_job(spark, src, path, cores)
            from open_vector_tile_spark.operators import encode_tiles, points_to_features
            from open_vector_tile_spark.operators.tiler import LayerSpec

            feats = points_to_features(
                pts, zoom=10, layer="pages", extent=4096, props_cols=["url", "lang"]
            )
            specs = {"pages": LayerSpec(extent=4096, shape={"url": "string", "lang": "string"})}
            return encode_tiles(feats, specs=specs, partitions=3 * cores).agg(
                F.count("*").alias("tiles"), F.sum("n_features").alias("rows")
            )

        # warmup slice pass (JIT/codegen/Arrow/python-worker forks), then
        # best of 2 measured full passes.  Job construction, output-dir
        # cleanup (prepare) and result verification (finalize) happen
        # outside the timed region — only the action is measured.
        wj = job(pages.limit(20000), n_rows=20000)
        if hasattr(wj, "prepare"):
            wj.prepare()
        wj.collect()
        best = None
        for _ in range(2):
            j = job(pages, n_rows=pipeline_rows)
            if hasattr(j, "prepare"):
                j.prepare()
            t0 = time.perf_counter()
            res = j.collect()
            dt = time.perf_counter() - t0
            if hasattr(j, "finalize"):
                res = j.finalize(res)
            if best is None or dt < best[0]:
                best = (dt, res)
        dt, res = best
        return {
            "sec": round(dt, 3),
            "rows_per_sec": round(int(res[0]["rows"]) / dt, 1),
            "tiles": int(res[0]["tiles"]),
        }
    finally:
        spark.stop()


def _host_control() -> float:
    """Single-core pure-python yardstick (seconds; ~1 s calm).  Recorded
    alongside each scaling level so a noisy-co-tenant window is visible in
    the artifact instead of silently poisoning the ratio."""
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 3)


def _control_work(kind: str) -> None:
    """Fixed work unit for the ceiling controls."""
    if kind == "cpu":
        s = 0
        for i in range(20_000_000):  # pure register arithmetic, ~2-4 s
            s += i * i
    else:  # memstream: stream a 64 MB buffer 20x (bandwidth-bound)
        import numpy as np

        buf = np.ones(8_000_000, dtype=np.float64)
        s = 0.0
        for _ in range(20):
            s += float(buf.sum())


def _control_measure(kind: str, n: int) -> dict:
    """n pinned processes x one work unit -> wall sec + throughput."""
    import multiprocessing as mp

    procs = [mp.Process(target=_control_work, args=(kind,)) for _ in range(n)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    dt = time.perf_counter() - t0
    return {"sec": round(dt, 3), "units_per_sec": round(n / dt, 4)}


def _control_ceilings(levels: tuple = (8, 32)) -> dict:
    """Same-window scaling ceilings: the identical fixed work unit run as N
    then 4N taskset-pinned processes, for (a) pure-CPU and (b) memory-stream
    work.  The engine job's achievable efficiency on THIS box lies between
    the two (its compute/traffic mix); publishing them from the same
    measurement window separates box ceiling from plan quality."""
    import subprocess

    me = os.path.abspath(__file__)
    lo, hi = levels
    out = {}
    for kind in ("cpu", "memstream"):
        lv = {}
        for n in levels:
            cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable, me,
                   "--control-measure", kind, str(n)]
            r = subprocess.run(cmd, capture_output=True, text=True)
            lv[n] = json.loads(r.stdout.strip().splitlines()[-1])
        eff = (lv[hi]["units_per_sec"] / lv[lo]["units_per_sec"]) / (hi / lo)
        out[kind] = {
            f"local[{lo}]": lv[lo], f"local[{hi}]": lv[hi],
            "efficiency": round(eff, 3),
        }
    return out


def run_scaling(sf_dir: str) -> dict:
    """North-rule two-cluster-size evidence: the identical geoparse ->
    spatial-shuffle -> OVT-encode job at 8 vs 32 PINNED cores over the same
    deterministic corpus.  efficiency = (throughput32/throughput8)/4.
    Levels interleaved over 2 rounds (time-varying host noise), best wall
    per level; each measurement is a taskset-pinned subprocess."""
    import subprocess

    _ensure_scaling_corpus()
    best: dict[int, dict] = {}
    me = os.path.abspath(__file__)
    # interleaved rounds, best wall per level: co-tenant noise on this VM
    # flips calm<->loaded on minute timescales, so each level's BEST across
    # rounds estimates its calm-host value; the published efficiency is the
    # ratio of those bests (single-shot pairs are a lottery — see BENCH.md)
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))
    # N and 4N pinned cores; default 8->32.  SPARK_GRAFT_SCALING_LEVELS=2,8
    # moves the pair to the 2->8 axis, where plan quality is visible on
    # this box (8->32 saturates the shared memory subsystem for ANY job —
    # see the control ceilings and BENCH.md forensics).
    levels = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
    )
    # explicit raise (NOT assert: `python -O` strips asserts and a malformed
    # pair would silently publish a wrong efficiency); the divisor below is
    # derived from the actual ratio, so any valid N<M pair reports honestly
    if len(levels) != 2 or levels[1] <= levels[0] or levels[0] < 1:
        raise ValueError(
            f"SPARK_GRAFT_SCALING_LEVELS must be 'N,M' with M > N >= 1, got {levels}"
        )
    for _ in range(rounds):
        for cores in levels:
            cmd = [
                "taskset", "-c", f"0-{cores - 1}",
                sys.executable, me, "--scale-measure", str(cores),
            ]
            env = dict(os.environ, SPARK_GRAFT_SCALING_ROWS=str(SCALING_ROWS))
            ctl = _host_control()
            out = subprocess.run(cmd, capture_output=True, text=True, env=env)
            try:
                r = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception:
                sys.stderr.write(out.stderr[-2000:])
                raise
            r["host_control_sec"] = ctl
            if cores not in best or r["sec"] < best[cores]["sec"]:
                best[cores] = r
    out = {f"local[{c}]": r for c, r in best.items()}
    t_lo = best[levels[0]]["rows_per_sec"]
    t_hi = best[levels[1]]["rows_per_sec"]
    out["scaling_efficiency"] = round((t_hi / t_lo) / (levels[1] / levels[0]), 3)
    out["rows"] = SCALING_ROWS
    out["pinned"] = True
    out["path"] = os.environ.get("SPARK_GRAFT_SCALING_PATH", "generic")
    out["controls"] = _control_ceilings(levels)
    cpu_ceiling = out["controls"]["cpu"]["efficiency"]
    if cpu_ceiling > 0:
        out["efficiency_vs_cpu_ceiling"] = round(
            out["scaling_efficiency"] / cpu_ceiling, 3
        )
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scale-measure":
        # the tmpfs corpus does not survive reboots: regenerate on demand
        # (idempotent) so a fresh-session sampler run doesn't silently
        # fail every measurement with PATH_NOT_FOUND
        _ensure_scaling_corpus()
        print(json.dumps(_scale_measure(int(sys.argv[2]))))
        return
    if len(sys.argv) > 3 and sys.argv[1] == "--control-measure":
        print(json.dumps(_control_measure(sys.argv[2], int(sys.argv[3]))))
        return
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # SPARK_GRAFT_SKIP_HEADLINE=1: scaling-only run (keeps the measurement
    # window short so a calm-host slot isn't wasted on the suite)
    if os.environ.get("SPARK_GRAFT_SKIP_HEADLINE") == "1":
        timings = {}
    else:
        timings = run_session(CPUS, SF_DIR)
    _HEADLINE = (
        "tile_encode", "spatial_join", "knn", "dedup_minhash",
        "agg_q1", "cosine_topk", "gridding",
    )
    result = {
        "metric": "headline_suite_total",
        # extended (SPARK_GRAFT_BENCH_EXTENDED) queries are reported but kept
        # out of the total so the metric stays comparable across rounds
        "value": round(sum(v for k, v in timings.items() if k in _HEADLINE), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # same-window host yardstick (~1 s calm, see BENCH.md co-tenant
        # forensics): makes a noisy measurement window visible IN the
        # artifact instead of silently poisoning per-query seconds
        "host_control_sec": _host_control(),
    }
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING") == "1":
        result["scaling"] = run_scaling(SF_DIR)
    else:
        # Default runs still carry the north-rule N->4N number: attach the
        # committed spark-submit evidence of record (separate executor JVMs,
        # tools/submit_scaling.py) with provenance instead of re-measuring
        # the multi-minute job on every bench invocation.
        rec = _scaling_of_record()
        if rec is not None:
            result["scaling_of_record"] = rec
    print(json.dumps(result))


def _scaling_of_record(path: "str | None" = None) -> "dict | None":
    """Best/median/latest submit_scaling_summary across the committed ledger.

    This is RECORDED evidence (spark-submit --py-files on local-cluster,
    i.e. real separate executor JVMs at 2 and 8 executors), not a fresh
    measurement; re-measure with SPARK_GRAFT_BENCH_SCALING=1 or
    tools/submit_scaling.py.  The ledger keeps EVERY run (including noisy
    co-tenant windows), so the record is reported best-of-N with the median
    and latest alongside for honesty.  Full forensics in BENCH.md."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools", "scaling_submit_r4.jsonl",
        )
    rows = []
    n_debug = 0
    try:
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if row.get("kind") == "protocol_marker":
                    # everything before the marker is protocol-debugging
                    # (see the marker's note + BENCH.md round 4): excluded
                    # from the record but kept in the ledger for audit
                    n_debug += len(rows)
                    rows = []
                elif (
                    row.get("kind") == "submit_scaling_summary"
                    and isinstance(row.get("scaling_efficiency"), (int, float))
                    # the number of record is the FAST path series; other
                    # paths (pipeline/verify) ledger separately, but guard
                    # here too so a stray summary can't pollute the record
                    and row.get("path", "fast") == "fast"
                ):
                    rows.append(row)
    except OSError:
        return None
    if not rows:
        return None
    best = max(rows, key=lambda r: r["scaling_efficiency"])
    effs = sorted(r["scaling_efficiency"] for r in rows)
    median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    # throughput keys are level-parameterized (execs_{N}_best_rows_per_sec)
    # — copy whatever levels the best summary actually measured instead of
    # hardcoding 2/8, so a non-default --execs run reports real numbers
    throughput = {
        k: v
        for k, v in best.items()
        if k.startswith("execs_") and k.endswith("_best_rows_per_sec")
    }
    return {
        "recorded": True,  # committed ledger, not measured in this run
        "source": "tools/scaling_submit_r4.jsonl (see BENCH.md round 4)",
        "launcher": best.get("launcher"),
        "rows": best.get("rows"),
        **throughput,
        "scaling_efficiency": best.get("scaling_efficiency"),
        "policy": "best-of-N across committed ledger (all runs kept; "
                  "pre-protocol-marker debugging runs excluded)",
        "n_runs": len(rows),
        "n_debug_runs_excluded": n_debug,
        "median_efficiency": median,
        "latest_efficiency": rows[-1]["scaling_efficiency"],
    }


if __name__ == "__main__":
    main()

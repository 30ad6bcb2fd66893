"""Corpus-layer scale probe: run the webtext operators on a MILLION-row
synthetic corpus generated entirely executor-side (spark.range + column
exprs — zero driver materialization) and report per-op throughput at two
parallelism levels.

This is the corpus-side counterpart of the tile-path scaling evidence in
BENCH.md: same box, pinned thread counts, rows/sec per operator.

Usage:
    python tools/corpus_scale_probe.py [--rows 1000000] [--cores 8,16]

Prints one JSON line per (cores) level.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = (
    "the of and to in value table row scan key hash part merge sort "
    "window batch fast slow spark line agg join filter shuffle codec tile "
    "grid cell layer"
).split()


def synth_docs(spark, n_rows: int):
    """(doc_id, text, lang, n_chars): ~60-word docs, executor-generated.
    ~5% of docs are exact duplicates of doc_id-1 (dedup work to find); word
    choice is a per-position hash so text is deterministic."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    src = F.when(F.col("doc_id") % 20 == 7, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    words = F.transform(
        F.sequence(F.lit(0), (F.pmod(src * 31, F.lit(40)) + 20).cast("int")),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            (F.pmod(F.xxhash64(src * F.lit(1009) + i), F.lit(len(VOCAB))) + 1).cast(
                "int"
            ),
        ),
    )
    return base.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
    ).withColumn("n_chars", F.length("text"))


def run_level(cores: int, n_rows: int) -> dict:
    from pyspark.sql import functions as F

    from open_vector_tile_spark.functions.sampling import (
        weighted_sample,
        weighted_sample_per_group,
    )
    from open_vector_tile_spark.functions.text import gopher_metrics, redact_pii
    from open_vector_tile_spark.operators.dedup import (
        dedup_lines,
        exact_dedup,
        minhash_lsh_candidates,
    )
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark(f"corpus-scale-{cores}", cores=cores)
    try:
        docs = synth_docs(spark, n_rows).repartition(cores * 4).localCheckpoint(
            eager=True
        )
        out: dict = {"cores": cores, "rows": n_rows, "ops": {}}

        def bench(name, fn, passes=2):
            best = None
            for _ in range(passes):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out["ops"][name] = {
                "sec": round(best, 2),
                "rows_per_sec": round(n_rows / best),
            }

        bench("exact_dedup", lambda: exact_dedup(docs).count())
        bench(
            "minhash_lsh_candidates",
            lambda: minhash_lsh_candidates(docs).count(),
        )
        m = gopher_metrics(F.col("text"))
        bench(
            "gopher_filter",
            lambda: docs.filter(
                (m["n_words"] >= 30) & (m["stop_hits"] >= 1)
            ).count(),
        )
        bench(
            "pii_redact",
            lambda: docs.select(
                F.sum(F.length(redact_pii(F.col("text"))))
            ).collect(),
        )
        bench(
            "weighted_sample",
            lambda: weighted_sample(
                docs, 1000, F.col("n_chars"), F.col("doc_id")
            ).count(),
        )
        bench(
            "mix_sample",
            lambda: weighted_sample_per_group(
                docs, 1000, F.col("n_chars"), F.col("doc_id"), "lang"
            ).count(),
        )
        # line dedup on 3-line synthetic docs (hash-keyed scale mode)
        synth3 = docs.select(
            "doc_id",
            F.concat_ws("\n", F.col("text"), F.col("lang"), F.col("text")).alias(
                "text"
            ),
        )
        bench("line_dedup", lambda: dedup_lines(synth3).agg(F.sum("n_removed")).collect())

        # round-3 session-2 ops
        from open_vector_tile_spark.functions.sampling import epoch_shuffle
        from open_vector_tile_spark.functions.sketch import kmv_distinct
        from open_vector_tile_spark.operators.packing import (
            emit_chunks,
            pack_sequences,
        )
        from open_vector_tile_spark.operators.retrieval import bm25_topk

        tokens = docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        bench(
            "kmv_distinct",
            lambda: kmv_distinct(tokens, ["lang"], "tok", k=256).count(),
        )
        bench(
            "bm25",
            lambda: bm25_topk(docs, ["spark", "shuffle", "codec"], k=20).count(),
        )
        bench(
            "epoch_shuffle",
            lambda: epoch_shuffle(docs.select("doc_id"), F.col("doc_id"), seed=1)
            .agg(F.sum("epoch_rank"))
            .collect(),
        )
        withtok = docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n")
        )
        bench(
            "pack_chunks",
            lambda: emit_chunks(
                pack_sequences(withtok, "n", seq_len=2048), "n", seq_len=2048
            )
            .agg(F.sum("n_tok"))
            .collect(),
        )
        return out
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", default="8,16")
    args = ap.parse_args()
    for cores in (int(c) for c in args.cores.split(",")):
        print(json.dumps(run_level(cores, args.rows)), flush=True)


if __name__ == "__main__":
    main()

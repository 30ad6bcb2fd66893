"""Dump explain('formatted') for the extended queries touched in the
round-6 fan-out batches to plans/r06/<query>_<tag>.txt.

Usage: PYTHONPATH=<tree> python tools/dump_plans_r6_ext.py <tag> [sf_dir]
— run once with PYTHONPATH at the pre-change tree (tag=before) and once on
the final tree (tag=after); the judge checks the RoundRobinPartitioning
exchange claims against these files.
"""
from __future__ import annotations

import os
import sys

if not os.environ.get("PYTHONPATH"):
    sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

QUERIES = [
    "areal_interp", "s2json_roundtrip", "media_meta", "media_stats",
    "frame_sample", "media_resize", "span_dedup", "dup_spans", "cdc_dedup",
    "containment_dups", "main_content", "corpus_filter", "gopher_filter",
    "pii_redact", "sentences", "tfidf_vectors",
]


def main():
    import __spark_entry__ as entry
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark("plans-r6-ext", cores=32)
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in QUERIES:
        df = qs[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{out_dir}/{name}_{TAG}.txt", "w") as f:
            f.write(txt)
        print("wrote", name, TAG)
    spark.stop()


if __name__ == "__main__":
    main()

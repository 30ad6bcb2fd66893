"""Smoke tests for the shared scaling-job factory (benchjobs.py).

bench.py and tools/submit_scaling.py both measure this job — BENCH.md
compares their numbers, so its schema and semantics must stay pinned.
"""

from __future__ import annotations

import pytest

from open_vector_tile_spark.benchjobs import build_tile_bench_job


@pytest.fixture(scope="module")
def pages(spark):
    from open_vector_tile_spark.sources import pages_spark

    return pages_spark(spark, 2000, partitions=4).localCheckpoint()


def test_fast_path_counts_features(spark, pages):
    row = build_tile_bench_job(spark, pages, "fast", 4).collect()[0]
    assert set(row.asDict()) == {"tiles", "rows"}
    assert row["tiles"] > 0
    assert row["rows"] >= row["tiles"]  # >=1 feature per tile


def test_verify_path_decodes_every_tile(spark, pages):
    fast = build_tile_bench_job(spark, pages, "fast", 4).collect()[0]
    ver = build_tile_bench_job(spark, pages, "verify", 4).collect()[0]
    # the decode walk must visit exactly the tiles/features fast counted
    assert ver["tiles"] == fast["tiles"]
    assert ver["rows"] == fast["rows"]
    assert ver["csum"] > 0  # geometry actually read, not optimized away


def test_unknown_path_raises(spark, pages):
    with pytest.raises(ValueError, match="unknown scaling path"):
        build_tile_bench_job(spark, pages, "bogus", 4)

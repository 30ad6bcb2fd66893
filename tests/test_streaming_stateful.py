"""Stateful streaming operators (streaming/stateful.py): cross-micro-batch
first-seen dedup via applyInPandasWithState, and watermarked windowed tile
counts.  Micro-batches are made deterministic with a parquet file source +
maxFilesPerTrigger=1 + AvailableNow."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    b1 = pd.DataFrame(
        {
            "url": ["a", "b"],
            "warc_ts": [t0, t0 + dt.timedelta(minutes=5)],
            "text": ["first a", "first b"],
        }
    )
    b2 = pd.DataFrame(
        {
            "url": ["b", "c"],
            "warc_ts": [t0 + dt.timedelta(minutes=12), t0 + dt.timedelta(minutes=14)],
            "text": ["replayed b", "first c"],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "batch1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "batch2"))
    return str(src)


def _stream(spark, src):
    return (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )


def test_first_seen_dedups_across_microbatches(spark, two_batches, tmp_path):
    from open_vector_tile_spark.streaming.stateful import first_seen

    out = first_seen(_stream(spark, two_batches), key_col="url")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT url, text FROM first_seen_t").toPandas()
    # each key exactly once, regardless of file processing order
    assert sorted(got["url"]) == ["a", "b", "c"]
    # 'a' and 'c' appear in only one batch -> their payloads are pinned
    by_url = dict(zip(got["url"], got["text"]))
    assert by_url["a"] == "first a" and by_url["c"] == "first c"
    assert by_url["b"] in ("first b", "replayed b")


def test_first_seen_resumes_from_checkpoint(spark, two_batches, tmp_path):
    """State survives a query restart: a re-run over a NEW file with an old
    key emits nothing for it (exactly-once across restarts)."""
    from open_vector_tile_spark.streaming.stateful import first_seen

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run():
        q = (
            first_seen(_stream(spark, two_batches), key_col="url")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = spark.read.parquet(sink).toPandas()
    assert sorted(first["url"]) == ["a", "b", "c"]
    b3 = pd.DataFrame(
        {
            "url": ["a", "d"],
            "warc_ts": [dt.datetime(2026, 1, 1, 1, 0, 0)] * 2,
            "text": ["replayed a", "first d"],
        }
    )
    spark.createDataFrame(b3).coalesce(1).write.parquet(two_batches + "/batch3")
    run()
    both = spark.read.parquet(sink).toPandas()
    # the restarted query emits only the genuinely new key: state survived
    assert sorted(both["url"]) == ["a", "b", "c", "d"]
    assert both.set_index("url")["text"]["a"] == "first a"


def test_windowed_tile_counts(spark, two_batches, tmp_path):
    from open_vector_tile_spark.streaming.stateful import windowed_tile_counts

    pts = _stream(spark, two_batches).select(
        "warc_ts",
        F.lit(4).alias("zoom"),
        (F.length("url") % 4).cast("long").alias("tile_x"),
        F.lit(0).cast("long").alias("tile_y"),
    )
    out = windowed_tile_counts(pts, ts_col="warc_ts", window="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT window_start, n_features FROM win_counts_t ORDER BY window_start"
    ).toPandas()
    # events at 00:00, 00:05 -> window [00:00,00:10) = 2; 00:12, 00:14 -> [00:10,00:20) = 2
    assert got["n_features"].tolist() == [2, 2]
    assert got["window_start"].iloc[0].minute == 0
    assert got["window_start"].iloc[1].minute == 10

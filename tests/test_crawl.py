"""Polite crawl scheduling (operators/crawl.py)."""

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.crawl import schedule_crawl


def _frontier(spark, rows):
    return spark.createDataFrame(rows, "host string, url string, prio long")


def test_per_host_wave_cap(spark):
    rows = [("a.com", f"https://a.com/{i}", 0) for i in range(7)]
    out = schedule_crawl(
        _frontier(spark, rows), per_host=3, stagger=1
    ).collect()
    waves = {}
    for r in out:
        waves.setdefault(r.wave, []).append(r.url)
    # 7 urls, cap 3 -> waves of 3, 3, 1, consecutive from 0
    assert sorted(len(v) for v in waves.values()) == [1, 3, 3]
    assert sorted(waves.keys()) == [0, 1, 2]


def test_priority_orders_waves(spark):
    rows = [
        ("a.com", "https://a.com/low", 1),
        ("a.com", "https://a.com/high", 9),
    ]
    out = schedule_crawl(
        _frontier(spark, rows), per_host=1, stagger=1, priority=F.col("prio")
    ).collect()
    by_url = {r.url: (r.host_rank, r.wave) for r in out}
    assert by_url["https://a.com/high"] == (1, 0)
    assert by_url["https://a.com/low"] == (2, 1)


def test_stagger_offsets_are_bounded_and_deterministic(spark):
    rows = [(f"h{i}.com", f"https://h{i}.com/x", 0) for i in range(20)]
    df = _frontier(spark, rows)
    a = schedule_crawl(df, per_host=1, stagger=4)
    b = schedule_crawl(df.repartition(5), per_host=1, stagger=4)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert all(0 <= r[-1] <= 3 for r in ra)  # single-url hosts: wave == offset
    assert len({r[-1] for r in ra}) > 1  # stagger actually spreads hosts


def test_invalid_params_rejected(spark):
    df = _frontier(spark, [("a", "u", 0)])
    with pytest.raises(ValueError, match="per_host"):
        schedule_crawl(df, per_host=0)
    with pytest.raises(ValueError, match="stagger"):
        schedule_crawl(df, stagger=0)


def test_driver_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = entry.queries()["crawl_schedule"](spark, sf).toPandas()
    want = con.execute(entry.oracle_sql()["crawl_schedule"]).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c

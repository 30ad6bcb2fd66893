"""Grid-bucket label culling (operators/labels.py)."""

from pyspark.sql import functions as F

from open_vector_tile_spark.operators.labels import cull_labels


def _cand(spark, rows):
    return spark.createDataFrame(
        rows, "tile_x long, tile_y long, id long, x long, y long, score long"
    )


def test_best_per_bucket_survives(spark):
    # two candidates in the same 256-bucket: higher score wins
    rows = [(0, 0, 1, 10, 10, 5), (0, 0, 2, 200, 200, 9), (0, 0, 3, 300, 10, 1)]
    out = cull_labels(_cand(spark, rows), spacing=256, per_tile_cap=8).collect()
    got = {(r.id, r.rank) for r in out}
    assert got == {(2, 1), (3, 2)}  # id 1 culled by id 2's bucket win


def test_score_tie_lowest_id_wins(spark):
    rows = [(0, 0, 9, 0, 0, 7), (0, 0, 4, 1, 1, 7)]
    out = cull_labels(_cand(spark, rows), spacing=256, per_tile_cap=8).collect()
    assert [r.id for r in out] == [4]


def test_per_tile_cap_applies_after_bucketing(spark):
    # 5 separate buckets in one tile, cap 3: top-3 scores kept, ranked
    rows = [(1, 1, i, i * 300, 0, 10 + i) for i in range(5)]
    out = (
        cull_labels(_cand(spark, rows), spacing=256, per_tile_cap=3)
        .orderBy("rank")
        .collect()
    )
    assert [r.id for r in out] == [4, 3, 2]
    assert [r.rank for r in out] == [1, 2, 3]


def test_tiles_independent_and_deterministic_under_repartition(spark):
    rows = [
        (tx, ty, tx * 100 + ty * 10 + i, (i * 97) % 4096, (i * 53) % 4096, (i * 31) % 11)
        for tx in range(3)
        for ty in range(3)
        for i in range(20)
    ]
    df = _cand(spark, rows)
    a = cull_labels(df, spacing=512, per_tile_cap=4)
    b = cull_labels(df.repartition(13), spacing=512, per_tile_cap=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every tile respects the cap
    caps = a.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 4 for r in caps)


def test_driver_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    got = entry.queries()["label_cull"](spark, sf).toPandas()
    want = con.execute(entry.oracle_sql()["label_cull"]).df()
    assert list(got.columns) == list(want.columns)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c

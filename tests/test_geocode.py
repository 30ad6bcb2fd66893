"""Gazetteer toponym geocoding (operators/geocode.py)."""

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.geocode import geocode_toponyms


@pytest.fixture(scope="module")
def gaz(spark):
    # two places share the ambiguous term 'springfield'; population prior
    # must pick place 2.  'rome' belongs to one place only.
    rows = [
        ("springfield", 1, 30_000, 39.75, -89.5),
        ("springfield", 2, 170_000, 42.0, -72.5),
        ("rome", 3, 2_800_000, 41.75, 12.5),
        ("utica", 4, 60_000, 43.0, -75.25),
    ]
    return spark.createDataFrame(
        rows, "term string, place_id long, population long, lat double, lon double"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_population_breaks_term_ambiguity(spark, gaz):
    docs = _docs(spark, [(1, "meeting in Springfield next week")])
    out = geocode_toponyms(docs, gaz).collect()
    assert len(out) == 1
    assert out[0].place_id == 2 and out[0].score == 170_000
    assert (out[0].lat, out[0].lon) == (42.0, -72.5)


def test_mention_count_beats_population(spark, gaz):
    # 3 utica mentions x 60k = 180k > 1 x 170k springfield
    docs = _docs(spark, [(1, "utica utica utica springfield")])
    out = geocode_toponyms(docs, gaz).collect()
    assert out[0].place_id == 4 and out[0].score == 180_000


def test_topk_ranks_and_order(spark, gaz):
    docs = _docs(spark, [(1, "rome springfield utica")])
    out = geocode_toponyms(docs, gaz, k=3).orderBy("rank").collect()
    assert [r.place_id for r in out] == [3, 2, 4]
    assert [r.rank for r in out] == [1, 2, 3]


def test_no_hit_docs_absent_and_case_insensitive(spark, gaz):
    docs = _docs(spark, [(1, "nothing geographic here"), (2, "ROME")])
    out = geocode_toponyms(docs, gaz).collect()
    assert [r.doc_id for r in out] == [2]


def test_multi_alias_counts_sum_per_place(spark):
    # one place owning two alias terms: mentions of BOTH sum into one score
    g = spark.createDataFrame(
        [
            ("rome", 3, 1000, 41.75, 12.5),
            ("roma", 3, 1000, 41.75, 12.5),
            ("utica", 4, 2500, 43.0, -75.25),
        ],
        "term string, place_id long, population long, lat double, lon double",
    )
    docs = _docs(spark, [(1, "rome roma rome utica")])
    out = geocode_toponyms(docs, g, k=2).orderBy("rank").collect()
    # place 3: 3 mentions x 1000 = 3000 > place 4: 1 x 2500; ONE row per place
    assert [(r.place_id, r.score) for r in out] == [(3, 3000), (4, 2500)]


def test_whitespace_tokenization(spark, gaz):
    # tabs / newlines / runs of spaces all delimit tokens
    docs = _docs(spark, [(1, "rome\tutica\n\nrome   rome")])
    out = geocode_toponyms(docs, gaz, k=2).orderBy("rank").collect()
    assert [r.place_id for r in out] == [3, 4]
    assert out[0].score == 3 * 2_800_000


def test_score_tie_breaks_on_place_id(spark):
    g = spark.createDataFrame(
        [("x", 7, 500, 1.0, 2.0), ("x", 5, 500, 3.0, 4.0)],
        "term string, place_id long, population long, lat double, lon double",
    )
    docs = _docs(spark, [(1, "x")])
    out = geocode_toponyms(docs, g).collect()
    assert out[0].place_id == 5  # equal scores: lowest place_id wins


def test_shuffle_join_path_matches_broadcast(spark, gaz):
    docs = _docs(
        spark,
        [(i, "rome utica springfield rome"[: 4 + 7 * (i % 4)]) for i in range(40)],
    ).repartition(8)
    a = geocode_toponyms(docs, gaz, k=2)
    b = geocode_toponyms(docs, gaz, k=2, broadcast_gazetteer=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_driver_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    for name in ("geocode", "geocode_tile"):
        got = entry.queries()[name](spark, sf).toPandas()
        want = con.execute(entry.oracle_sql()[name]).df()
        assert list(got.columns) == list(want.columns), name
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        assert len(got) == len(want), name
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            assert gv == wv, (name, c)


def test_geo_fallback_provenance(spark):
    """Composed north-star ingest: every third doc resolves via explicit
    coordinates, the rest via the gazetteer; nothing is unlocated on the
    word-salad corpus and the oracle twin matches exactly."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    got = entry.queries()["geo_fallback"](spark, sf).toPandas()
    want = con.execute(entry.oracle_sql()["geo_fallback"]).df()
    assert list(got.columns) == list(want.columns)
    got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
    want_s = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    for c in got_s.columns:
        assert got_s[c].tolist() == want_s[c].tolist(), c
    by_src = got.groupby("src")["n_pages"].sum().to_dict()
    assert by_src.get("coord", 0) > 0 and by_src.get("gazetteer", 0) > 0
    # every doc in THIS corpus hits the gazetteer, so the reported
    # provenance split is exactly the two located classes and the total is
    # the full corpus — the denominator is never silently dropped
    assert set(by_src) == {"coord", "gazetteer"}
    assert sum(by_src.values()) == 500

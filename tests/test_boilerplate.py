"""C4-style paragraph boilerplate filter (functions/text.py)."""

import pytest

from open_vector_tile_spark.functions.text import STOPWORDS, boilerplate_filter

PROSE = "the cat sat on the mat and the dog is in the house"
MENU = "home products pricing careers blog contact imprint privacy"
SHORT = "the end"
SPAM = "click here for the best javascript in the world today friends"


def _py_filter(text, min_words=5, min_stop_pct=10, blacklist=("javascript", "lorem ipsum")):
    paras = __import__("re").split(r"\n{2,}", text)
    kept = []
    for p in paras:
        toks = [t for t in p.lower().split() if t]
        n = len(toks)
        n_stop = sum(t in STOPWORDS for t in toks)
        low = p.lower()
        if (
            n >= min_words
            and n_stop * 100 >= min_stop_pct * n
            and not any(__import__("re").search(b, low) for b in blacklist)
        ):
            kept.append(p)
    return len(paras), len(kept), "\n\n".join(kept)


def test_rules(spark):
    text = "\n\n".join([PROSE, MENU, SHORT, SPAM])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = boilerplate_filter(df).collect()[0]
    want = _py_filter(text)
    assert (r["n_paras"], r["n_kept"], r["clean_text"]) == want
    # exactly the prose paragraph survives: menu has no stopwords, SHORT
    # is under min_words, SPAM matches the blacklist
    assert r["clean_text"] == PROSE
    assert r["n_paras"] == 4 and r["n_kept"] == 1


def test_order_preserved_and_edge_cases(spark):
    prose2 = "a fine day for the beach and a walk in the park"
    text = "\n\n".join([PROSE, MENU, prose2])
    rows = [(1, text), (2, ""), (3, "\n\n")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in boilerplate_filter(df).collect()}
    assert got[1]["clean_text"] == PROSE + "\n\n" + prose2  # original order
    assert got[2]["n_kept"] == 0 and got[2]["clean_text"] == ""
    assert got[3]["n_kept"] == 0


def test_thresholds(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    # raising min_stop_pct past PROSE's stopword share drops it
    toks = PROSE.split()
    share = sum(t in STOPWORDS for t in toks) * 100 // len(toks)
    r = boilerplate_filter(df, min_stop_pct=share + 1).collect()[0]
    assert r["n_kept"] == 0
    r = boilerplate_filter(df, min_words=len(toks)).collect()[0]
    assert r["n_kept"] == 1
    r = boilerplate_filter(df, min_words=len(toks) + 1).collect()[0]
    assert r["n_kept"] == 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        boilerplate_filter(df, min_words=0)
    with pytest.raises(ValueError):
        boilerplate_filter(df, min_stop_pct=101)


def test_null_text_behaves_as_empty(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = boilerplate_filter(df).collect()[0]
    assert (r["n_paras"], r["n_kept"], r["clean_text"]) == (1, 0, "")

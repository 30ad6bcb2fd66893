"""Main-content extraction (link-density islands): python-reference parity,
boilerplate rejection, island selection and tie semantics."""

import re

import numpy as np
from pyspark.sql import functions as F

from open_vector_tile_spark.functions.text import main_content

_BLOCK = r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|blockquote)(?:\s[^>]*)?>"


def _ref(html, min_words=5, max_ld=0.33):
    s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", "", html)
    s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", "", s)
    s = re.sub(r"(?s)<!--.*?-->", "", s)
    feats = []
    for b in re.split(_BLOCK, s):
        text = re.sub(r"(?s)<[^>]*>", "", b).strip(" ")
        if text == "":
            continue
        atext = re.sub(
            r"(?s)<[^>]*>",
            "",
            "".join(re.findall(r"(?is)<a\b[^>]*>(.*?)</a\s*>", b)),
        )
        words = len(re.split(r"\s+", text))
        dens = 1.0 if not text else len(atext) / len(text)
        feats.append((text, words, words >= min_words and dens <= max_ld))
    best = (-1, 0, 0)  # start, nb, words
    cur = None  # (start, nb, words)
    for i, (_, w, c) in enumerate(feats):
        if c:
            cur = (i, 1, w) if cur is None else (cur[0], cur[1] + 1, cur[2] + w)
            if cur[2] > best[2]:
                best = cur
        else:
            cur = None
    content = (
        " ".join(t for t, _, _ in feats[best[0] : best[0] + best[1]])
        if best[1]
        else ""
    )
    return (len(feats), best[0], best[1], best[2], content)


def _run(spark, pages, **kw):
    df = spark.createDataFrame(list(pages.items()), ["id", "h"])
    out = df.select("id", main_content(F.col("h"), **kw).alias("m")).select(
        "id", "m.*"
    )
    return {
        r["id"]: (
            r["n_blocks"],
            r["best_start"],
            r["best_nblocks"],
            r["content_words"],
            r["content"],
        )
        for r in out.collect()
    }


_NAV = '<div><a href="/">Home</a> <a href="/b">Blog</a> <a href="/f">FAQ</a></div>'
_RAIL = (
    '<div><a href="/1">One</a> <a href="/2">Two</a> <a href="/3">Three</a>'
    ' <a href="/4">Four</a> <a href="/5">Five</a> rails</div>'
)


def test_main_content_matches_reference_randomized(spark):
    rng = np.random.default_rng(47)
    words = "apple berry cedar delta ember frost grove haze iris jade".split()
    pages = {}
    for i in range(30):
        parts = [_NAV]
        for _ in range(int(rng.integers(1, 6))):
            if rng.random() < 0.3:
                parts.append(_RAIL)
            n = int(rng.integers(1, 15))
            parts.append("<p>" + " ".join(rng.choice(words, n)) + "</p>")
        parts.append(_RAIL)
        pages[i] = "".join(parts)
    got = _run(spark, pages)
    for i, h in pages.items():
        assert got[i] == _ref(h), i


def test_main_content_rejects_nav_and_footer(spark):
    body = " ".join(f"w{i}" for i in range(40))
    h = _NAV + "<p>" + body + "</p>" + _RAIL
    got = _run(spark, {1: h})[1]
    assert got[4] == body  # pure article text, no nav/rail words
    assert got[3] == 40


def test_main_content_island_split_by_rail(spark):
    p1 = "<p>" + " ".join(f"a{i}" for i in range(20)) + "</p>"
    p2 = "<p>" + " ".join(f"b{i}" for i in range(8)) + "</p>"
    got_joined = _run(spark, {1: p1 + p2})[1]
    got_split = _run(spark, {1: p1 + _RAIL + p2})[1]
    assert got_joined[2] == 2 and got_joined[3] == 28  # one 2-block island
    assert got_split[2] == 1 and got_split[3] == 20  # rail breaks it


def test_main_content_tie_keeps_first_island(spark):
    p = "<p>" + " ".join(f"x{i}" for i in range(9)) + "</p>"
    q = "<p>" + " ".join(f"y{i}" for i in range(9)) + "</p>"
    got = _run(spark, {1: p + _RAIL + q})[1]
    assert got[1] == 0 and got[4].startswith("x0 ")


def test_main_content_script_style_comment_stripped(spark):
    h = (
        "<script>var x = 'one two three four five six';</script>"
        "<style>p {}</style><!-- seven eight nine ten eleven -->"
        "<p>real content words go here now</p>"
    )
    got = _run(spark, {1: h})[1]
    assert got[4] == "real content words go here now"


def test_main_content_empty_and_linkonly(spark):
    got = _run(spark, {1: "", 2: '<div><a href="/x">just a link here</a></div>'})
    assert got[1] == (0, -1, 0, 0, "")
    assert got[2][1] == -1 and got[2][4] == ""


def test_split_sentences_basic(spark):
    from open_vector_tile_spark.functions.text import split_sentences

    df = spark.createDataFrame(
        [(1, "Dr. Smith arrived. He was late! Was it raining? yes")],
        ["id", "t"],
    )
    out = df.select(split_sentences(F.col("t")).alias("s")).collect()[0]["s"]
    sents = [r["sent"] for r in out]
    assert sents == [
        "Dr. Smith arrived.",
        "He was late!",
        "Was it raining?",
        "yes",
    ]
    assert [r["words"] for r in out] == [3, 3, 3, 1]


def test_split_sentences_abbrev_and_min_words(spark):
    from open_vector_tile_spark.functions.text import split_sentences

    df = spark.createDataFrame(
        [(1, "See e.g. the chart vs. last week. Done. a")], ["id", "t"]
    )
    out = df.select(split_sentences(F.col("t"), min_words=2).alias("s")).collect()[
        0
    ]["s"]
    assert [r["sent"] for r in out] == ["See e.g. the chart vs. last week."]


def test_split_sentences_punct_runs_and_empty(spark):
    from open_vector_tile_spark.functions.text import split_sentences

    df = spark.createDataFrame([(1, "Wow!!! Really?!  "), (2, "")], ["id", "t"])
    rows = {
        r["id"]: [x["sent"] for x in r["s"]]
        for r in df.select("id", split_sentences(F.col("t")).alias("s")).collect()
    }
    assert rows[1] == ["Wow!!!", "Really?!"]
    assert rows[2] == []

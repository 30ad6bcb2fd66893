"""extract_links / resolve_href / host_edges vs a pure-python reference."""

from __future__ import annotations

import random
import re

from open_vector_tile_spark.operators.links import (
    A_TAG_PATTERN,
    extract_links,
    host_edges,
)

_PAT = re.compile(A_TAG_PATTERN)


def _ref_resolve(href: str, base: str) -> str | None:
    """Python mirror of resolve_href (no ../ resolution, by contract)."""
    if (
        re.match(r"(?i)^(javascript:|mailto:|tel:|data:)", href)
        or href.startswith("#")
        or href == ""
    ):
        return None
    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", base):
        base = "http://" + base
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)", base)
    scheme, host, path = m.group(1), m.group(2), m.group(3)
    base_dir = path[: path.rfind("/") + 1] if "/" in path else "/"
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", href):
        return href
    if href.startswith("//"):
        return scheme + ":" + href
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    return f"{scheme}://{host}{base_dir}{href}"


def _ref_links(url: str, html: str):
    out = []
    for m in _PAT.finditer(html):
        r = _ref_resolve(m.group(1), url)
        if r is not None:
            out.append((m.group(1), r, m.group(2).strip()))
    return out


def test_resolution_classes(spark):
    base = "https://www.Site.org/a/b/page.html?x=1#frag"
    html = (
        '<a href="https://ext.com/p?utm_source=z">Abs</a>'
        '<a href="//cdn.net/lib.js">Proto</a>'
        '<a href="/root/x">Root</a>'
        '<a href="rel/y">Rel</a>'
        '<a href="#top">Frag</a>'
        '<a href="javascript:void(0)">JS</a>'
        '<a href="mailto:a@b.c">Mail</a>'
        '<a href="">Empty</a>'
    )
    df = spark.createDataFrame([(1, base, html)], "doc_id long, url string, html string")
    rows = extract_links(df, normalize=False).orderBy("href").collect()
    got = {r["href"]: (r["dst_url"], r["anchor"]) for r in rows}
    assert got == {
        "https://ext.com/p?utm_source=z": ("https://ext.com/p?utm_source=z", "Abs"),
        "//cdn.net/lib.js": ("https://cdn.net/lib.js", "Proto"),
        "/root/x": ("https://www.Site.org/root/x", "Root"),
        "rel/y": ("https://www.Site.org/a/b/rel/y", "Rel"),
    }


def test_normalize_composes(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://www.Ex.COM:443/d/p", '<a href="q?utm_source=f&k=2">N</a>')],
        "doc_id long, url string, html string",
    )
    r = extract_links(df).collect()[0]
    assert r["dst_url"] == "https://ex.com/d/q?k=2"


def test_hostless_base_and_binary_html(spark):
    html = '<a href="/p">x</a>'.encode()
    df = spark.createDataFrame(
        [(1, "ex.org", bytearray(html))], "doc_id long, url string, html binary"
    )
    r = extract_links(df, normalize=False).collect()[0]
    assert r["dst_url"] == "http://ex.org/p"
    # base with no path: base_dir falls back to '/'
    df2 = spark.createDataFrame(
        [(2, "http://ex.org", '<a href="rel">x</a>')],
        "doc_id long, url string, html string",
    )
    assert extract_links(df2, normalize=False).collect()[0]["dst_url"] == (
        "http://ex.org/rel"
    )


def test_randomized_pages_match_reference(spark):
    rng = random.Random(5)
    hosts = ["a.com", "b.org", "c.net"]
    hrefs = [
        "https://x.io/abs",
        "//cdn.x.io/f",
        "/deep/p",
        "rel1",
        "sub/rel2",
        "#frag",
        "javascript:void(0)",
        "mailto:z@q.r",
        "",
        "HTTPS://UP.COM/Case",
    ]
    rows = []
    for i in range(100):
        base = f"https://{rng.choice(hosts)}/d{i % 4}/p{i}.html"
        body = "".join(
            f'<a class="c{j}" href="{rng.choice(hrefs)}" rel="x">t {i}-{j}</a>'
            for j in range(rng.randrange(0, 6))
        )
        rows.append((i, base, f"<html><body>{body}</body></html>"))
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = [
        (r["doc_id"], r["href"], r["dst_url"], r["anchor"])
        for r in extract_links(df, normalize=False)
        .orderBy("doc_id", "href", "anchor")
        .collect()
    ]
    want = sorted(
        (i, h, d, a)
        for i, u, html in rows
        for h, d, a in _ref_links(u, html)
    )
    assert got == sorted(want)


def test_host_edges(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.org/x"),
            ("https://a.com/2", "https://b.org/y"),   # same host pair -> 1 edge
            ("https://a.com/3", "https://a.com/other"),  # self host dropped
            ("nohost", "https://b.org/z"),            # unparseable src dropped
        ],
        "url string, dst_url string",
    )
    got = {(r["src_host"], r["dst_host"]) for r in host_edges(links).collect()}
    assert got == {("a.com", "b.org")}


# ---------------------------------------------------------------------------
# anchor_summary


def test_anchor_summary_counts_rank_and_fold(spark):
    from open_vector_tile_spark.operators.links import anchor_summary

    rows = [
        # 4 links to /t with anchors pooling across case/space; 2 sources
        ("p1", "https://x.org/t", "Home"),
        ("p1", "https://x.org/t", " home "),
        ("p2", "https://x.org/t", "home"),
        ("p2", "https://x.org/t", "start"),
        # empty/whitespace anchors dropped
        ("p3", "https://x.org/t", "  "),
        ("p3", "https://x.org/t", ""),
        # second target: single link
        ("p1", "https://y.org/", "Y"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    got = {
        (r["dst_url"], r["anchor"]): r
        for r in anchor_summary(df, top_k=2).collect()
    }
    home = got[("https://x.org/t", "home")]
    assert (home["cnt"], home["srcs"], home["rank"]) == (3, 2, 1)
    assert (home["n_links"], home["n_anchors"]) == (4, 2)
    start = got[("https://x.org/t", "start")]
    assert (start["cnt"], start["srcs"], start["rank"]) == (1, 1, 2)
    y = got[("https://y.org/", "y")]
    assert (y["cnt"], y["n_links"], y["n_anchors"], y["rank"]) == (1, 1, 1, 1)


def test_anchor_summary_topk_and_ties(spark):
    from open_vector_tile_spark.operators.links import anchor_summary

    rows = []
    for i, (a, n) in enumerate([("alpha", 3), ("beta", 3), ("gamma", 2), ("delta", 1)]):
        rows += [(f"s{i}-{j}", "https://z.org/", a) for j in range(n)]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    got = anchor_summary(df, top_k=3).orderBy("rank").collect()
    # tie on cnt=3 breaks alphabetically: alpha before beta; delta cut
    assert [(r["anchor"], r["rank"]) for r in got] == [
        ("alpha", 1),
        ("beta", 2),
        ("gamma", 3),
    ]
    assert all(r["n_links"] == 9 and r["n_anchors"] == 4 for r in got)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        anchor_summary(df, top_k=0)

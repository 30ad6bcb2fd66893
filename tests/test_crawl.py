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


# ------------------------------------------------------- robots exclusion


def _ref_parse(body, ua="*"):
    """Python mirror of parse_robots (group semantics, prefix rules)."""
    rules = []
    group_uas, in_ua_block, applies = [], False, False
    for raw in body.split("\n"):
        line = raw.split("#")[0].replace("\r", "").strip()
        import re

        m = re.match(r"(?i)^user-agent\s*:\s*(\S*)", line)
        if m:
            if not in_ua_block:
                group_uas = []
            in_ua_block = True
            group_uas.append(m.group(1).lower())
            applies = ua in group_uas
            continue
        in_ua_block = False
        m = re.match(r"(?i)^(allow|disallow)\s*:\s*(\S*)", line)
        if m and m.group(2) and applies:
            rules.append((m.group(1).lower(), m.group(2)))
    return rules


def _ref_allowed(path, rules):
    cands = [
        (len(p), 0 if d == "allow" else 1, p, d)
        for d, p in rules
        if path.startswith(p)
    ]
    if not cands:
        return 1, None
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    return (1 if cands[0][3] == "allow" else 0), cands[0][2]


def test_parse_robots_groups_and_noise(spark):
    from open_vector_tile_spark.operators.crawl import parse_robots

    body = (
        "User-agent: smarterbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: other\n"
        "User-agent: *\n"
        "Disallow: /private   # comment\r\n"
        "allow: /private/ok\n"
        "Disallow:\n"           # empty value -> no-op
        "\n"
        "User-agent: last\n"
        "Disallow: /hidden\n"
    )
    df = spark.createDataFrame([("h.com", body)], "host string, robots_txt string")
    got = {
        (r["directive"], r["prefix"], r["rule_len"])
        for r in parse_robots(df).collect()
    }
    # only the group containing '*' applies; comments/CR stripped; empty dropped
    assert got == {("disallow", "/private", 8), ("allow", "/private/ok", 11)}
    want = {(d, p, len(p)) for d, p in _ref_parse(body)}
    assert got == want


def test_robots_filter_longest_match_and_allow_tie(spark):
    from open_vector_tile_spark.operators.crawl import parse_robots, robots_filter

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Allow: /dup\n"
        "Disallow: /dup\n"      # equal length -> allow wins
    )
    rules = parse_robots(
        spark.createDataFrame([("h.com", body)], "host string, robots_txt string")
    )
    urls = spark.createDataFrame(
        [
            ("https://h.com/private/x",),
            ("https://h.com/private/ok/y",),
            ("https://h.com/public",),
            ("https://h.com/dup/z",),
            ("https://h.com",),            # empty path -> '/'
            ("https://other.org/private/x",),  # no rules for host
        ],
        "url string",
    )
    got = {r["url"]: (r["allowed"], r["rule"]) for r in robots_filter(urls, rules).collect()}
    assert got["https://h.com/private/x"] == (0, "/private")
    assert got["https://h.com/private/ok/y"] == (1, "/private/ok")
    assert got["https://h.com/public"] == (1, None)
    assert got["https://h.com/dup/z"] == (1, "/dup")
    assert got["https://h.com"] == (1, None)
    assert got["https://other.org/private/x"] == (1, None)


def test_robots_randomized_matches_reference(spark):
    import random

    from open_vector_tile_spark.operators.crawl import parse_robots, robots_filter

    rng = random.Random(17)
    prefixes = ["/a", "/a/b", "/a/b/c", "/x", "/x/y", "/z"]
    hosts, bodies = [], []
    for h in range(8):
        host = f"h{h}.com"
        lines = ["User-agent: bot", "Disallow: /"]
        lines += ["", "User-agent: *"]
        for _ in range(rng.randrange(1, 5)):
            d = rng.choice(["Allow", "Disallow"])
            lines.append(f"{d}: {rng.choice(prefixes)}")
        body = "\n".join(lines)
        hosts.append(host)
        bodies.append((host, body))
    rules_df = parse_robots(
        spark.createDataFrame(bodies, "host string, robots_txt string")
    )
    urls = []
    for i in range(200):
        host = rng.choice(hosts)
        path = rng.choice(prefixes + ["/a/bq", "/q", "/x/y/z/deep"])
        urls.append((f"https://{host}{path}",))
    udf = spark.createDataFrame(urls, "url string")
    got = {r["url"]: (r["allowed"], r["rule"]) for r in robots_filter(udf, rules_df).collect()}
    ref_rules = {h: _ref_parse(b) for h, b in bodies}
    for (u,) in urls:
        host = u.split("://")[1].split("/")[0]
        path = u[len("https://" + host):] or "/"
        assert got[u] == _ref_allowed(path, ref_rules[host]), u


# ---------------------------------------------------------------------------
# parse_sitemaps


def _sm_df(spark, rows):
    return spark.createDataFrame(rows, "host string, sitemap_xml string")


def test_sitemap_url_entries_all_fields(spark):
    from open_vector_tile_spark.operators.crawl import parse_sitemaps

    xml = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc>https://a.org/p1</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>  https://a.org/p2?x=1&amp;y=2  </loc></url>"
        "<url><lastmod>2026-01-03</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    got = (
        parse_sitemaps(_sm_df(spark, [("a.org", xml)]))
        .orderBy("loc")
        .collect()
    )
    assert len(got) == 2
    full, bare = got[0], got[1]
    assert full["loc"] == "https://a.org/p1"
    assert (full["lastmod"], full["changefreq"], full["priority"]) == (
        "2026-01-02",
        "daily",
        0.8,
    )
    assert full["kind"] == "url"
    # entity decoded + whitespace trimmed; absent fields are NULL not ''
    assert bare["loc"] == "https://a.org/p2?x=1&y=2"
    assert bare["lastmod"] is None and bare["changefreq"] is None
    assert bare["priority"] is None


def test_sitemap_index_children(spark):
    from open_vector_tile_spark.operators.crawl import parse_sitemaps

    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.org/sm1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.org/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    got = parse_sitemaps(_sm_df(spark, [("a.org", xml)])).orderBy("loc").collect()
    assert [r["kind"] for r in got] == ["sitemap", "sitemap"]
    assert [r["loc"] for r in got] == ["https://a.org/sm1.xml", "https://a.org/sm2.xml"]
    assert got[0]["lastmod"] == "2026-02-01"


def test_sitemap_mixed_hosts_and_randomized_parity(spark):
    """Randomized parity vs an independent python (ElementTree-free,
    regex-free) reference built from the same synthesis plan."""
    from open_vector_tile_spark.operators.crawl import parse_sitemaps

    import random

    rng = random.Random(7)
    rows, expected = [], set()
    for h in range(6):
        host = f"h{h}.net"
        parts = ["<urlset>"]
        for i in range(rng.randrange(0, 8)):
            loc = f"https://{host}/doc/{i}"
            parts.append(f"<url><loc>{loc}</loc>")
            lastmod = None
            if rng.random() < 0.5:
                lastmod = f"2026-0{1 + i % 9}-11"
                parts.append(f"<lastmod>{lastmod}</lastmod>")
            parts.append("</url>")
            expected.add((host, "url", loc, lastmod))
        if rng.random() < 0.5:
            parts.append(f"<sitemap><loc>https://{host}/more.xml</loc></sitemap>")
            expected.add((host, "sitemap", f"https://{host}/more.xml", None))
        parts.append("</urlset>")
        rows.append((host, "".join(parts)))
    got = {
        (r["host"], r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemaps(_sm_df(spark, rows)).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# detect_traps


def test_url_template_collapses_variability(spark):
    from open_vector_tile_spark.operators.crawl import url_template

    rows = [
        ("https://a.org/cal/2026/08/18",),
        ("https://a.org/cal/2027/01/02",),
        ("https://a.org/item?id=55&sort=asc",),
        ("https://a.org/item?id=99&sort=desc",),
        ("https://a.org/s/deadbeef0099cafe/page",),
        ("https://a.org/s/0123456789abcdef/page",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r[0] for r in df.select(url_template("url")).collect()]
    assert got[0] == got[1] == "https://a.org/cal/N/N/N"
    assert got[2] == got[3] == "https://a.org/item?id=&sort="
    assert got[4] == got[5] == "https://a.org/s/H/page"


def test_detect_traps_signals(spark):
    from open_vector_tile_spark.operators.crawl import detect_traps

    rows = (
        # calendar trap: 30 urls, one template
        [("trap.org", f"https://trap.org/cal/2026/{m:02d}/{d:02d}") for m, d in
         [(i // 6 + 1, i % 6 + 1) for i in range(30)]]
        # normal host: 5 distinct templates
        + [("ok.org", f"https://ok.org/page{chr(97 + i)}") for i in range(5)]
        # deep path
        + [("deep.org", "https://deep.org/" + "/".join("abcdefghij"))]
        # cycle /a/b/a/b/a
        + [("cyc.org", "https://cyc.org/a/b/a/b/a")]
    )
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["url"]: r for r in detect_traps(df, min_urls=20, max_depth=8).collect()}
    trap = [r for u, r in got.items() if "trap.org" in u]
    assert all(r["is_trap"] and r["template_urls"] == 30 for r in trap)
    ok = [r for u, r in got.items() if "ok.org" in u]
    assert all((not r["is_trap"]) and r["template_urls"] == 1 for r in ok)
    deep = got["https://deep.org/" + "/".join("abcdefghij")]
    assert deep["is_trap"] and deep["depth"] == 10 and not deep["cycle"]
    cyc = got["https://cyc.org/a/b/a/b/a"]
    assert cyc["is_trap"] and cyc["cycle"] and cyc["depth"] == 5


def test_detect_traps_validation_and_bare_host(spark):
    from open_vector_tile_spark.operators.crawl import detect_traps

    import pytest as _pytest

    df = spark.createDataFrame([("a.org", "https://a.org")], "host string, url string")
    r = detect_traps(df, min_urls=2).collect()[0]
    assert r["depth"] == 0 and not r["cycle"] and not r["is_trap"]
    with _pytest.raises(ValueError):
        detect_traps(df, min_urls=0)
    with _pytest.raises(ValueError):
        detect_traps(df, max_depth=0)


# ---------------------------------------------------------------------------
# recrawl_priority


def test_recrawl_priority_change_rates(spark):
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators.crawl import recrawl_priority

    base = 1_700_000_000
    rows = []
    # url A: 4 fetches, changes every time (3 changes / 3 obs)
    for i in range(4):
        rows.append(("A", base + i * 100, f"h{i}"))
    # url B: 4 fetches, never changes (0/3)
    for i in range(4):
        rows.append(("B", base + i * 100, "same"))
    # url C: single fetch (no observations)
    rows.append(("C", base + 50, "x"))
    df = spark.createDataFrame(rows, "url string, es long, content_hash string").select(
        "url", F.timestamp_seconds("es").alias("fetch_ts"), "content_hash"
    )
    now = base + 1000
    got = {r["url"]: r for r in recrawl_priority(df, now=now).collect()}
    a, b, c = got["A"], got["B"], got["C"]
    assert (a["n_fetches"], a["n_changes"]) == (4, 3)
    assert a["change_rate"] == pytest.approx(3.5 / 4.0)
    assert a["age_secs"] == 700.0
    assert a["priority"] == pytest.approx(700 * 3.5 / 4.0)
    assert (b["n_fetches"], b["n_changes"]) == (4, 0)
    assert b["change_rate"] == pytest.approx(0.5 / 4.0)
    assert (c["n_fetches"], c["n_changes"]) == (1, 0)
    assert c["change_rate"] == pytest.approx(0.5 / 1.0)  # one fetch: max uncertainty
    assert c["age_secs"] == 950.0
    # priorities order: changing-and-stale outranks static
    assert a["priority"] > b["priority"]
    with pytest.raises(ValueError):
        recrawl_priority(df)


def test_recrawl_priority_reverted_content_counts_both_flips(spark):
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators.crawl import recrawl_priority

    base = 1_700_000_000
    rows = [("R", base + i, h) for i, h in enumerate(["v1", "v2", "v1"])]
    df = spark.createDataFrame(rows, "url string, es long, content_hash string").select(
        "url", F.timestamp_seconds("es").alias("fetch_ts"), "content_hash"
    )
    r = recrawl_priority(df, now=base + 10).collect()[0]
    assert r["n_changes"] == 2  # v1->v2 and v2->v1 both count


def test_detect_traps_preserves_null_host_and_url(spark):
    from open_vector_tile_spark.operators.crawl import detect_traps

    df = spark.createDataFrame(
        [(None, "https://x.org/a"), ("x.org", None), ("x.org", "https://x.org/a")],
        "host string, url string",
    )
    rows = detect_traps(df, min_urls=5).collect()
    assert len(rows) == 3  # nothing silently dropped
    by = {(r["host"], r["url"]): r for r in rows}
    assert (None, "https://x.org/a") in by and ("x.org", None) in by

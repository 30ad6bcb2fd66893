"""extract_text byte-identity + as-of join / sessionize vs brute force."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.functions.text import extract_text, html_escape
from open_vector_tile_spark.operators.events import asof_join, sessionize


# ---------------------------------------------------------------------------
# extract_text
# ---------------------------------------------------------------------------


def test_extract_text_byte_identity_on_pages(spark):
    """north_rule invariant: extract_text(html) == text byte-for-byte per url
    on the crawl fixture table."""
    from open_vector_tile_spark.sources.pages import pages_spark

    pages = pages_spark(spark, 500, partitions=4)
    out = pages.select(
        "url", "text", extract_text(F.col("html")).alias("extracted")
    )
    bad = out.filter(F.col("extracted") != F.col("text")).count()
    assert bad == 0
    assert out.count() == 500


def test_extract_text_drops_script_style_comments(spark):
    html = (
        b"<html><head><script type='x'>var a = '<p>not text</p>';</script>"
        b"<style>p { color: red; }</style></head>"
        b"<body><!-- hidden --><p>keep me</p><div>and me</div></body></html>"
    )
    row = (
        spark.createDataFrame([(html,)], "html binary")
        .select(extract_text(F.col("html")).alias("t"))
        .first()
    )
    assert row["t"] == "keep meand me"


def test_extract_text_entity_roundtrip(spark):
    """html_escape then extract decodes back to the exact original bytes,
    including texts that already contain entity-looking substrings."""
    texts = ["a < b & c > d", "literal &amp; stays", 'quote " and é', "5 &lt; 6"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    built = df.select(
        "text",
        F.concat(
            F.lit("<html><body><p>"), html_escape(F.col("text")), F.lit("</p></body></html>")
        ).cast("binary").alias("html"),
    )
    out = built.select("text", extract_text(F.col("html")).alias("e")).collect()
    for r in out:
        assert r["e"] == r["text"], (r["e"], r["text"])


def test_extract_text_is_jvm_only(spark):
    """No Python eval node in the extraction plan — stays codegen-able."""
    from open_vector_tile_spark.sources.pages import pages_spark

    pages = pages_spark(spark, 10, partitions=1)
    plan = (
        pages.select(extract_text(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the page generator itself is mapInPandas; extraction must add no more
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("BatchEvalPython") == 0


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _events_pdf(n_users=7, n=400, seed=11):
    rng = random.Random(seed)
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": rng.randrange(n_users),
                "ts": t0 + dt.timedelta(seconds=rng.randrange(0, 3_000_000)),
                "kind": rng.choice(["click", "view"]),
                "value": float(i),
            }
        )
    pdf = pd.DataFrame(rows)
    # force some exact-tie timestamps across kinds for the tie rule
    pdf.loc[5, ["user_id", "ts", "kind"]] = [0, pdf.loc[4, "ts"], "view"]
    pdf.loc[4, "kind"] = "click"
    pdf.loc[4, "user_id"] = 0
    return pdf


def _brute_asof(pdf, direction="backward"):
    lefts = pdf[pdf.kind == "click"]
    rights = pdf[pdf.kind == "view"]
    out = []
    for _, l in lefts.iterrows():
        cand = rights[rights.user_id == l.user_id]
        if direction == "backward":
            cand = cand[cand.ts <= l.ts]
            if len(cand):
                best = cand.sort_values(["ts", "event_id"]).iloc[-1]
                out.append((l.event_id, best.event_id))
        else:
            cand = cand[cand.ts >= l.ts]
            if len(cand):
                best = cand.sort_values(["ts", "event_id"]).iloc[0]
                out.append((l.event_id, best.event_id))
    return sorted(out)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_bruteforce(spark, direction):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    clicks = df.filter(F.col("kind") == "click")
    views = df.filter(F.col("kind") == "view").withColumnRenamed("event_id", "view_id")
    got = asof_join(
        clicks,
        views.select("user_id", "ts", "view_id"),
        on=["user_id"],
        right_cols=["view_id"],
        direction=direction,
    )
    pairs = sorted(
        (r["event_id"], r["view_id_r"]) for r in got.select("event_id", "view_id_r").collect()
    )
    expected = _brute_asof(pdf, direction)
    # brute tie-break inside equal ts uses event_id; the operator guarantees a
    # deterministic pick but among equal-ts right rows picks by window order.
    # The fixture has unique (user, ts) per kind except the injected tie pair,
    # which has a single right candidate — so results must agree exactly.
    assert pairs == expected


def test_asof_join_tie_at_equal_ts_matches(spark):
    """A right row at exactly left.ts is a valid backward match."""
    t = dt.datetime(2024, 6, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t, "L")], "user_id bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, t, 99)], "user_id bigint, ts timestamp, rid bigint")
    got = asof_join(left, right, on=["user_id"], right_cols=["rid"]).collect()
    assert len(got) == 1 and got[0]["rid_r"] == 99 and got[0]["ts_r"] == t


def test_asof_join_single_shuffle(spark):
    """Plan shape: exactly one Exchange (on the key) feeds the window."""
    pdf = _events_pdf(n=50)
    df = spark.createDataFrame(pdf)
    clicks = df.filter(F.col("kind") == "click")
    views = df.filter(F.col("kind") == "view").select("user_id", "ts", F.col("value").alias("v"))
    plan = (
        asof_join(clicks, views, on=["user_id"], right_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_matches_bruteforce(spark):
    pdf = _events_pdf(n_users=5, n=300, seed=3)
    gap = 86400.0
    df = spark.createDataFrame(pdf)
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_seconds=gap).select("event_id", "session_id").collect()
    }
    for uid, grp in pdf.sort_values("ts").groupby("user_id"):
        sid, prev = 0, None
        for _, row in grp.iterrows():
            if prev is not None and (row.ts - prev).total_seconds() > gap:
                sid += 1
            assert got[row.event_id] == sid, (uid, row.event_id)
            prev = row.ts


def test_sessionize_gap_bound_is_exclusive(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, 1, t0),
        (1, 1, t0 + dt.timedelta(seconds=10)),       # == gap -> same session
        (2, 1, t0 + dt.timedelta(seconds=20, microseconds=1)),  # > gap -> cut
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    got = {r["event_id"]: r["session_id"] for r in sessionize(df, gap_seconds=10.0).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_sessionize_single_shuffle(spark):
    """Both window stages (lag gap-cut + running sum) share one Exchange on
    the key — no second shuffle between them."""
    pdf = _events_pdf(n=50)
    df = spark.createDataFrame(pdf)
    plan = (
        sessionize(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_join_null_right_payload_not_stitched(spark):
    """A matched right row's NULL field must stay NULL — not be back-filled
    from an OLDER right row (all payload fields come from the SAME match)."""
    from open_vector_tile_spark.operators.events import asof_join

    left = spark.createDataFrame([("u", 30)], "k string, ts int")
    right = spark.createDataFrame(
        [("u", 10, 1, "old"), ("u", 20, None, "new")],
        "k string, ts int, a int, b string",
    )
    out = asof_join(left, right, on=["k"], right_cols=["a", "b"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ts_r"] == 20 and r["b_r"] == "new"
    assert r["a_r"] is None  # NOT 1 stitched from the ts=10 row


def test_asof_join_all_null_right_payload_still_matches(spark):
    """A right row whose payload is entirely NULL is still a real match (the
    row exists at that timestamp) — DuckDB ASOF semantics."""
    from open_vector_tile_spark.operators.events import asof_join

    left = spark.createDataFrame([("u", 30)], "k string, ts int")
    right = spark.createDataFrame(
        [("u", 20, None, None)], "k string, ts int, a int, b string"
    )
    out = asof_join(left, right, on=["k"], right_cols=["a", "b"]).collect()
    assert len(out) == 1
    assert out[0]["ts_r"] == 20 and out[0]["a_r"] is None and out[0]["b_r"] is None


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


def test_interval_join_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd
    from open_vector_tile_spark.operators.events import interval_join

    rng = np.random.default_rng(17)
    lo = rng.integers(-500, 500, size=200)
    l_pdf = pd.DataFrame({"lid": range(200), "start": lo, "end": lo + rng.integers(0, 120, size=200)})
    ro = rng.integers(-500, 500, size=150)
    r_pdf = pd.DataFrame({"rid": range(150), "start": ro, "end": ro + rng.integers(0, 90, size=150)})
    out = interval_join(
        spark.createDataFrame(l_pdf), spark.createDataFrame(r_pdf), chunk=64
    ).toPandas()
    got = set(zip(out.lid, out.rid_r))
    want = {
        (lrow.lid, rrow.rid)
        for lrow in l_pdf.itertuples()
        for rrow in r_pdf.itertuples()
        if lrow.start <= rrow.end and rrow.start <= lrow.end
    }
    assert got == want
    assert len(out) == len(want)  # each pair exactly once (chunk dedup)


def test_interval_join_closed_boundary(spark):
    import pandas as pd
    from open_vector_tile_spark.operators.events import interval_join

    l_pdf = pd.DataFrame({"lid": [1], "start": [0], "end": [10]})
    r_pdf = pd.DataFrame(
        {"rid": [1, 2, 3], "start": [10, 11, -5], "end": [20, 20, 0]}
    )
    out = interval_join(
        spark.createDataFrame(l_pdf), spark.createDataFrame(r_pdf), chunk=8
    ).toPandas()
    # touching endpoints included (closed), rid=2 excluded
    assert sorted(out.rid_r) == [1, 3]


def test_interval_join_single_shuffle_per_side(spark):
    import pandas as pd
    from open_vector_tile_spark.operators.events import interval_join

    l_pdf = pd.DataFrame({"lid": range(50), "start": range(50), "end": [s + 5 for s in range(50)]})
    out = interval_join(
        spark.createDataFrame(l_pdf),
        spark.createDataFrame(l_pdf.rename(columns={"lid": "rid"})),
        chunk=16,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(_chunk") <= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interval_join_zero_chunk_rejected(spark):
    from open_vector_tile_spark.operators.events import interval_join

    df = spark.createDataFrame([(1, 0, 10)], "id long, start long, end long")
    with pytest.raises(ValueError, match="chunk"):
        interval_join(df, df, chunk=0)


def test_asof_join_suffix_collision_rejected(spark):
    """A left column named like a suffixed right output (or a window
    internal) would silently produce duplicate output columns."""
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 9.0)], ["k", "ts", "v_r"]
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], ["k", "ts", "v"]
    )
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on=["k"])
    left2 = left.withColumnRenamed("v_r", "_rpack")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left2, right, on=["k"])
    # a suffixed right column that lands on the pack struct's internal
    # "_ar_ts" field would duplicate the struct field name
    right2 = right.withColumnRenamed("v", "_ar_ts")
    with pytest.raises(ValueError, match="collision"):
        asof_join(
            left.withColumnRenamed("v_r", "w"), right2, on=["k"], suffix=""
        )
    # non-colliding suffix still works
    assert asof_join(
        left.withColumnRenamed("v_r", "w"), right, on=["k"]
    ).count() == 1

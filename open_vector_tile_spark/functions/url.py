"""URL canonicalization + URL-level dedup (the first dedup stage of a web
crawl pipeline: CCNet/C4 collapse recrawls of the same page by canonical URL
before any content hashing).

Pure JVM regexp/string column expressions — codegen'd, no Python, and every
rule is an RE2-compatible pattern so the DuckDB oracle can replay the
identical chain byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TRACK_NAMES = r"(utm_[a-z]+|fbclid|gclid|ref)"


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, strip fragment, the scheme's
    default port (:80 for http, :443 for https), a leading ``www.``,
    tracking query params (utm_*, fbclid, gclid, ref — matched only at a
    ``?``/``&`` boundary, so ``href=`` / ``xref=`` are untouched), empty
    leftover ``?``, and trailing slashes.  Scheme-less input is treated as
    http (the crawl convention).  The path/query otherwise keeps its
    original bytes (case matters in paths).

    No backreferences anywhere: Java spells them $1, RE2 \\1 — a chain
    that must replay identically in both engines can use neither.  The
    param-boundary anchoring therefore uses three passes (non-first
    params, a first param with a successor, a lone param) instead of one
    captured-separator replace."""
    u = F.regexp_replace(url, r"#.*", "")
    u = F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), u).otherwise(
        F.concat(F.lit("http://"), u)
    )
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1)
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    host = F.regexp_replace(host, r"^www\.", "")
    # split path from query BEFORE stripping params: '&' is a legal PATH
    # character, so running the &param strip over the whole rest would
    # mangle query-less paths like "/a&ref=b" (and "&ref=nav/page" would
    # eat the following path segment).  Only the query substring is edited.
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    qs = F.regexp_extract(rest, r"^[^?]*(\?.*)$", 1)
    qs = F.regexp_replace(qs, r"&" + _TRACK_NAMES + r"=[^&#]*", "")
    qs = F.regexp_replace(qs, r"\?" + _TRACK_NAMES + r"=[^&#]*&", "?")
    qs = F.regexp_replace(qs, r"\?" + _TRACK_NAMES + r"=[^&#]*$", "")
    rest = F.regexp_replace(F.concat(path, qs), r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(scheme, F.lit("://"), host, rest)


def latest_snapshot(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    tie: "tuple[str, ...]" = (),
) -> DataFrame:
    """Recrawl snapshot semantics over the crawl table (url, warc_ts, ...):
    keep each URL's most recent crawl row INTACT (every column of the
    winning row — payload bytes included — survives untouched), and
    annotate it with the URL's crawl history (``n_crawls``, ``first_ts``).
    This is the latest-wins snapshot read a crawl store needs before any
    content-level dedup: CCNet/C4 process one row per page, not one per
    fetch.

    Determinism: ties on ``ts_col`` break on the ``tie`` columns
    descending; pass the crawl's unique record id there if timestamps can
    collide.

    Shape at 100 TB: ONE hash shuffle on ``key`` feeding both window
    frames (the history aggregates need no sort; row_number sorts within
    partitions only).  Skew is bounded by per-URL recrawl count, not
    corpus size."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tie]
    w = Window.partitionBy(key).orderBy(*order)
    hist = Window.partitionBy(key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_crawls", F.count("*").over(hist))
        .withColumn("first_ts", F.min(ts_col).over(hist))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """-> (canonical_url, n_docs, keeper_id): one row per canonical URL with
    the duplicate count and the smallest id (the keep policy).  One partial-
    aggregated shuffle on the canonical key."""
    return (
        df.select(normalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )

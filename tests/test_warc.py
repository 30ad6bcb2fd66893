"""WARC container source/sink (sources/warc.py): framing round-trips,
gzip member framing, malformed tails, HTTP response splitting.

Reference for framing: public WARC/1.0 spec (ISO 28500) + Common Crawl's
one-gzip-member-per-record `.warc.gz` layout.  The python reference
encoder in this file is written independently of the operator (plain
f-strings) so byte equality is a two-implementation check.
"""

import gzip

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.sources.warc import (
    http_response_bytes,
    pack_warc_blobs,
    parse_warc,
    warc_record_bytes,
    warc_response_pages,
)


def _py_record(url: str, date: str, rid: str, body: bytes) -> bytes:
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <{rid}>\r\n"
        f"WARC-Date: {date}\r\nWARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def _pages_df(spark, n=40):
    rows = [
        (
            i,
            i % 3,
            f"https://site{i % 5}.org/p{i}",
            f"<html><body>doc {i} ไทย {'x' * (i % 7)}</body></html>",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, blob_id long, url string, html string").select(
        "doc_id",
        "blob_id",
        "url",
        F.encode("html", "UTF-8").alias("html"),
        (F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id"))).alias("warc_ts"),
    )


def _records_df(pages):
    return pages.select(
        "blob_id",
        "url",
        warc_record_bytes(
            F.col("url"), F.col("warc_ts"), http_response_bytes(F.col("html"))
        ).alias("record_bytes"),
    )


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(spark, gz):
    pages = _pages_df(spark)
    blobs = pack_warc_blobs(_records_df(pages), gzip_members=gz)
    got = (
        warc_response_pages(parse_warc(blobs))
        .select("url", "warc_date", "http_status", "http_content_type", "html")
        .collect()
    )
    exp = {
        r["url"]: (bytes(r["html"]), r["warc_ts"]) for r in pages.collect()
    }
    assert len(got) == len(exp)
    for r in got:
        html, _ts = exp[r["url"]]
        assert bytes(r["html"]) == html  # byte-identity through the container
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html; charset=UTF-8"
        assert r["warc_date"].endswith("Z") and "T" in r["warc_date"]


def test_record_bytes_match_python_reference(spark):
    pages = _pages_df(spark, n=6)
    rows = (
        _records_df(pages)
        .join(pages.select("url", "warc_ts", "html"), "url")
        .select("url", "record_bytes", "warc_ts", "html")
        .collect()
    )
    import hashlib

    for r in rows:
        date = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        # record id hashes the UTC date STRING (tz-honest, reproducible)
        rid = (
            "urn:sha256:"
            + hashlib.sha256(f"{r['url']}@{date}".encode()).hexdigest()
        )
        assert bytes(r["record_bytes"]) == _py_record(r["url"], date, rid, bytes(r["html"]))


def test_parse_offsets_and_counts(spark):
    pages = _pages_df(spark)
    blobs = pack_warc_blobs(_records_df(pages))
    recs = parse_warc(blobs)
    pdf = recs.toPandas().sort_values(["blob_id", "rec_index"])
    assert not pdf["malformed"].any()
    assert pdf.groupby("blob_id").size().to_dict() == {0: 14, 1: 13, 2: 13}
    # offsets strictly increase within a blob and rec_index is dense
    for _, g in pdf.groupby("blob_id"):
        assert list(g["rec_index"]) == list(range(len(g)))
        assert g["rec_offset"].is_monotonic_increasing
    # content_length equals the actual payload size
    assert (pdf["payload"].map(len) == pdf["content_length"]).all()


def test_malformed_tail_flagged_not_fatal(spark):
    pages = _pages_df(spark, n=4).filter(F.col("blob_id") == 0)
    blob = b"".join(
        bytes(r["record_bytes"]) for r in _records_df(pages).orderBy("url").collect()
    )
    truncated = blob[: len(blob) - 30]  # cut inside the last payload
    garbage = blob + b"NOT A WARC HEADER"
    df = spark.createDataFrame(
        [(0, truncated), (1, garbage), (2, blob)], "blob_id long, data binary"
    )
    pdf = parse_warc(df).toPandas()
    ok = pdf[~pdf["malformed"]]
    bad = pdf[pdf["malformed"]]
    n_pages = pages.count()
    assert len(ok[ok["blob_id"] == 0]) == n_pages - 1
    assert len(ok[ok["blob_id"] == 1]) == n_pages
    assert len(ok[ok["blob_id"] == 2]) == n_pages
    assert set(bad["blob_id"]) == {0, 1}  # one flagged stop row each


def test_gzip_members_are_independent(spark):
    """Each record is its own gzip member (Common-Crawl layout): member
    count == record count, and any single member decompresses alone."""
    pages = _pages_df(spark, n=9).filter(F.col("blob_id") == 1)
    blobs = pack_warc_blobs(_records_df(pages), gzip_members=True).collect()
    data = bytes(blobs[0]["data"])
    n = pages.count()
    assert data[:2] == b"\x1f\x8b"
    # split members by re-scanning with zlib (independent of the operator)
    import zlib

    members, pos = 0, 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        assert gzip.decompress(data[pos : len(data) - len(d.unused_data)]) == out
        members += 1
        if not d.unused_data:
            break
        pos = len(data) - len(d.unused_data)
    assert members == n


def test_non_response_records_pass_through_parser(spark):
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:x:1>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    pages = _pages_df(spark, n=2).filter(F.col("doc_id") == 0)
    rec = bytes(_records_df(pages).collect()[0]["record_bytes"])
    df = spark.createDataFrame([(0, info + rec)], "blob_id long, data binary")
    recs = parse_warc(df)
    pdf = recs.toPandas().sort_values("rec_index")
    assert list(pdf["warc_type"]) == ["warcinfo", "response"]
    assert bytes(pdf.iloc[0]["payload"]) == b"robots: x"
    # pages view keeps only the response
    assert warc_response_pages(recs).count() == 1


def test_negative_content_length_flagged_not_infinite(spark):
    evil = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x:1>\r\n"
        b"Content-Length: -33\r\n\r\n"
    )
    df = spark.createDataFrame([(0, evil)], "blob_id long, data binary")
    pdf = parse_warc(df).toPandas()
    assert len(pdf) == 1 and pdf.iloc[0]["malformed"]


def test_corrupt_gzip_member_flagged_not_fatal(spark):
    pages = _pages_df(spark, n=4).filter("blob_id = 0")
    good = bytes(
        pack_warc_blobs(_records_df(pages), gzip_members=True).collect()[0]["data"]
    )
    df = spark.createDataFrame(
        [(0, good + b"\x1f\x8bGARBAGE-NOT-GZIP"), (1, good)],
        "blob_id long, data binary",
    )
    pdf = parse_warc(df).toPandas()
    n_pages = pages.count()
    ok = pdf[~pdf["malformed"]]
    assert len(ok[ok["blob_id"] == 0]) == n_pages  # good members all parsed
    assert len(ok[ok["blob_id"] == 1]) == n_pages
    assert pdf[pdf["malformed"]]["blob_id"].tolist() == [0]  # one flagged row


def test_gzip_member_bytes_match_stdlib():
    """The hand-framed raw-zlib member must stay byte-identical to
    gzip.compress(data, compresslevel=6, mtime=0) — the format every
    external Common-Crawl reader expects."""
    from open_vector_tile_spark.sources.warc import _gzip_member

    for data in (b"", b"x", b"hello world " * 1000, bytes(range(256)) * 37):
        assert _gzip_member(data) == gzip.compress(data, compresslevel=6, mtime=0)

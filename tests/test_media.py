"""Multimodal media plumbing: OVM1 container, metadata parse, byte kernels.

A pure-python replay of the synthesis spec (struct-packed, byte-at-a-time)
is the oracle for every kernel — the Spark side must be bit-exact against
it, including empty payloads and single-row batches.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.operators.media import (
    HEADER_LEN,
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    frame_sample,
    media_byte_stats,
    media_metadata,
    resize_image_width,
    synth_media,
)


def py_spec(mid: int) -> dict:
    kind = mid % 3
    if kind == KIND_AUDIO:
        w = h = 0
        ch = 1 + mid % 2
        frames = 0
        rate = 8000 * (1 + mid % 4)
        payload = (256 + (mid % 16) * 16) * ch
    else:
        w = 8 + mid % 8
        h = 8 + mid % 6
        ch = 3 if kind == KIND_VIDEO else 1 + mid % 2
        frames = 1 if kind == KIND_IMAGE else 2 + mid % 6
        rate = 0
        payload = w * h * ch * frames
    return dict(
        kind=kind, width=w, height=h, channels=ch,
        n_frames=frames, sample_rate=rate, payload_len=payload,
    )


def py_blob(mid: int) -> bytes:
    s = py_spec(mid)
    head = struct.pack(
        ">4sBHHBHII", b"OVM1", s["kind"], s["width"], s["height"],
        s["channels"], s["n_frames"], s["sample_rate"], s["payload_len"],
    )
    pay = bytes((mid * 131 + i * 31 + 7) % 256 for i in range(s["payload_len"]))
    return head + pay


IDS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 17, 23, 48, 97, 1001, 54321]


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame([(i,) for i in IDS], "doc_id long")
    return synth_media(docs).cache()


def test_synth_bit_exact(media_df):
    rows = {r.media_id: bytes(r.blob) for r in media_df.collect()}
    assert set(rows) == set(IDS)
    for mid in IDS:
        assert rows[mid] == py_blob(mid), f"blob mismatch for media {mid}"


def test_metadata_parse(media_df):
    got = {r.media_id: r.asDict() for r in media_metadata(media_df).collect()}
    for mid in IDS:
        s = py_spec(mid)
        g = got[mid]
        assert g["magic_ok"]
        for k, v in s.items():
            assert g[k] == v, (mid, k, g[k], v)
        assert g["blob_len"] == HEADER_LEN + s["payload_len"]


def test_byte_stats_parity(media_df):
    got = {r.media_id: r for r in media_byte_stats(media_df).collect()}
    for mid in IDS:
        pay = py_blob(mid)[HEADER_LEN:]
        g = got[mid]
        assert g.payload_len == len(pay)
        assert g.byte_sum == sum(pay)
        assert g.byte_min == float(min(pay))
        assert g.byte_max == float(max(pay))
        assert g.mean_byte == sum(pay) / len(pay)


def test_byte_stats_empty_payload_boundaries(spark):
    # hand-built batch: [3 bytes][empty][2 bytes][empty][empty] — the
    # shapes that corrupt clipped reduceat boundaries
    def blob(mid, pay):
        head = struct.pack(">4sBHHBHII", b"OVM1", 0, 0, 0, 1, 1, 0, len(pay))
        return head + pay

    rows = [
        (1, blob(1, b"\x05\xff\x00")),
        (2, blob(2, b"")),
        (3, blob(3, b"\x07\x02")),
        (4, blob(4, b"")),
        (5, blob(5, b"")),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary").coalesce(1)
    got = {r.media_id: r for r in media_byte_stats(df).collect()}
    assert (got[1].byte_sum, got[1].byte_min, got[1].byte_max) == (260, 0.0, 255.0)
    assert (got[3].byte_sum, got[3].byte_min, got[3].byte_max) == (9, 2.0, 7.0)
    for mid in (2, 4, 5):
        g = got[mid]
        assert g.byte_sum == 0
        assert g.byte_min is None and g.byte_max is None and g.mean_byte is None


@pytest.mark.parametrize("step", [1, 2, 3])
def test_frame_sample_parity(media_df, step):
    got = frame_sample(media_df, step=step).collect()
    by_media: dict[int, list] = {}
    for r in got:
        by_media.setdefault(r.media_id, []).append(r)
    vids = [m for m in IDS if m % 3 == KIND_VIDEO]
    assert set(by_media) == set(vids)
    for mid in vids:
        s = py_spec(mid)
        pay = py_blob(mid)[HEADER_LEN:]
        flen = s["width"] * s["height"] * s["channels"]
        want_idx = list(range(0, s["n_frames"], step))
        rows = sorted(by_media[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == want_idx
        for r in rows:
            seg = pay[r.frame_idx * flen : (r.frame_idx + 1) * flen]
            assert r.frame_off == r.frame_idx * flen
            assert r.frame_len == flen
            assert r.frame_sum == sum(seg), (mid, r.frame_idx)


def test_resize_parity_and_roundtrip(media_df):
    got = {r.media_id: r for r in resize_image_width(media_df).collect()}
    imgs = [m for m in IDS if m % 3 == KIND_IMAGE]
    assert set(got) == set(imgs)
    for mid in imgs:
        s = py_spec(mid)
        pay = py_blob(mid)[HEADER_LEN:]
        w, ch = s["width"], s["channels"]
        kept = bytes(
            b for i, b in enumerate(pay) if ((i // ch) % w) % 2 == 0
        )
        g = got[mid]
        assert g.new_width == (w + 1) // 2
        assert g.new_payload_len == len(kept)
        assert g.new_byte_sum == sum(kept)
        assert bytes(g.new_blob)[HEADER_LEN:] == kept
        assert bytes(g.new_blob)[:4] == b"OVM1"
    # the emitted blob must reparse through the same header reader
    out = resize_image_width(media_df).select(
        "media_id", F.col("new_blob").alias("blob")
    )
    meta = {r.media_id: r for r in media_metadata(out).collect()}
    for mid in imgs:
        s = py_spec(mid)
        assert meta[mid].width == (s["width"] + 1) // 2
        assert meta[mid].height == s["height"]
        assert meta[mid].payload_len == got[mid].new_payload_len


def test_partitioning_invariance(spark):
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    one = media_byte_stats(synth_media(docs.coalesce(1)))
    many = media_byte_stats(synth_media(docs.repartition(7)))
    a = sorted((r.media_id, r.byte_sum, r.byte_min) for r in one.collect())
    b = sorted((r.media_id, r.byte_sum, r.byte_min) for r in many.collect())
    assert a == b
    fa = sorted(map(tuple, frame_sample(synth_media(docs.coalesce(1))).collect()))
    fb = sorted(map(tuple, frame_sample(synth_media(docs.repartition(7))).collect()))
    assert fa == fb


def test_decode_stub_raises():
    from open_vector_tile_spark.operators.media import decode_image_real

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG...")


def test_pixel_stats_ovm1_path_matches_byte_stats(media_df):
    """media_pixel_stats on OVM1 blobs must agree bit-for-bit with
    media_byte_stats (payload bytes ARE the pixels) — this is the
    codec-less fallback path the driver oracle rides."""
    from open_vector_tile_spark.operators.media import media_pixel_stats

    a = sorted(map(tuple, media_pixel_stats(media_df).collect()))
    b = sorted(map(tuple, media_byte_stats(media_df).collect()))
    assert a == b and len(a) > 0


def test_pixel_stats_real_codec_branch_dispatch():
    """Pin the Pillow branch of the per-batch kernel with an injected fake
    codec module (local-mode executors can't see a monkeypatched import,
    so the kernel is exercised directly): non-OVM1 blobs must route
    through pillow.open and produce stats over the decoded array, mixed
    with OVM1 rows in one batch."""
    import numpy as np
    import pandas as pd

    from open_vector_tile_spark.operators.media import (
        HEADER_LEN,
        MAGIC,
        _pixel_stats_frame,
    )

    class FakeImage:
        def __init__(self, arr):
            self.arr = arr

        def __array__(self, dtype=None, copy=None):
            return self.arr

    decoded = {}

    class FakePillow:
        @staticmethod
        def open(fp):
            data = fp.read()
            arr = np.frombuffer(data[4:], dtype=np.uint8).reshape(-1, 2)
            decoded[data[:4]] = True
            return FakeImage(arr)

    ovm_payload = bytes([5, 10, 15, 20])
    ovm_blob = MAGIC + bytes(HEADER_LEN - 4) + ovm_payload
    png_blob = b"PNG0" + bytes([1, 2, 3, 4, 250, 6])
    pdf = pd.DataFrame({"media_id": [1, 2], "blob": [ovm_blob, png_blob]})
    out = (
        _pixel_stats_frame(pdf, "blob", FakePillow)
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert decoded == {b"PNG0": True}  # the codec really ran
    assert out["payload_len"].tolist() == [4, 6]
    assert out["byte_sum"].tolist() == [50, 266]
    assert out["byte_min"].tolist() == [5.0, 1.0]
    assert out["byte_max"].tolist() == [20.0, 250.0]


def test_pixel_stats_no_codec_raises_loudly():
    """A real-codec blob in a codec-less environment must fail with the
    named missing dependency, not silently misread bytes."""
    import pandas as pd

    from open_vector_tile_spark.operators.media import _pixel_stats_frame

    pdf = pd.DataFrame({"media_id": [7], "blob": [b"\x89PNG\r\n" + bytes(20)]})
    with pytest.raises(NotImplementedError, match="Pillow"):
        _pixel_stats_frame(pdf, "blob", None)

"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with a typed metadata struct —
exactly how the reference treats images (opaque encoded bytes + width/height/
type, src/open/imageLayer.ts:77-88).  The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, UDF signatures — is real and tested; the
actual codec step is STUBBED (this container has no image/audio libraries):
``decode_image`` uses a deterministic fake decoder for ``type='raw'`` and
raises ``NotImplementedError`` for real codecs, keeping the pipeline shape
verifiable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, feat array<float>, n_bytes long"


def media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media rows (raw byte patterns)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
        payload = bytes(((i * 31 + j * 7) % 256) for j in range(w * h))
        rows.append((i, "image", "image/raw", w, h, None, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_raw(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: bytes -> (h, w) grayscale array."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size < width * height:
        arr = np.pad(arr, (0, width * height - arr.size))
    return arr[: width * height].reshape(height, width)


def decode_image(payload: bytes, mime: str, width: int, height: int) -> np.ndarray:
    if mime == "image/raw":
        return _decode_raw(payload, width, height)
    # real codecs (png/jpeg/webp) need pillow/libvips — not in this container
    raise NotImplementedError(f"decoder for {mime} not available in this environment")


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction: decode -> 16-bin intensity histogram.

    mapInPandas keeps whole binary payloads inside one Arrow batch; payload
    bytes never round-trip through Python row objects.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [
                decode_image(bytes(p), m, int(w), int(h))
                for p, m, w, h in zip(
                    pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
                )
            ]
            # one histogram pass for the WHOLE batch: concatenate pixels,
            # bucket = px*bins//256 (== np.histogram bins over [0,256) for
            # uint8), segment by image via bincount on (img_idx*bins + bucket)
            sizes = np.array([im.size for im in imgs], dtype=np.int64)
            if len(imgs) and sizes.sum():
                px = np.concatenate([im.ravel() for im in imgs]).astype(np.int64)
                seg = np.repeat(np.arange(len(imgs), dtype=np.int64), sizes)
                flat = np.bincount(seg * bins + ((px * bins) >> 8), minlength=len(imgs) * bins)
                hists = flat.reshape(len(imgs), bins)
            else:
                hists = np.zeros((len(imgs), bins), dtype=np.int64)
            denom = np.maximum(sizes, 1)[:, None]
            feats = (hists / denom).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": [f.tolist() for f in feats],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "mime", "width", "height", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def resize_stub(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize for raw images (real plumbing, fake codec)."""

    yi_cache: dict = {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m, w, h in zip(pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]):
                img = decode_image(bytes(p), m, int(w), int(h))
                key = img.shape
                idx = yi_cache.get(key)
                if idx is None:
                    yi = (np.arange(out_h) * key[0] // out_h).astype(int)
                    xi = (np.arange(out_w) * key[1] // out_w).astype(int)
                    idx = yi_cache[key] = np.ix_(yi, xi)
                out.append(img[idx].tobytes())
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["width"] = out_w
            pdf["height"] = out_h
            yield pdf

    return media.mapInPandas(run, media.schema)

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
            feats, nbytes = [], []
            for _, row in pdf.iterrows():
                img = decode_image(
                    bytes(row["payload"]), row["mime"], int(row["width"]), int(row["height"])
                )
                hist, _ = np.histogram(img, bins=bins, range=(0, 256))
                feats.append((hist / max(img.size, 1)).astype(np.float32).tolist())
                nbytes.append(len(row["payload"]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feat": feats, "n_bytes": nbytes}
            )

    return media.select("media_id", "mime", "width", "height", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def resize_stub(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize for raw images (real plumbing, fake codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(
                    bytes(row["payload"]), row["mime"], int(row["width"]), int(row["height"])
                )
                yi = (np.arange(out_h) * img.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * img.shape[1] // out_w).astype(int)
                out.append(img[yi][:, xi].tobytes())
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["width"] = out_w
            pdf["height"] = out_h
            yield pdf

    return media.mapInPandas(run, media.schema)

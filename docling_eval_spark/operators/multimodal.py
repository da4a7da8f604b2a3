"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference stores page renders and picture crops as image columns
(`benchmarks/utils.py:48-65` Features schema with Sequence(Image),
crop at `utils.py:406-436`). At web scale the engine treats media as
``binary`` columns with a typed metadata struct, processed by
Arrow-batched kernels over ``mapInPandas``.

The actual codecs (PIL/ffmpeg) are NOT in this container, so the
decode step is a clearly-marked STUB: ``decode_image_meta`` parses
real PNG/JPEG headers (pure bytes — genuinely implemented), while
pixel decode / resize / frame-sample produce deterministic fakes
derived from the byte content, behind ``fake=True`` markers. The
Spark-side contracts — schemas, batch iteration, partitioning — are
real and tested; swapping in PIL later changes only the kernel body.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("fake", T.BooleanType()),
    ]
)


def decode_image_meta(data: bytes) -> dict:
    """Parse PNG / JPEG / GIF headers for true dimensions (pure-bytes,
    no codec); anything else → format=unknown with fake dims."""
    meta = {
        "format": "unknown",
        "width": 0,
        "height": 0,
        "n_bytes": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
        "fake": False,
    }
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = _struct.unpack(">II", data[16:24])
        meta.update(format="png", width=int(w), height=int(h))
    elif data[:2] == b"\xff\xd8":
        meta["format"] = "jpeg"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = _struct.unpack(">HH", data[i + 5 : i + 9])
                meta.update(width=int(w), height=int(h))
                break
            i += 2 + seg_len
    elif data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = _struct.unpack("<HH", data[6:10])
        meta.update(format="gif", width=int(w), height=int(h))
    else:
        # STUB: deterministic fake dims derived from content hash —
        # stands in for a real decoder (not installed here)
        digest = hashlib.sha256(data).digest()
        meta.update(
            width=64 + digest[0] % 192, height=64 + digest[1] % 192, fake=True
        )
    return meta


def image_meta_stage(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Append a typed metadata struct for a binary media column."""
    fields = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("media_meta", MEDIA_META_SCHEMA)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[fields].copy()
            out["media_meta"] = [
                tuple(decode_image_meta(b if b is not None else b"").values())
                for b in pdf[binary_col]
            ]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


_FEAT_DIM = 16

FEATURES_SCHEMA = T.ArrayType(T.FloatType())


def fake_image_features(data: bytes, dim: int = _FEAT_DIM) -> list[float]:
    """STUB feature extractor: deterministic unit vector from the
    sha256 stream (placeholder for a real vision encoder — the Spark
    plumbing around it, including batch shape, is the real contract)."""
    digest = hashlib.sha256(data).digest()
    raw = [(digest[i % 32] / 255.0) - 0.5 for i in range(dim)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def image_features_stage(
    df: DataFrame, binary_col: str = "media", out_col: str = "features"
) -> DataFrame:
    fields = [f.name for f in df.schema.fields]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, FEATURES_SCHEMA)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[fields].copy()
            out[out_col] = [
                fake_image_features(b if b is not None else b"")
                for b in pdf[binary_col]
            ]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample_stage(
    df: DataFrame,
    binary_col: str = "media",
    every_n_bytes: int = 4096,
    max_frames: int = 16,
) -> DataFrame:
    """STUB video frame sampler: emits one row per 'frame' (fixed-size
    byte slice standing in for an ffmpeg keyframe). Real contract:
    one-to-many expansion with ordinal, preserving the parent key."""
    src = df.select("url", binary_col)
    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nos, frames = [], [], []
            for url, b in zip(pdf["url"], pdf[binary_col]):
                b = b if b is not None else b""
                for fno in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    urls.append(url)
                    nos.append(fno)
                    frames.append(b[fno * every_n_bytes : (fno + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"url": urls, "frame_no": nos, "frame_bytes": frames}
            )

    return src.mapInPandas(kernel, schema=out_schema)

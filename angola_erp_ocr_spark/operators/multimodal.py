"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
Arrow transfer) is real and tested; the codec calls themselves are gated
behind import-tries because the image/audio libraries are not in this
container. Where a library is absent the decode raises NotImplementedError
(strict mode) or produces a clearly-marked deterministic fake (default) so
downstream feature plumbing stays testable.

At 100 TB the pattern is: binaries live in the lake (or as media_ref
pointers to object storage), the decode stage is a mapInPandas over
(ref, bytes) batches sized by spark.sql.execution.arrow.maxRecordsPerBatch,
and extracted features land in narrow typed columns so downstream stages
never reread the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_META = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha256", T.StringType(), True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
])

FRAME_SAMPLE = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), True),
])


def media_metadata(df: DataFrame, ref_col: str = "media_ref",
                   bytes_col: str = "payload") -> DataFrame:
    """Typed metadata for binary media columns — pure built-ins (length,
    sha2), no Python. The cheap pass that runs over everything."""
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.element_at(F.split(ref_col, "://"), 1).alias("media_type"),
        F.length(F.col(bytes_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(bytes_col), 256).alias("sha256"),
    )


def _fake_image_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: dimensions and an
    8-dim 'embedding' derived from the payload digest. CLEARLY FAKE —
    replace with PIL/torchvision when available."""
    d = hashlib.sha256(blob).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    emb = [round(b / 255.0, 6) for b in d[2:10]]
    return width, height, emb


def decode_images(df: DataFrame, ref_col: str = "media_ref",
                  bytes_col: str = "payload", strict: bool = False) -> DataFrame:
    """Image decode / feature-extract as an Arrow-batched mapInPandas stage.

    strict=True raises NotImplementedError when no real decoder exists
    (production posture); default emits the deterministic fake so the
    pipeline shape stays testable in this sandbox.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and not HAS_PIL:
            raise NotImplementedError(
                "image decode requires PIL/torchvision — not in this container")
        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                w, h, emb = _fake_image_decode(bytes(blob))
                rows.append(dict(media_ref=ref, width=w, height=h, embedding=emb))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height",
                                              "embedding"])

    return df.select(ref_col, bytes_col).mapInPandas(run, schema=IMAGE_FEATURES)


def sample_frames(df: DataFrame, every_n: int = 10, ref_col: str = "media_ref",
                  bytes_col: str = "payload") -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame.
    Frame decode is the fake digest (no av/ffmpeg here); the batch→multi-row
    fan-out shape is the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                blob = bytes(blob)
                n_frames = max(1, len(blob) // 256)
                for f in range(0, n_frames, every_n):
                    sha = hashlib.sha256(blob + f.to_bytes(4, "little")).hexdigest()
                    rows.append(dict(media_ref=ref, frame_no=f, frame_sha=sha))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_no", "frame_sha"])

    return df.select(ref_col, bytes_col).mapInPandas(run, schema=FRAME_SAMPLE)

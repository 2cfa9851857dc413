"""Multimodal column plumbing: opaque binary payloads + typed metadata.

At 100 TB, media rides through the pipeline as ``binary`` columns with
a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` so each executor core processes whole record batches.

Decode kernels: when PIL is importable, ``image/*`` payloads decode
through the real codec (:func:`decode_image_real`); everything else —
and every payload in a codec-less container like this one — goes
through the clearly-marked deterministic fake
(:func:`_fake_decode`), keeping the Spark-side
schema/partitioning/batching real and testable and the DuckDB oracles
exact. The routing is per-row inside the same Arrow batch loop, so
adding a codec changes zero plan shape.
"""

from __future__ import annotations

from typing import Iterator, Optional

try:  # pragma: no cover — container ships no codecs
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a decoded-media metadata batch
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def make_media_table(docs: DataFrame) -> DataFrame:
    """Stand-in media table: utf-8 payload bytes of each document's
    text as an opaque blob plus minimal metadata. (The container has no
    real media files; the *column plumbing* is what's under test.)"""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode standing in for an image codec:
    derives (width, height, n_frames) from payload length only. Replace
    with PIL/ffmpeg in an environment that ships codecs."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 10 + 1)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Real image decode via PIL when available (width, height,
    n_frames); raises ``NotImplementedError`` in codec-less containers
    so callers fall back to the deterministic fake explicitly."""
    if not HAS_PIL:  # pragma: no cover — container ships no codecs
        raise NotImplementedError(
            "media codecs are not available in this container; "
            "use decode_media_meta (deterministic fake routing) for "
            "plumbing tests"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return (im.width, im.height, getattr(im, "n_frames", 1))


def decode_media_meta(
    media: DataFrame, use_real_codec: Optional[bool] = None
) -> DataFrame:
    """Arrow-batched metadata extraction over mapInPandas: one pandas
    batch per partition chunk, no per-row Python overhead.

    ``use_real_codec``: None → auto (PIL if importable); the real codec
    only ever applies to ``image/*`` rows, with a per-row fallback to
    the deterministic fake on decode failure, so mixed-modality tables
    never abort a batch.
    """
    real = HAS_PIL if use_real_codec is None else use_real_codec

    def decode_one(payload: bytes, media_type: str):
        if real and isinstance(media_type, str) and media_type.startswith(
            "image/"
        ):  # pragma: no cover — container ships no codecs
            try:
                return decode_image_real(payload)
            except Exception:
                return _fake_decode(payload)
        return _fake_decode(payload)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_one(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": [t[0] for t in decoded],
                    "height": [t[1] for t in decoded],
                    "n_frames": [t[2] for t in decoded],
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize pass over mapInPandas. The pixel resample is STUBBED
    (payload truncated/padded to width*height bytes, deterministic);
    the real kernel drops into the same batch loop. Pure map — no
    shuffle, scales with input splits."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b[:target]).ljust(target, b"\0")
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, dims: int = 16) -> DataFrame:
    """Feature extraction over mapInPandas: a DETERMINISTIC FAKE
    embedding (normalized byte histogram folded to ``dims`` buckets)
    standing in for a vision/audio encoder. The output column is
    ``array<float>`` — directly consumable by the similarity/dedup
    operators (cosine_topk, embedding_lsh_pairs)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dims, minlength=dims).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def sample_frames(decoded: DataFrame, every: int = 1) -> DataFrame:
    """Explode one row per (sampled) frame index — the batch-shape
    pattern for video frame extraction (frame payload column stubbed)."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )

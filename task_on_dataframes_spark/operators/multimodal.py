"""Multimodal column plumbing: opaque binary payloads + typed metadata.

At 100 TB, media rides through the pipeline as ``binary`` columns with
a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` so each executor core processes whole record batches.

Kernel routing, per row inside the same Arrow batch loop (so adding a
codec changes zero plan shape):

- ``image/raw`` — a codec-free uint8 pixel format (:data:`RAW_MAGIC`
  header + H*W*C row-major bytes). Decode, bilinear resize, and
  per-channel pixel histograms are REAL vectorized numpy kernels — no
  third-party codec needed, so this path is live in every container.
- ``image/png`` — the REAL pure-stdlib compressed codec
  (:mod:`.png`: zlib inflate + scanline unfilter, filters 0-4), live
  in every container and routed AHEAD of PIL.
- other ``image/*`` — the real PIL codec when importable
  (:func:`decode_image_real`); containers without codecs fall through.
- anything else / fallthrough — the clearly-marked deterministic fake
  (:func:`_fake_decode`), keeping schema/partitioning/batching
  testable and the DuckDB oracles exact for opaque payloads.
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


#: 4-byte magic + uint16 width/height/channels (little-endian) header
#: of the codec-free raw pixel format; pixel data follows row-major
#: as height*width*channels uint8 bytes.
RAW_MAGIC = b"RAWI"
_RAW_HEADER = "<4sHHH"


def encode_raw_image(arr) -> bytes:
    """Encode an ``(H, W)`` or ``(H, W, C)`` uint8 numpy array into the
    raw payload format (real pixels, no compression codec needed)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    return struct.pack(_RAW_HEADER, RAW_MAGIC, w, h, c) + a.tobytes()


def decode_raw_image(payload: bytes):
    """Decode a raw payload back into an ``(H, W, C)`` uint8 array.
    Raises ``ValueError`` on a bad magic/length — callers route such
    rows to the fake instead of aborting the Arrow batch."""
    import struct

    import numpy as np

    head = struct.calcsize(_RAW_HEADER)
    magic, w, h, c = struct.unpack_from(_RAW_HEADER, payload)
    if magic != RAW_MAGIC or len(payload) != head + w * h * c:
        raise ValueError("not a raw image payload")
    return (
        np.frombuffer(payload, dtype=np.uint8, offset=head)
        .reshape(h, w, c)
        .copy()
    )


def bilinear_resize(arr, width: int, height: int):
    """REAL bilinear resample of an ``(H, W, C)`` uint8 array to
    ``(height, width, C)`` — vectorized numpy (gather + lerp), the same
    arithmetic PIL uses for ``Image.BILINEAR`` up to rounding. Runs
    inside the Arrow batch loop; no codec, no Python-per-pixel loop."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float32)
    h, w = a.shape[:2]
    # sample at pixel centers (align_corners=False convention)
    ys = (np.arange(height, dtype=np.float32) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width, dtype=np.float32) + 0.5) * (w / width) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def make_raw_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic ``image/raw`` media table synthesized from doc_id:
    a solid-color RGB image of width ``8 + doc_id % 9``, height
    ``6 + doc_id % 7``, color ``(doc_id, 7*doc_id, 13*doc_id) % 256``.
    Real pixels through the real kernels, with every derived quantity
    analytically expressible in the DuckDB oracle. Arrow-batched
    synthesis — one pandas batch per partition chunk."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 8 + d % 9, 6 + d % 7
                color = (d % 256, (7 * d) % 256, (13 * d) % 256)
                payloads.append(
                    encode_raw_image(
                        np.full((h, w, 3), color, dtype=np.uint8)
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": "image/raw",
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches,
        "media_id long, payload binary, media_type string",
    )


def make_png_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic ``image/png`` media table synthesized from doc_id:
    an RGB gradient image of width ``8 + doc_id % 9``, height
    ``6 + doc_id % 7`` with ``pixel(y, x, c) = (doc_id + 3x + 5y + 7c)
    % 256``, compressed through the REAL pure-stdlib PNG encoder with
    the scanline filter cycling 0..4 per row — so decoding exercises
    every filter reconstruction path on real deflate streams. The
    gradient makes every decoded pixel (and any aggregate of them)
    analytic in doc_id for an exact DuckDB oracle. Arrow-batched
    synthesis, map-only."""
    import numpy as np

    from task_on_dataframes_spark.operators.png import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 8 + d % 9, 6 + d % 7
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((d + 3 * x + 5 * y + 7 * c) % 256).astype(np.uint8)
                payloads.append(encode_png(px, row_filter=None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches,
        "media_id long, payload binary, media_type string",
    )


def _round_half_up5(x: float) -> float:
    """Round to 5 decimals, half away from zero, decimal-exact —
    matching DuckDB/Spark SQL ``round()`` semantics bit for bit.
    Python's builtin ``round()`` is half-to-even, which diverges from
    the SQL oracle exactly when the mean hits a binary midpoint (n*ch
    a power of two, first at doc_id 519 on the synthesized WAV
    corpus); the float-scaling trick (floor(x*1e5+0.5)/1e5) can
    mis-round near ULP boundaries of the scaled product, so this goes
    through the decimal module like graph._round_half_up."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(x).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP)
    )


def png_pixel_stats(media: DataFrame) -> DataFrame:
    """Decode ``image/png`` payloads through the pure-stdlib codec and
    aggregate the ACTUAL decoded pixels in-batch: (media_id, width,
    height, channels, px_sum, px_mean). Proof-of-decode query shape —
    an oracle that knows the synthesis rule can replay every value, so
    a single wrong byte anywhere in inflate/unfilter flips the hash.
    Map-only; pixels never leave the executor."""
    import numpy as np

    from task_on_dataframes_spark.operators.png import decode_png

    schema = (
        "media_id long, width int, height int, channels int, "
        "px_sum long, px_mean double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = decode_png(bytes(payload))
                h, w, c = a.shape
                s = int(a.astype(np.int64).sum())
                rows.append(
                    (
                        int(mid),
                        w,
                        h,
                        c,
                        s,
                        _round_half_up5(s / float(h * w * c)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "px_sum",
                    "px_mean",
                ],
            )

    return media.mapInPandas(batches, schema)


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
        if media_type == "image/raw":
            try:  # REAL numpy decode — codec-free, live everywhere
                h, w, c = decode_raw_image(bytes(payload)).shape
                return (w, h, 1)
            except ValueError:
                return _fake_decode(payload)
        if media_type == "image/png":
            from task_on_dataframes_spark.operators.png import decode_png

            try:  # REAL compressed codec — stdlib zlib, live everywhere
                h, w, c = decode_png(bytes(payload)).shape
                return (w, h, 1)
            except Exception:  # corrupt stream: zlib/struct/ValueError
                return _fake_decode(payload)
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
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize pass over mapInPandas. ``image/raw`` payloads go through
    the REAL vectorized-numpy bilinear kernel (:func:`bilinear_resize`)
    and are re-encoded raw; other ``image/*`` use PIL when importable;
    opaque payloads keep the labeled deterministic fake (truncate/pad
    to width*height bytes). Pure map — no shuffle, scales with input
    splits."""

    def resize_one(payload: bytes, media_type: str) -> bytes:
        if media_type == "image/raw":
            try:
                return encode_raw_image(
                    bilinear_resize(
                        decode_raw_image(bytes(payload)), width, height
                    )
                )
            except ValueError:
                pass
        if media_type == "image/png":
            from task_on_dataframes_spark.operators.png import (
                decode_png,
                encode_png,
            )

            try:  # real compressed round-trip: inflate, resample, deflate
                return encode_png(
                    bilinear_resize(decode_png(bytes(payload)), width, height)
                )
            except Exception:
                pass
        if HAS_PIL and isinstance(media_type, str) and media_type.startswith(
            "image/"
        ):  # pragma: no cover — container ships no codecs
            import io

            try:
                with _PILImage.open(io.BytesIO(payload)) as im:
                    out = io.BytesIO()
                    im.resize((width, height)).save(out, format=im.format)
                    return out.getvalue()
            except Exception:
                pass
        # deterministic fake for opaque/undecodable payloads
        return bytes(payload[: width * height]).ljust(width * height, b"\0")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mt = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series([""] * len(pdf), index=pdf.index)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize_one(p, t) for p, t in zip(pdf["payload"], mt)
                    ],
                    "media_type": mt,
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
    """Feature extraction over mapInPandas. ``image/raw`` payloads get
    a REAL normalized pixel-intensity histogram over the decoded pixel
    array (``dims`` equal-width luminance buckets — a classic cheap
    visual descriptor); opaque payloads keep the labeled deterministic
    fake (byte histogram folded to ``dims`` buckets) standing in for a
    learned encoder. The output column is ``array<float>`` — directly
    consumable by the similarity/dedup operators (cosine_topk,
    embedding_lsh_pairs)."""
    import numpy as np

    def feat_one(payload: bytes, media_type: str) -> list:
        if media_type == "image/raw":
            try:
                px = decode_raw_image(bytes(payload)).ravel()
                hist = np.bincount(
                    px.astype(np.int64) * dims // 256, minlength=dims
                ).astype("float32")
                return (hist / (hist.sum() or 1.0)).tolist()
            except ValueError:
                pass
        if media_type == "image/png":
            from task_on_dataframes_spark.operators.png import decode_png

            try:
                px = decode_png(bytes(payload)).ravel()
                hist = np.bincount(
                    px.astype(np.int64) * dims // 256, minlength=dims
                ).astype("float32")
                return (hist / (hist.sum() or 1.0)).tolist()
            except Exception:
                pass
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        hist = np.bincount(arr % dims, minlength=dims).astype("float32")
        return (hist / (hist.sum() or 1.0)).tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mt = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series([""] * len(pdf), index=pdf.index)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [
                        feat_one(p, t) for p, t in zip(pdf["payload"], mt)
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def make_wav_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic ``audio/wav`` media table synthesized from doc_id:
    a 16-bit PCM clip of ``64 + doc_id % 65`` frames, ``1 + doc_id % 2``
    channels, sample rate ``8000 + 1000 * (doc_id % 5)``, with
    ``sample(i, c) = ((doc_id + 7i + 997c) % 4096) - 2048`` — analytic
    in doc_id so every decoded amplitude (and any aggregate) is exactly
    replayable by the DuckDB oracle. Encoded through the REAL
    pure-stdlib RIFF writer (:mod:`.wav`); Arrow-batched, map-only."""
    import numpy as np

    from task_on_dataframes_spark.operators.wav import encode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n, ch = 64 + d % 65, 1 + d % 2
                rate = 8000 + 1000 * (d % 5)
                i, c = np.meshgrid(
                    np.arange(n), np.arange(ch), indexing="ij"
                )
                s = ((d + 7 * i + 997 * c) % 4096 - 2048).astype("<i2")
                payloads.append(encode_wav(s, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches,
        "media_id long, payload binary, media_type string",
    )


def wav_amplitude_stats(media: DataFrame) -> DataFrame:
    """Decode ``audio/wav`` payloads through the pure-stdlib RIFF
    parser and aggregate the ACTUAL decoded int16 amplitudes in-batch:
    (media_id, sample_rate, channels, n_samples, amp_sum, amp_max,
    amp_mean). Proof-of-decode shape: the oracle re-derives every value
    from the synthesis rule, so one wrong byte in the chunk walker or
    the frame deinterleave flips the hash. Map-only; samples never
    leave the executor."""
    import numpy as np

    from task_on_dataframes_spark.operators.wav import decode_wav

    schema = (
        "media_id long, sample_rate int, channels int, n_samples int, "
        "amp_sum long, amp_max int, amp_mean double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                n, ch = samples.shape
                a = np.abs(samples.astype(np.int64))
                s = int(a.sum())
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        ch,
                        n,
                        s,
                        int(a.max()),
                        _round_half_up5(s / float(n * ch)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "channels",
                    "n_samples",
                    "amp_sum",
                    "amp_max",
                    "amp_mean",
                ],
            )

    return media.mapInPandas(batches, schema)


def wav_frame_features(media: DataFrame, frame_len: int = 16) -> DataFrame:
    """Frame-level audio features over the decoded channel-0 signal:
    non-overlapping ``frame_len``-sample frames (tail remainder
    dropped), per frame the REAL integer energy ``sum(s^2)`` and the
    zero-crossing count (strict sign change: ``s[k-1] * s[k] < 0``
    within the frame). One output row per (media_id, frame_idx) — the
    canonical featurization shape for downstream audio filtering.
    Integer-exact, so the oracle replays every frame. Map-only
    explode-in-batch; no shuffle."""
    import numpy as np

    from task_on_dataframes_spark.operators.wav import decode_wav

    schema = "media_id long, frame_idx int, energy long, zero_crossings int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, fidx, energy, zc = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _ = decode_wav(bytes(payload))
                ch0 = samples[:, 0].astype(np.int64)
                nf = len(ch0) // frame_len
                if nf == 0:
                    continue
                fr = ch0[: nf * frame_len].reshape(nf, frame_len)
                mids.extend([int(mid)] * nf)
                fidx.extend(range(nf))
                energy.extend((fr * fr).sum(axis=1).tolist())
                zc.extend(
                    ((fr[:, :-1] * fr[:, 1:]) < 0).sum(axis=1).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": fidx,
                    "energy": energy,
                    "zero_crossings": zc,
                }
            )

    return media.mapInPandas(batches, schema)


def wav_resample(media: DataFrame, dst_rate: int = 16000) -> DataFrame:
    """Linear-interpolation resample of the decoded channel-0 signal to
    ``dst_rate`` in EXACT integer arithmetic — the "normalize every
    clip to 16 kHz" step an audio-training pipeline runs before
    featurization. Output index ``j`` maps to source position
    ``j * src_rate / dst_rate``; the interpolation runs on the
    2048-offset unsigned signal with floor division
    (``(u[i]*(den-rem) + u[i+1]*rem) // den``) so every resampled
    sample is an integer both engines reproduce bit-exactly (floor ==
    truncate on the non-negative offset signal — the same trick the
    fixed-point probe uses). Emits per-clip aggregates of the ACTUAL
    resampled signal: n_in, n_out, amp_sum, amp_max, and a positional
    checksum ``sum(out[j] * (j % 7 + 1))`` so a one-sample shift flips
    the hash. Map-only Arrow batches; clips never leave the executor,
    so at 100 TB this scales with input splits like every media kernel.
    """
    import numpy as np

    from task_on_dataframes_spark.operators.wav import decode_wav

    schema = (
        "media_id long, src_rate int, n_in int, n_out int, "
        "amp_sum long, amp_max int, pos_check long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                u = samples[:, 0].astype(np.int64) + 2048
                n = len(u)
                n_out = (n - 1) * dst_rate // rate + 1
                j = np.arange(n_out, dtype=np.int64)
                num = j * rate
                idx = num // dst_rate
                rem = num % dst_rate
                nxt = np.minimum(idx + 1, n - 1)
                out = (
                    u[idx] * (dst_rate - rem) + u[nxt] * rem
                ) // dst_rate - 2048
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        n,
                        int(n_out),
                        int(np.abs(out).sum()),
                        int(np.abs(out).max()),
                        int((out * (j % 7 + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "src_rate",
                    "n_in",
                    "n_out",
                    "amp_sum",
                    "amp_max",
                    "pos_check",
                ],
            )

    return media.mapInPandas(batches, schema)


def sample_frames(decoded: DataFrame, every: int = 1) -> DataFrame:
    """Explode one row per (sampled) frame index — the batch-shape
    pattern for video frame extraction (frame payload column stubbed)."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )

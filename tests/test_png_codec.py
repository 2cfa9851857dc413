"""Pure-stdlib PNG codec (operators/png.py): a REAL compressed image
codec live in every container (zlib is stdlib). Round-trips cover all
five scanline filters and the four supported 8-bit color types; the
Spark tests prove the ``image/png`` media routing runs AHEAD of PIL so
compressed payloads decode even where no image library ships."""

import numpy as np
import pytest

from task_on_dataframes_spark.operators import multimodal as mm
from task_on_dataframes_spark.operators.png import decode_png, encode_png


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("row_filter", [0, 1, 2, 3, 4, None])
def test_roundtrip_every_filter_and_color_type(channels, row_filter):
    rng = np.random.default_rng(channels * 10 + (row_filter or 7))
    a = rng.integers(0, 256, size=(11, 13, channels), dtype=np.uint8)
    out = decode_png(encode_png(a, row_filter=row_filter))
    assert out.shape == a.shape
    assert (out == a).all()


def test_roundtrip_grayscale_2d_input():
    a = np.arange(48, dtype=np.uint8).reshape(6, 8)
    out = decode_png(encode_png(a, row_filter=None))
    assert out.shape == (6, 8, 1)
    assert (out[:, :, 0] == a).all()


def test_decoder_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # drop everything past IHDR: no IDAT ever arrives
    with pytest.raises(Exception):
        decode_png(good[: len(good) // 2])
    # corrupt the deflate stream inside IDAT: zlib must object
    broken = bytearray(good)
    broken[44] ^= 0xFF
    with pytest.raises(Exception):
        decode_png(bytes(broken))


def test_ancillary_chunks_are_skipped():
    import struct
    import zlib

    good = encode_png(np.full((3, 5, 3), 9, dtype=np.uint8))
    # splice a tEXt chunk between IHDR (8 + 25 bytes) and IDAT
    data = b"Comment\x00hi"
    text = (
        struct.pack(">I", len(data))
        + b"tEXt"
        + data
        + struct.pack(">I", zlib.crc32(b"tEXt" + data) & 0xFFFFFFFF)
    )
    spliced = good[:33] + text + good[33:]
    out = decode_png(spliced)
    assert out.shape == (3, 5, 3) and (out == 9).all()


def test_media_meta_routes_png_without_pil(spark):
    payload = encode_png(
        np.zeros((21, 37, 3), dtype=np.uint8), row_filter=None
    )
    media = spark.createDataFrame(
        [(1, payload, "image/png"), (2, b"\x89PNGbroken", "image/png")],
        "media_id long, payload binary, media_type string",
    )
    rows = {
        r["media_id"]: r
        for r in mm.decode_media_meta(media, use_real_codec=False).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (37, 21)
    # corrupt stream falls back to the labeled deterministic fake
    n = len(b"\x89PNGbroken")
    assert rows[2]["width"] == n % 64 + 1


def test_png_resize_is_real_compressed_roundtrip(spark):
    grad = (
        np.arange(16 * 12 * 3, dtype=np.uint8).reshape(12, 16, 3) % 256
    )
    media = spark.createDataFrame(
        [(1, encode_png(grad), "image/png")],
        "media_id long, payload binary, media_type string",
    )
    out = mm.resize_media(media, width=8, height=6).collect()[0]
    decoded = decode_png(bytes(out["payload"]))
    assert decoded.shape == (6, 8, 3)
    assert (decoded == mm.bilinear_resize(grad, 8, 6)).all()


def test_png_pixel_stats_matches_analytic_sum(spark):
    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    stats = {
        r["media_id"]: r
        for r in mm.png_pixel_stats(mm.make_png_media_table(docs)).collect()
    }
    for d in range(20):
        w, h = 8 + d % 9, 6 + d % 7
        expect = sum(
            (d + 3 * x + 5 * y + 7 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        r = stats[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["px_sum"] == expect
        assert r["px_mean"] == round(expect / (w * h * 3), 5)

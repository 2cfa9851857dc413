"""Real-codec path for multimodal decode — exercised wherever PIL is
actually installed (skipped in codec-less containers, where only the
deterministic fake runs). Proves the PIL-gated branch in
``operators/multimodal.py`` is wired, not just guarded."""

import pytest

from task_on_dataframes_spark.operators import multimodal as mm


@pytest.mark.skipif(not mm.HAS_PIL, reason="container ships no codecs")
def test_real_codec_decodes_actual_png_dimensions(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [(1, payload, "image/png")],
        "media_id long, payload binary, media_type string",
    )
    row = mm.decode_media_meta(media, use_real_codec=True).collect()[0]
    assert (row["width"], row["height"]) == (37, 21)


def test_fake_codec_is_deterministic_fallback(spark):
    media = spark.createDataFrame(
        [(1, b"abcdef", "image/png"), (2, b"xy", "audio/wav")],
        "media_id long, payload binary, media_type string",
    )
    out = {
        r["media_id"]: (r["width"], r["height"])
        for r in mm.decode_media_meta(media, use_real_codec=False).collect()
    }
    # fake derives dims from payload length only — stable by construction
    assert out == {1: (6 % 64 + 1, 6 % 48 + 1), 2: (2 % 64 + 1, 2 % 48 + 1)}

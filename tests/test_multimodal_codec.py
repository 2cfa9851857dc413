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


def test_raw_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert (mm.decode_raw_image(mm.encode_raw_image(arr)) == arr).all()


def test_raw_codec_rejects_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.decode_raw_image(b"not an image at all")


def _reference_bilinear(a, width, height):
    # independent scalar reference: same align_corners=False sampling,
    # computed pixel-by-pixel in float64
    import numpy as np

    h, w, c = a.shape
    out = np.zeros((height, width, c))
    for yi in range(height):
        for xi in range(width):
            y = (yi + 0.5) * (h / height) - 0.5
            x = (xi + 0.5) * (w / width) - 0.5
            y0 = min(max(int(np.floor(y)), 0), h - 1)
            x0 = min(max(int(np.floor(x)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(y - y0, 0.0), 1.0)
            wx = min(max(x - x0, 0.0), 1.0)
            out[yi, xi] = (
                a[y0, x0] * (1 - wy) * (1 - wx)
                + a[y0, x1] * (1 - wy) * wx
                + a[y1, x0] * wy * (1 - wx)
                + a[y1, x1] * wy * wx
            )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_bilinear_resize_matches_scalar_reference_on_gradient():
    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    got = mm.bilinear_resize(a, 11, 7)
    ref = _reference_bilinear(a, 11, 7)
    # float32 vs float64 accumulation can differ by 1 after rint at
    # exact-half boundaries; everywhere else they are identical
    assert got.shape == ref.shape == (7, 11, 3)
    assert (np.abs(got.astype(int) - ref.astype(int)) <= 1).all()
    assert (got == ref).mean() > 0.99


def test_bilinear_resize_of_constant_is_exact():
    import numpy as np

    a = np.full((9, 14, 3), (77, 130, 200), dtype=np.uint8)
    out = mm.bilinear_resize(a, 16, 12)
    assert (out.reshape(-1, 3) == (77, 130, 200)).all()


def test_raw_kernels_run_inside_spark_pipeline(spark):
    import numpy as np

    grad = np.arange(0, 96, dtype=np.uint8).reshape(8, 4, 3)
    media = spark.createDataFrame(
        [(1, mm.encode_raw_image(grad), "image/raw")],
        "media_id long, payload binary, media_type string",
    )
    meta = mm.decode_media_meta(media).collect()[0]
    assert (meta["width"], meta["height"], meta["n_frames"]) == (4, 8, 1)

    resized = mm.resize_media(media, width=6, height=5).collect()[0]
    arr = mm.decode_raw_image(bytes(resized["payload"]))
    assert arr.shape == (5, 6, 3)
    ref = _reference_bilinear(grad, 6, 5)
    assert (np.abs(arr.astype(int) - ref.astype(int)) <= 1).all()

    feats = mm.extract_features(media, dims=8).collect()[0]["features"]
    px = grad.ravel()
    hist = np.bincount(px.astype(np.int64) * 8 // 256, minlength=8)
    expect = hist / hist.sum()
    assert np.allclose(feats, expect, atol=1e-6)

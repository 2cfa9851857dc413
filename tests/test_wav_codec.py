"""Pure-stdlib WAV codec (operators/wav.py): a REAL audio container
codec live in every container (RIFF/PCM needs only ``struct``). The
writer is cross-checked against the independent stdlib ``wave`` reader;
the parser round-trips mono/stereo, skips ancillary chunks with the
RIFF odd-size pad, and rejects truncated / non-PCM streams. The Spark
tests prove the ``audio/wav`` media plumbing decodes real containers
inside the Arrow batch loop."""

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from task_on_dataframes_spark.operators import multimodal as mm
from task_on_dataframes_spark.operators.wav import decode_wav, encode_wav


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_roundtrip_and_stdlib_cross_check(channels):
    rng = np.random.default_rng(channels)
    s = rng.integers(-(2**15), 2**15, size=(50, channels)).astype("<i2")
    payload = encode_wav(s, 44100)
    # independent reader agrees with our writer
    w = stdlib_wave.open(io.BytesIO(payload))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
        channels,
        2,
        44100,
    )
    ref = np.frombuffer(w.readframes(50), "<i2").reshape(-1, channels)
    out, rate = decode_wav(payload)
    assert rate == 44100
    assert (out == s).all() and (ref == s).all()


def test_mono_1d_input():
    s = (np.arange(32) * 100 - 1600).astype("<i2")
    out, rate = decode_wav(encode_wav(s, 8000))
    assert out.shape == (32, 1)
    assert (out[:, 0] == s).all()


def test_ancillary_chunks_and_odd_padding_skipped():
    s = np.ones((10, 2), dtype="<i2")
    good = encode_wav(s, 16000)
    chunks = good[12:]  # fmt + data, after RIFF/size/WAVE
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    spliced = (
        b"RIFF"
        + struct.pack("<I", 4 + len(extra) + len(chunks))
        + b"WAVE"
        + extra
        + chunks
    )
    out, rate = decode_wav(spliced)
    assert rate == 16000 and (out == s).all()


def test_rejects_garbage_truncation_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav")
    good = encode_wav(np.zeros((8, 1), dtype="<i2"), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:40])  # truncated data chunk
    # flip the fmt tag to a non-PCM code
    broken = bytearray(good)
    broken[20] = 3  # fmt chunk body starts at 20: format tag
    with pytest.raises(ValueError):
        decode_wav(bytes(broken))


def test_spark_wav_media_pipeline(spark, sf_dir):
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    media = mm.make_wav_media_table(docs_df)
    stats = mm.wav_amplitude_stats(media).orderBy("media_id").collect()
    assert len(stats) == docs_df.count()
    for r in stats:
        d = r.media_id
        assert r.channels == 1 + d % 2
        assert r.n_samples == 64 + d % 65
        assert r.sample_rate == 8000 + 1000 * (d % 5)
        # replay the synthesis rule for one row-exact check
        i, c = np.meshgrid(
            np.arange(r.n_samples), np.arange(r.channels), indexing="ij"
        )
        a = np.abs((d + 7 * i + 997 * c) % 4096 - 2048)
        assert r.amp_sum == int(a.sum()) and r.amp_max == int(a.max())

    feats = mm.wav_frame_features(media, frame_len=16)
    pdf = feats.toPandas()
    # every clip yields n_samples // 16 full frames
    counts = pdf.groupby("media_id").size()
    for d, k in counts.items():
        assert k == (64 + d % 65) // 16
    # energy/zcr of media_id 0, frame 0: s(i) = (7i % 4096) - 2048
    s0 = (7 * np.arange(16)) % 4096 - 2048
    row = pdf[(pdf.media_id == 0) & (pdf.frame_idx == 0)].iloc[0]
    assert row.energy == int((s0.astype(np.int64) ** 2).sum())
    assert row.zero_crossings == int(((s0[:-1] * s0[1:]) < 0).sum())


def test_spark_wav_resample(spark, sf_dir):
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = mm.make_wav_media_table(docs_df)
    out = mm.wav_resample(media, dst_rate=16000).orderBy("media_id")
    for r in out.collect():
        d = r.media_id
        n = 64 + d % 65
        rate = 8000 + 1000 * (d % 5)
        assert r.src_rate == rate and r.n_in == n
        assert r.n_out == (n - 1) * 16000 // rate + 1
        # independent replay: same integer interpolation over the
        # synthesized channel-0 signal
        u = (d + 7 * np.arange(n, dtype=np.int64)) % 4096
        j = np.arange(r.n_out, dtype=np.int64)
        idx, rem = (j * rate) // 16000, (j * rate) % 16000
        nxt = np.minimum(idx + 1, n - 1)
        v = (u[idx] * (16000 - rem) + u[nxt] * rem) // 16000 - 2048
        assert r.amp_sum == int(np.abs(v).sum())
        assert r.amp_max == int(np.abs(v).max())
        assert r.pos_check == int((v * (j % 7 + 1)).sum())
        # and the integer kernel tracks float linear interpolation to
        # within the 1-unit floor quantization
        ref = np.interp(j * rate / 16000.0, np.arange(n), u.astype(float))
        assert np.abs((v + 2048) - ref).max() <= 1.0


def test_resample_identity_when_rates_match(spark):
    # a clip already at 16 kHz must pass through sample-exact
    s = ((np.arange(80) * 13) % 4096 - 2048).astype("<i2")
    media = spark.createDataFrame(
        [(7, bytearray(encode_wav(s, 16000)), "audio/wav")],
        "media_id long, payload binary, media_type string",
    )
    r = mm.wav_resample(media, dst_rate=16000).collect()[0]
    assert r.n_out == r.n_in == 80
    a = np.abs(s.astype(np.int64))
    assert r.amp_sum == int(a.sum()) and r.amp_max == int(a.max())
    j = np.arange(80, dtype=np.int64)
    assert r.pos_check == int((s.astype(np.int64) * (j % 7 + 1)).sum())

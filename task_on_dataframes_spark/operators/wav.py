"""Pure-stdlib WAV (RIFF/PCM) codec: 16-bit PCM, any channel count.

The audio analog of :mod:`.png` — the container ships no audio
libraries, but a RIFF/PCM WAV needs only ``struct``: a ``RIFF`` header,
a ``fmt `` chunk (PCM format tag 1, channels, sample rate, 16-bit),
and a ``data`` chunk of interleaved little-endian int16 frames. This
module implements exactly that, so a REAL audio container codec is
live and testable in any environment:

- :func:`decode_wav` — chunk-walking parser (skips ancillary chunks
  such as ``LIST``/``fact``, honors the RIFF odd-size pad byte),
  returns ``(samples[(n, channels)] int16, sample_rate)``. Raises
  ``ValueError`` on a non-PCM/non-16-bit or truncated stream so the
  mapInPandas callers can route bad rows to the labeled fake instead
  of aborting the Arrow batch.
- :func:`encode_wav` — writes one RIFF/fmt/data stream; tests
  cross-check it against the stdlib ``wave`` module reader so the
  writer and our parser are verified against an independent
  implementation.

Scale note: like the PNG codec, this runs INSIDE the Arrow batch loop
of the ``mapInPandas`` media operators — pure map work, no shuffle, no
driver involvement; it scales with input splits.
"""

from __future__ import annotations

import struct

#: PCM format tag in the ``fmt `` chunk
_WAVE_FORMAT_PCM = 1


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode an ``(n,)`` or ``(n, channels)`` int16 array as a
    RIFF/PCM WAV byte stream (16-bit little-endian, interleaved)."""
    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    data = a.tobytes()  # row-major == interleaved frames
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a RIFF/PCM WAV stream into ``(samples, sample_rate)``
    where ``samples`` is an ``(n, channels)`` int16 array. Walks the
    chunk list, skipping non-``fmt ``/``data`` chunks and honoring the
    odd-size pad byte; raises ``ValueError`` for anything that is not
    16-bit integer PCM or is truncated."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    channels = sample_rate = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > len(payload):
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
            if fmt_tag != _WAVE_FORMAT_PCM or bits != 16:
                raise ValueError("only 16-bit integer PCM is supported")
        elif tag == b"data":
            data = payload[body_start : body_start + size]
        pos = body_start + size + (size & 1)  # RIFF pads odd chunks
    if channels is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % (channels * 2):
        raise ValueError("data chunk is not whole int16 frames")
    return (
        np.frombuffer(data, dtype="<i2").reshape(-1, channels).copy(),
        sample_rate,
    )

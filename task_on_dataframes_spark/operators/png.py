"""Pure-stdlib PNG codec: critical chunks, 8-bit gray/RGB/RGBA, filters 0-4.

The container ships no image libraries, so the compressed-codec media
path was previously untestable (only the ``image/raw`` uncompressed
format had live kernels). zlib IS stdlib, and PNG's critical-chunk
subset is small: signature, IHDR, concatenated IDAT (deflate of
per-row-filtered scanlines), IEND. This module implements exactly
that — a REAL compressed image codec runnable in any container:

- :func:`decode_png` — 8-bit depth, color types 0 (gray), 2 (RGB),
  4 (gray+alpha), 6 (RGBA), all five scanline filters (None / Sub /
  Up / Average / Paeth), no interlace. Ancillary chunks are skipped.
- :func:`encode_png` — writes one IHDR/IDAT/IEND stream; the row
  filter can be fixed or cycled 0..4 so round-trip tests exercise
  every reconstruction path in the decoder.

Scale note: the codec runs per row INSIDE the Arrow batch loop of the
``mapInPandas`` media operators (operators/multimodal.py) — pure map
work that scales with input splits, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(arr, row_filter: int | None = 0) -> bytes:
    """Encode an ``(H, W)`` or ``(H, W, C)`` uint8 array (C in 1/2/3/4)
    as an 8-bit non-interlaced PNG. ``row_filter`` fixes the scanline
    filter (0-4); ``None`` cycles ``row_index % 5`` so a round-trip
    exercises every filter reconstruction in :func:`decode_png`."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row = a[y].reshape(-1).astype(np.int64)
        f = (y % 5) if row_filter is None else row_filter
        if f == 0:
            filt = row
        elif f == 1:  # Sub: left neighbor (same pixel offset)
            left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
            filt = row - (left + prev) // 2
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
            upleft = np.concatenate(
                [np.zeros(ch, dtype=np.int64), prev[:-ch]]
            )
            pred = np.fromiter(
                (
                    _paeth(int(la), int(ub), int(uc))
                    for la, ub, uc in zip(left, prev, upleft)
                ),
                dtype=np.int64,
                count=w * ch,
            )
            filt = row - pred
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced PNG into an ``(H, W, C)`` uint8
    array. Supports color types 0/2/4/6 and filters 0-4; raises
    ``ValueError`` on anything else (palette, 16-bit, interlaced) so
    media routing can fall back per row without aborting the batch."""
    import numpy as np

    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG signature")
    pos, w = 8, None
    idat = bytearray()
    h = bitdepth = ctype = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            w, h, bitdepth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bitdepth != 8 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (bitdepth={bitdepth}, color={ctype})"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported compression/filter/interlace")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        # ancillary chunks: skipped
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            row = line
        elif f == 2:  # Up
            row = (line + prev) % 256
        elif f in (1, 3, 4):
            # left-dependent filters are sequential per pixel; loop over
            # width (vector over channels) — rows are short and this
            # runs inside an executor-side Arrow batch, never the driver
            row = np.zeros(stride, dtype=np.int64)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = row[x * ch - ch : x * ch] if x else np.zeros(ch, dtype=np.int64)
                up = prev[s]
                upleft = (
                    prev[x * ch - ch : x * ch] if x else np.zeros(ch, dtype=np.int64)
                )
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = np.fromiter(
                        (
                            _paeth(int(la), int(ub), int(uc))
                            for la, ub, uc in zip(left, up, upleft)
                        ),
                        dtype=np.int64,
                        count=ch,
                    )
                row[s] = (line[s] + pred) % 256
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out.reshape(h, w, ch)

"""Minimal pure-Python PNG codec for 8-bit grayscale images.

The reference ingests any Leptonica-readable raster (SetImage,
/root/reference/src/api/baseapi.cpp:906). This container has no PIL/leptonica,
so the fixture generator encodes synthetic pages as real 8-bit grayscale PNGs
with this codec and the decode UDF (operators/decode.py) parses them back.
The point is that the media column holds genuine encoded image bytes — the
Spark-side plumbing (BinaryType column → numpy in an Arrow batch) is the real
thing; only the codec is minimal.

Encoder: filter 0 (None) rows, one zlib stream. Decoder: supports all five
standard PNG filters for robustness, grayscale 8-bit only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_gray(img: np.ndarray) -> bytes:
    """uint8 HxW array -> grayscale-8 PNG bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_gray(data: bytes) -> np.ndarray:
    """Grayscale-8 PNG bytes -> uint8 HxW array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only non-interlaced grayscale-8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w < 0:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).copy()
    if not filters.any():
        return out.astype(np.uint8)  # fast path: all-None filters (our encoder)
    for y in range(h):
        f = filters[y]
        row = out[y]
        up = out[y - 1] if y > 0 else np.zeros(w, dtype=np.int32)
        if f == 0:
            continue
        elif f == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif f == 2:  # Up
            out[y] = (row + up) & 0xFF
        elif f == 3:  # Average
            row[0] = (row[0] + up[0] // 2) & 0xFF
            for x in range(1, w):
                row[x] = (row[x] + (row[x - 1] + up[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            row[0] = (row[0] + up[0]) & 0xFF
            for x in range(1, w):
                a, b, c = row[x - 1], up[x], up[x - 1]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8)

"""Minimal pure-Python GIF codec (GIF87a/89a).

The reference ingests any Leptonica-readable raster (SetImage,
/root/reference/src/api/baseapi.cpp:906; pixReadMem sniffs GIF) — GIF is
still common in web corpora, which is exactly the interleaved-document
input this pipeline targets. Like the PNG/TIFF codecs this is from-scratch:
the media column carries genuine encoded bytes, only the codec is minimal.

Decoder: global/local color tables, interlaced row ordering, multi-frame
streams (each frame composites onto the logical-screen canvas; transparent
pixels per the 89a Graphic Control Extension leave the canvas unchanged),
palette collapsed to BT.601 luma. GIF-LZW is LSB-first with the width bump
at table-full (2^w), unlike TIFF-LZW's MSB-first early change.

Encoder (fixture side): single- or multi-frame, optional interlace, one
global palette — so tests carry genuine GIF bytes through the pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import _luma


# ------------------------------------------------------------------- LZW


class _LsbWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def bytes(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = self._nbits = 0
        return bytes(self._out)


class _LsbReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int | None:
        while self._nbits < width:
            if self._pos >= len(self._data):
                return None
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return v


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = _LsbWriter()

    def fresh():
        return ({bytes([i]): i for i in range(1 << min_code_size)},
                eoi + 1, min_code_size + 1)

    table, next_code, width = fresh()
    out.write(clear, width)
    w = b""
    for byte in indices:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        out.write(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # GIF width bump: the encoder emits at the OLD width until the
            # table actually outgrows it (no TIFF-style early change)
            width += 1
        w = c
        if next_code >= 4095:
            out.write(table[w], width)
            out.write(clear, width)
            table, next_code, width = fresh()
            w = b""
    if w:
        out.write(table[w], width)
    out.write(eoi, width)
    return out.bytes()


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    max_out: int | None = None) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    br = _LsbReader(data)
    out = bytearray()

    def fresh():
        return ({i: bytes([i]) for i in range(1 << min_code_size)},
                eoi + 1, min_code_size + 1)

    table, next_code, width = fresh()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if prev is None:
            if code not in table:
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry
        if max_out is not None and len(out) > max_out:
            # decompression-bomb guard: a crafted stream expands ~4096x
            raise ValueError("GIF LZW output exceeds frame size")
    return bytes(out)


# --------------------------------------------------------------- encoder


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(frames: list[np.ndarray] | np.ndarray,
               palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Index frame(s) (uint8 HxW) + palette (Nx3 uint8, default 256-gray)
    -> GIF89a bytes. All frames share the global palette and cover the full
    logical screen (fixture side; the decoder handles partial frames)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    assert frames, "at least one frame"
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    npal = len(palette)
    bits = max(1, int(npal - 1).bit_length())
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"\x00" * ((1 << bits) - npal) * 3
    for img in frames:
        if img.dtype != np.uint8 or img.shape != (h, w):
            raise ValueError("encode_gif frames must be uint8 and same size")
        if int(img.max(initial=0)) >= npal:
            raise ValueError("index out of palette range")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        rows = img[_interlace_order(h)] if interlace else img
        min_code = max(2, bits)
        out.append(min_code)
        enc = _gif_lzw_encode(rows.tobytes(), min_code)
        for k in range(0, len(enc), 255):
            chunk = enc[k:k + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# --------------------------------------------------------------- decoder


def decode_gray_gif(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of uint8 HxW grayscale canvases, one per frame
    (palette collapsed to BT.601 luma; partial frames composited onto the
    logical screen; transparency leaves prior canvas pixels)."""
    try:
        return _decode_gray_gif(data)
    except (struct.error, IndexError) as e:
        # truncated/corrupt bytes surface as the codec-contract ValueError
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gray_gif(data: bytes) -> list[np.ndarray]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    if sw * sh > 100_000_000:   # corrupt-header allocation guard
        raise ValueError("GIF dimensions too large")
    pos = 13
    gpal: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(data[pos:pos + 3 * n],
                             dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    bg_gray = int(_luma(gpal[bg].reshape(1, 1, 3))[0, 0]) \
        if gpal is not None and bg < len(gpal) else 255
    canvas = np.full((sh, sw), bg_gray, dtype=np.uint8)
    pages: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control
                gflags = data[pos + 1]
                transparent = data[pos + 4] if gflags & 1 else None
            while True:
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"bad GIF block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gpal
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        enc = bytearray()
        while True:
            size = data[pos]
            pos += 1
            if size == 0:
                break
            enc += data[pos:pos + size]
            pos += size
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(enc), min_code,
                            max_out=fw * fh + 4096)[:fw * fh],
            dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("truncated GIF frame")
        idx = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            upright = np.empty_like(idx)
            upright[_interlace_order(fh)] = idx
            idx = upright
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index out of palette range")
        gray = _luma(pal[idx])
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF frame exceeds logical screen")
        target = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = idx != transparent
            target[mask] = gray[mask]
        else:
            target[:] = gray
        pages.append(canvas.copy())
        transparent = None
    if not pages:
        raise ValueError("GIF has no frames")
    return pages

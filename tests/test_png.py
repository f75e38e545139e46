from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkstract.functions.png import decode_gray, encode_gray


def test_roundtrip_small():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (decode_gray(encode_gray(img)) == img).all()


def test_roundtrip_page_like():
    rng = np.random.default_rng(0)
    img = (rng.random((200, 300)) * 255).astype(np.uint8)
    out = decode_gray(encode_gray(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gray(b"not a png at all")


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) * 255).astype(np.uint8)
    assert (decode_gray(encode_gray(img)) == img).all()


# ------------------------------------------------------------ color support


def _filtered_png(img: np.ndarray, color: int, filters: list[int],
                  plte: bytes | None = None) -> bytes:
    """Hand-build a PNG whose scanline y uses filter filters[y] — exercises
    the decoder's defilter paths at any bytes-per-pixel."""
    import struct
    import zlib

    from sparkstract.functions.png import _SIG, _chunk

    h = img.shape[0]
    nsamp = 1 if img.ndim == 2 else img.shape[2]
    w = img.shape[1]
    flat = img.reshape(h, w * nsamp).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * nsamp, dtype=np.int32)
    bpp = nsamp
    for y, f in zip(range(h), filters):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = row - pred
        raw.append(f)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _luma_ref(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.int32) for i in range(3))
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)


def test_rgb_roundtrip_luma():
    from sparkstract.functions.png import encode_rgb

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    assert (decode_gray(encode_rgb(img)) == _luma_ref(img)).all()


def test_all_filters_rgb_bpp3():
    """Sub/Up/Average/Paeth at bytes-per-pixel 3: the left neighbour is 3
    bytes back, not 1 — a bpp bug shifts every color plane."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 17, 3), dtype=np.uint8)
    png = _filtered_png(img, color=2, filters=[0, 1, 2, 3, 4])
    assert (decode_gray(png) == _luma_ref(img)).all()


def test_all_filters_gray_bpp1():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 23), dtype=np.uint8)
    png = _filtered_png(img, color=0, filters=[4, 3, 2, 1, 0])
    assert (decode_gray(png) == img).all()


def test_palette_png():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    png = _filtered_png(idx, color=3, filters=[0] * 9, plte=pal.tobytes())
    assert (decode_gray(png) == _luma_ref(pal[idx])).all()


def test_palette_index_out_of_range_raises():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((2, 2), 7, dtype=np.uint8)
    png = _filtered_png(idx, color=3, filters=[0, 0], plte=pal.tobytes())
    with pytest.raises(ValueError, match="palette index"):
        decode_gray(png)


def test_gray_alpha_and_rgba_drop_alpha():
    rng = np.random.default_rng(7)
    ga = rng.integers(0, 256, (6, 8, 2), dtype=np.uint8)
    png = _filtered_png(ga, color=4, filters=[0, 1, 2, 3, 4, 1])
    assert (decode_gray(png) == ga[:, :, 0]).all()
    rgba = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    png = _filtered_png(rgba, color=6, filters=[4, 4, 4, 4, 4, 4])
    assert (decode_gray(png) == _luma_ref(rgba[..., :3])).all()


def test_16bit_gray_high_byte():
    import struct
    import zlib

    from sparkstract.functions.png import _SIG, _chunk

    rng = np.random.default_rng(8)
    img16 = rng.integers(0, 65536, (4, 6), dtype=np.uint16)
    raw = bytearray()
    for y in range(4):
        raw.append(0)
        raw += img16[y].astype(">u2").tobytes()
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    assert (decode_gray(png) == (img16 >> 8).astype(np.uint8)).all()


def test_interlaced_named_out_of_scope():
    import struct
    import zlib

    from sparkstract.functions.png import _SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="out of scope"):
        decode_gray(png)

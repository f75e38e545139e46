"""TIFF codec: roundtrips (none/LZW, single/multipage), dispatch, and the
LZW edge cases (width growth past 511/1023 entries, KwKwK, table reset)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.functions.codecs import decode_gray_any, decode_pages
from sparkstract.functions.png import encode_gray
from sparkstract.functions.tiff import (
    _lzw_decode,
    _lzw_encode,
    decode_gray_tiff,
    encode_gray_tiff,
)


def _img(seed: int, h: int = 40, w: int = 60) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)


def test_roundtrip_uncompressed():
    img = _img(1)
    (out,) = decode_gray_tiff(encode_gray_tiff(img, "none"))
    assert (out == img).all()


def test_roundtrip_lzw():
    img = _img(2, 80, 120)  # noisy → table passes 511 and 1023 entries
    (out,) = decode_gray_tiff(encode_gray_tiff(img, "lzw"))
    assert (out == img).all()


def test_roundtrip_lzw_structured():
    # page-like content: long white runs + ink — high compression path
    img = np.full((120, 200), 255, dtype=np.uint8)
    img[20:30, 10:150] = 0
    img[60:62, :] = 0
    enc = encode_gray_tiff(img, "lzw")
    assert len(enc) < img.size // 2  # it actually compresses
    (out,) = decode_gray_tiff(enc)
    assert (out == img).all()


def test_multipage_roundtrip():
    pages = [_img(3, 30, 40), _img(4, 50, 20), _img(5, 10, 10)]
    outs = decode_gray_tiff(encode_gray_tiff(pages, "lzw"))
    assert len(outs) == 3
    for a, b in zip(pages, outs):
        assert (a == b).all()


def test_lzw_stream_edges():
    # KwKwK pattern (code == next_code on decode)
    data = b"ABABABABABABABA" * 3
    assert _lzw_decode(_lzw_encode(data)) == data
    # force a table reset: >4094 distinct entries
    rng = np.random.default_rng(6)
    big = bytes(rng.integers(0, 256, size=30000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(big)) == big
    assert _lzw_decode(_lzw_encode(b"")) == b""


def test_dispatch():
    img = _img(7)
    assert (decode_gray_any(encode_gray(img)) == img).all()
    assert (decode_gray_any(encode_gray_tiff(img, "lzw")) == img).all()
    assert len(decode_pages(encode_gray_tiff([img, img]))) == 2
    with pytest.raises(ValueError):
        decode_pages(b"GIF89a...")


def test_big_endian_read():
    # hand-flip our writer's output? simpler: synthesize a tiny MM file
    import struct

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    strip = img.tobytes()
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8 + len(strip)))
    out += strip
    entries = [(256, 4, 1, 4), (257, 4, 1, 3), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 8),
               (277, 3, 1, 1), (278, 4, 1, 3), (279, 4, 1, len(strip))]
    out += struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(">HHI", tag, typ, count)
        out += struct.pack(">I", value) if typ == 4 \
            else struct.pack(">HH", value, 0)
    out += struct.pack(">I", 0)
    (got,) = decode_gray_tiff(bytes(out))
    assert (got == img).all()


def test_cyclic_ifd_chain_rejected():
    """A next-IFD pointer cycle must raise, not hang the executor task."""
    import struct

    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_gray_tiff(img))
    # point the (single) IFD's next pointer back at the IFD itself
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    struct.pack_into("<I", data, ifd_off + 2 + 12 * n, ifd_off)
    with pytest.raises(ValueError, match="cyclic"):
        decode_gray_tiff(bytes(data))


def test_exif_orientation_all_values_decode_upright():
    """Orientation tag 274: stored pixels carry any of the 8 EXIF
    transforms; decode must return the upright image (Leptonica applies
    the tag on read — SetImage baseapi.cpp:881)."""
    rng = np.random.default_rng(7)
    upright = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    stored = {
        1: upright, 2: upright[:, ::-1], 3: upright[::-1, ::-1],
        4: upright[::-1, :], 5: upright.T, 6: np.rot90(upright, 1),
        7: upright[::-1, ::-1].T, 8: np.rot90(upright, -1),
    }
    for o, s in stored.items():
        enc = encode_gray_tiff(np.ascontiguousarray(s), "lzw", orientation=o)
        (got,) = decode_gray_tiff(enc)
        assert (got == upright).all(), f"orientation {o}"


def test_exif_orientation_unknown_value_passthrough():
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    enc = encode_gray_tiff(img, orientation=9)  # out-of-spec: lenient
    (got,) = decode_gray_tiff(enc)
    assert (got == img).all()


def test_packbits_roundtrip():
    """Compression 32773 (the other common scan compression besides LZW):
    runs, literals, and the 128-byte batch limits all roundtrip."""
    from sparkstract.functions.tiff import _packbits_decode, _packbits_encode

    rng = np.random.default_rng(13)
    cases = [
        b"", b"A", b"A" * 2, b"A" * 3, b"A" * 200, b"ABCDEF",
        b"AAABBBCCC" * 30, bytes(rng.integers(0, 4, 1000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
    ]
    for raw in cases:
        assert _packbits_decode(_packbits_encode(raw)) == raw
    img = (np.outer(np.arange(37), np.ones(53)) % 7 * 30).astype(np.uint8)
    (got,) = decode_gray_tiff(encode_gray_tiff(img, "packbits"))
    assert (got == img).all()


def test_unknown_compression_named_out_of_scope():
    import struct

    data = bytearray(encode_gray_tiff(np.zeros((4, 4), dtype=np.uint8)))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, pos)
        if tag == 259:
            struct.pack_into("<H", data, pos + 8, 9)  # T.82 JBIG-in-TIFF
    with pytest.raises(ValueError, match="out of scope"):
        decode_gray_tiff(bytes(data))


def test_g4_on_8bit_page_named_error():
    """Compression 4 on a non-bilevel page is malformed — named error,
    not a silent misdecode."""
    import struct

    data = bytearray(encode_gray_tiff(np.zeros((4, 4), dtype=np.uint8)))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, pos)
        if tag == 259:
            struct.pack_into("<H", data, pos + 8, 4)  # CCITT G4
    with pytest.raises(ValueError, match="bilevel"):
        decode_gray_tiff(bytes(data))


# ----------------------------------------------------------------- color


def _luma_ref(rgb):
    r, g, b = (rgb[..., i].astype(np.int32) for i in range(3))
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)


def test_rgb_tiff_luma_roundtrip():
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    for comp in ("none", "lzw", "packbits"):
        (got,) = decode_gray_tiff(encode_gray_tiff(rgb, comp))
        assert (got == _luma_ref(rgb)).all(), comp


def test_rgb_predictor_per_channel():
    """Predictor 2 on RGB differencing runs per CHANNEL (TIFF6 §14): a
    flat-per-channel cumsum would smear color planes into each other."""
    import struct

    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    diff = rgb.astype(np.int16)
    diff[:, 1:, :] = diff[:, 1:, :] - rgb[:, :-1, :].astype(np.int16)
    diff = (diff & 0xFF).astype(np.uint8)
    enc = bytearray(encode_gray_tiff(diff))  # same strip bytes, wrong tags
    # append a fresh IFD carrying predictor=2 over the SAME strip:
    # easier — patch in tag 317 by rebuilding: decode expects the tag, so
    # hand-edit: bump entry count and insert is fiddly; instead rebuild the
    # file manually from the known layout below.
    h, w = 7, 11
    strip = diff.tobytes()
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    strip_off = len(out)
    out += strip
    if len(out) % 2:
        out += b"\x00"
    bits_off = len(out)
    out += struct.pack("<HHH", 8, 8, 8)
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, bits_off),
        (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, strip_off),
        (277, 3, 1, 3), (278, 4, 1, h), (279, 4, 1, len(strip)),
        (317, 3, 1, 2),
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", value) if typ == 4 or count > 2 \
            else struct.pack("<HH", value, 0)
    out += struct.pack("<I", 0)
    (got,) = decode_gray_tiff(bytes(out))
    assert (got == _luma_ref(rgb)).all()


def test_multipage_mixed_gray_and_rgb():
    rng = np.random.default_rng(23)
    gray = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    pages = decode_gray_tiff(encode_gray_tiff([gray, rgb], "lzw"))
    assert (pages[0] == gray).all()
    assert (pages[1] == _luma_ref(rgb)).all()


def test_palette_tiff_colormap_luma():
    """Photometric 3 + ColorMap (tag 320, 16-bit R/G/B planes): indices
    map through the palette and collapse to BT.601 luma."""
    import struct

    rng = np.random.default_rng(81)
    pal8 = rng.integers(0, 256, (16, 3), dtype=np.int64)
    idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
    strip = idx.tobytes()
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    strip_off = len(out)
    out += strip
    if len(out) % 2:
        out += b"\x00"
    cmap_off = len(out)
    cm16 = np.concatenate([pal8[:, 0], pal8[:, 1], pal8[:, 2]]) << 8
    out += cm16.astype("<u2").tobytes()
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)
    entries = [
        (256, 4, 1, 9), (257, 4, 1, 6), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, strip_off), (277, 3, 1, 1),
        (278, 4, 1, 6), (279, 4, 1, len(strip)), (320, 3, 48, cmap_off),
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", value) if typ == 4 or count > 2 \
            else struct.pack("<HH", value, 0)
    out += struct.pack("<I", 0)
    (got,) = decode_gray_tiff(bytes(out))
    r, g, b = (pal8[:, i] for i in range(3))
    luma = ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)
    assert (got == luma[idx]).all()


def test_bilevel_1bit_tiff():
    """1-bit TIFF (WhiteIsZero default and BlackIsZero), MSB-first packed
    rows with byte-aligned row boundaries."""
    import struct

    rng = np.random.default_rng(91)
    bits = rng.integers(0, 2, (5, 11), dtype=np.uint8)
    packed = np.packbits(bits, axis=1)

    def build(photometric):
        strip = packed.tobytes()
        out = bytearray(b"II*\x00\x00\x00\x00\x00")
        strip_off = len(out)
        out += strip
        if len(out) % 2:
            out += b"\x00"
        ifd_off = len(out)
        struct.pack_into("<I", out, 4, ifd_off)
        entries = [
            (256, 4, 1, 11), (257, 4, 1, 5), (258, 3, 1, 1), (259, 3, 1, 1),
            (262, 3, 1, photometric), (273, 4, 1, strip_off), (277, 3, 1, 1),
            (278, 4, 1, 5), (279, 4, 1, len(strip)),
        ]
        out += struct.pack("<H", len(entries))
        for tag, typ, count, value in entries:
            out += struct.pack("<HHI", tag, typ, count)
            out += struct.pack("<I", value) if typ == 4 \
                else struct.pack("<HH", value, 0)
        out += struct.pack("<I", 0)
        return bytes(out)

    (got0,) = decode_gray_tiff(build(0))   # WhiteIsZero: 1 = black
    assert (got0 == np.where(bits == 1, 0, 255)).all()
    (got1,) = decode_gray_tiff(build(1))   # BlackIsZero: 1 = white
    assert (got1 == np.where(bits == 1, 255, 0)).all()


def test_strip_layout_validated_up_front():
    """ADVICE r3: a strip layout that cannot cover the page height must
    raise a named 'strip layout' error before any codec runs — not surface
    as a misleading G4-dimensions failure."""
    import struct

    img = (np.arange(64).reshape(8, 8) % 2 * 255).astype(np.uint8)
    data = bytearray(encode_gray_tiff(img, "g4"))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, pos)
        if tag == 278:  # RowsPerStrip: claim 2 rows from the single strip
            struct.pack_into("<I", data, pos + 8, 2)
    with pytest.raises(ValueError, match="strip layout"):
        decode_gray_tiff(bytes(data))


def test_strip_offsets_counts_mismatch_named():
    """StripOffsets/StripByteCounts disagreeing in count is a container
    defect — named, never a silent zip() truncation."""
    import struct

    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_gray_tiff(img))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, pos)
        if tag == 279:  # claim TWO byte counts against one offset
            struct.pack_into("<I", data, pos + 4, 2)
            struct.pack_into("<I", data, pos + 8, 8)  # out-of-line offset
    with pytest.raises(ValueError, match="StripOffsets"):
        decode_gray_tiff(bytes(data))


# ------------------------------------------------------ tiled layout (§15)


def _tiled_tiff(tile_blobs, w, h, tw, tl, comp=1, extra=()):
    """Little-endian tiled TIFF: header, tile blobs, LONG arrays for tags
    324/325, then the IFD."""
    import struct

    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs = []
    for blob in tile_blobs:
        offs.append(len(out))
        out += blob
    n = len(tile_blobs)

    def put_longs(vals):
        at = len(out)
        for v in vals:
            out.extend(struct.pack("<I", v))
        return at

    off_at = put_longs(offs)
    cnt_at = put_longs([len(b) for b in tile_blobs])
    entries = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
               (259, 3, 1, comp), (262, 3, 1, 1), (277, 3, 1, 1),
               (322, 4, 1, tw), (323, 4, 1, tl),
               (324, 4, n, off_at if n > 1 else offs[0]),
               (325, 4, n, cnt_at if n > 1 else len(tile_blobs[0]))]
    entries += list(extra)
    entries.sort()
    ifd_at = len(out)
    struct.pack_into("<I", out, 4, ifd_at)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHI", tag, typ, count)
        out += (struct.pack("<I", value) if typ == 4
                else struct.pack("<HH", value, 0))
    out += struct.pack("<I", 0)
    return bytes(out)


def _tiles_of(img, tw, tl):
    h, w = img.shape[:2]
    down, across = -(-h // tl), -(-w // tw)
    pad = np.zeros((down * tl, across * tw) + img.shape[2:], img.dtype)
    pad[:h, :w] = img
    return [pad[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw]
            for ty in range(down) for tx in range(across)]


def test_tiled_gray_uncompressed_with_edge_crop():
    img = (np.arange(37 * 53, dtype=np.int64) % 251).astype(
        np.uint8).reshape(37, 53)
    blobs = [t.tobytes() for t in _tiles_of(img, 16, 16)]
    (got,) = decode_gray_tiff(_tiled_tiff(blobs, 53, 37, 16, 16))
    assert (got == img).all()


def test_tiled_lzw_with_predictor_per_tile():
    from sparkstract.functions.tiff import _lzw_encode

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 48), dtype=np.uint8)
    blobs = []
    for t in _tiles_of(img, 16, 16):
        diff = np.diff(t.astype(np.int64), axis=1, prepend=0).astype(
            np.uint8)  # forward horizontal differencing, per tile row
        blobs.append(_lzw_encode(diff.tobytes()))
    data = _tiled_tiff(blobs, 48, 40, 16, 16, comp=5,
                       extra=[(317, 3, 1, 2)])
    (got,) = decode_gray_tiff(data)
    # photometric 1 here (BlackIsZero): no inversion
    assert (got == img).all()


def test_tiled_g4_bilevel():
    from sparkstract.functions.ccitt import g4_encode

    rng = np.random.default_rng(24)
    bits = (rng.random((40, 60)) < 0.25).astype(np.uint8)
    blobs = [g4_encode(t) for t in _tiles_of(bits, 32, 16)]
    data = _tiled_tiff(blobs, 60, 40, 32, 16, comp=4,
                       extra=[(258, 3, 1, 1)])
    # rebuild with bps=1: the helper writes 258=8; patch entries instead
    import struct

    at = data.find(struct.pack("<HHI", 258, 3, 1) + struct.pack("<HH", 8, 0))
    data = (data[:at] + struct.pack("<HHI", 258, 3, 1)
            + struct.pack("<HH", 1, 0) + data[at + 12:])
    (got,) = decode_gray_tiff(data)
    # photometric 1 with bilevel: 1 = white per BlackIsZero
    assert ((got == 255) == (bits == 1)).all()


def test_tiled_layout_mismatch_named_error():
    img = np.zeros((32, 32), dtype=np.uint8)
    blobs = [t.tobytes() for t in _tiles_of(img, 16, 16)]
    data = _tiled_tiff(blobs[:3], 32, 32, 16, 16)  # 4 needed, 3 given
    with pytest.raises(ValueError, match="tile layout"):
        decode_gray_tiff(data)


# ---------------------------------------------------------------------------
# New-style JPEG-in-TIFF (compression 7, TIFF Technical Note 2)
# ---------------------------------------------------------------------------

import struct


def _jpeg_tiff_img(seed=3, shape=(90, 120)):
    rng = np.random.RandomState(seed)
    img = np.full(shape, 255, int)
    img[(rng.rand(*shape) < 0.15)] = 25
    img[40:44, :] = 0
    return img.astype(np.uint8)


def test_jpeg_tiff_single_strip_roundtrip():
    img = _jpeg_tiff_img()
    (out,) = decode_gray_tiff(encode_gray_tiff(img, compression="jpeg"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12  # q=95


def test_jpeg_tiff_multi_strip_roundtrip():
    img = _jpeg_tiff_img()
    data = encode_gray_tiff(img, compression="jpeg", strip_rows=40)
    (out,) = decode_gray_tiff(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_jpeg_tiff_shared_jpegtables():
    """TTN2 abbreviated format: DQT/DHT live once in tag 347 and each
    strip is a tables-less JPEG; the merge must reproduce the image and
    actually save bytes vs repeating tables per strip."""
    img = _jpeg_tiff_img()
    with_tbl = encode_gray_tiff(img, compression="jpeg",
                                jpeg_tables=True, strip_rows=32)
    without = encode_gray_tiff(img, compression="jpeg", strip_rows=32)
    assert len(with_tbl) < len(without)
    (a,) = decode_gray_tiff(with_tbl)
    (b,) = decode_gray_tiff(without)
    assert np.array_equal(a, b)  # same per-strip JPEG payloads either way


def test_jpeg_tiff_multipage():
    img = _jpeg_tiff_img()
    pages = decode_gray_tiff(
        encode_gray_tiff([img, img[::-1].copy()], compression="jpeg"))
    assert len(pages) == 2
    assert np.abs(pages[1].astype(int) - img[::-1].astype(int)).max() <= 12


def test_jpeg_tiff_orientation_tag():
    img = _jpeg_tiff_img(shape=(40, 60))
    data = encode_gray_tiff(img, compression="jpeg", orientation=6)
    (out,) = decode_gray_tiff(data)
    assert out.shape == (60, 40)  # tag 274 un-rotation applied after decode


def test_old_style_jpeg_tiff_named_error():
    img = _jpeg_tiff_img(shape=(24, 32))
    data = bytearray(encode_gray_tiff(img, compression="jpeg"))
    i = data.index(struct.pack("<HH", 259, 3))  # Compression tag
    struct.pack_into("<H", data, i + 8, 6)      # old-style JPEG
    with pytest.raises(ValueError, match="JPEGInterchangeFormat"):
        decode_gray_tiff(bytes(data))


def test_jpeg_tiff_bad_tables_stream():
    img = _jpeg_tiff_img(shape=(24, 32))
    data = bytearray(encode_gray_tiff(img, compression="jpeg",
                                      jpeg_tables=True))
    i = data.index(b"\xff\xd8\xff\xdb")  # the tables-only stream's SOI
    data[i] = 0x00
    with pytest.raises(ValueError, match="JPEGTables"):
        decode_gray_tiff(bytes(data))


def test_jpeg_tiff_strip_missing_soi():
    img = _jpeg_tiff_img(shape=(24, 32))
    data = bytearray(encode_gray_tiff(img, compression="jpeg"))
    i = data.index(b"\xff\xd8\xff")  # first strip SOI
    data[i + 1] = 0x00
    with pytest.raises(ValueError, match="SOI"):
        decode_gray_tiff(bytes(data))


def test_jpeg_tiff_fixture_family():
    from sparkstract.fixtures import gen

    assert "jpeg_tiff_page" in gen.PAGE_FAMILIES
    b = gen._Builder(5)
    b.add_page("jpeg_tiff_page")
    data = bytes(b.media[-1]["image"])
    assert data[:4] == b"II*\x00"
    # the family writes the TTN2 abbreviated layout: tag 347 present
    assert struct.pack("<HH", 347, 7) in data


# ------------------------------------------------------- Deflate (comp 8)


def test_deflate_tiff_roundtrip_strip_and_tile():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    for kw in (dict(compression="deflate"),
               dict(compression="deflate", tile=(32, 16))):
        (out,) = decode_gray_tiff(encode_gray_tiff(img, **kw))
        assert np.array_equal(out, img), kw


def test_deflate_tiff_legacy_32946_alias():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    data = bytearray(encode_gray_tiff(img, "deflate"))
    (ifd,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd)
    for i in range(n):
        pos = ifd + 2 + 12 * i
        if struct.unpack_from("<H", data, pos)[0] == 259:
            struct.pack_into("<H", data, pos + 8, 32946)
    (out,) = decode_gray_tiff(bytes(data))
    assert np.array_equal(out, img)


def test_deflate_tiff_bomb_guard():
    import zlib

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(encode_gray_tiff(img, "deflate"))
    # replace the strip with a stream inflating far past the raster size
    bomb = zlib.compress(b"\x00" * 100_000)
    (ifd,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd)
    for i in range(n):
        pos = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", data, pos)[0]
        if tag == 273:
            struct.pack_into("<I", data, pos + 8, len(data))
        if tag == 279:
            struct.pack_into("<I", data, pos + 8, len(bomb))
    with pytest.raises(ValueError, match="exceeds expected raster"):
        decode_gray_tiff(bytes(data) + bomb)


# ----------------------------------------------------- 16-bit gray pages


def _mk16(img16, fmt="<"):
    h, w = img16.shape
    strip = img16.astype(np.dtype(fmt + "u2")).tobytes()
    magic = b"II*\x00" if fmt == "<" else b"MM\x00*"
    out = bytearray(magic + struct.pack(fmt + "I", 8 + len(strip)))
    out += strip
    entries = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 8),
               (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, len(strip))]
    out += struct.pack(fmt + "H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(fmt + "HHI", tag, typ, count)
        out += (struct.pack(fmt + "I", value) if typ == 4
                else struct.pack(fmt + "HH", value, 0))
    out += struct.pack(fmt + "I", 0)
    return bytes(out)


def test_16bit_gray_tiff_high_byte_both_orders():
    img16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 5000)
    for fmt in ("<", ">"):
        (got,) = decode_gray_tiff(_mk16(img16, fmt))
        assert np.array_equal(got, (img16 >> 8).astype(np.uint8)), fmt


def test_16bit_truncated_raster_raises():
    img16 = np.zeros((4, 4), np.uint16)
    data = bytearray(_mk16(img16))
    # shrink the declared strip to half
    i = data.index(struct.pack("<HH", 279, 4))
    struct.pack_into("<I", data, i + 8, 10)
    with pytest.raises(ValueError, match="truncated 16-bit"):
        decode_gray_tiff(bytes(data))


def test_lzw_early_change_variants():
    """early=True is TIFF's one-entry-early width bump; early=False is
    PDF /EarlyChange 0. Roundtrip both on data long enough to cross the
    9->10->11-bit boundaries, and pin that decoding with the WRONG
    variant diverges (the distinction is real)."""
    from sparkstract.functions.tiff import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(19)
    # low-entropy data grows the table fast enough to cross width bumps
    data = bytes(rng.integers(0, 7, 9000).astype(np.uint8))
    for early in (True, False):
        enc = _lzw_encode(data, early=early)
        assert _lzw_decode(enc, early=early) == data
    enc = _lzw_encode(data, early=False)
    try:
        assert _lzw_decode(enc, early=True) != data
    except ValueError:
        pass


def test_old_style_jpeg_interchange_format():
    """Compression 6 with tags 513/514 (one complete interchange JPEG
    stream — the common 1990s-scanner layout) decodes; the per-table
    fragment layout stays a named error."""
    import struct

    from sparkstract.functions.jpeg import decode_gray_jpeg, encode_gray_jpeg

    img = (np.outer(np.arange(24), np.arange(32)) % 251).astype(np.uint8)
    jstream = encode_gray_jpeg(img, quality=95)
    h, w = img.shape

    def ent(tag, typ, count, val):
        return struct.pack("<HHII", tag, typ, count, val)

    n = 7
    jpeg_off = 8 + 2 + 12 * n + 4
    out = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", n)
           + ent(256, 4, 1, w) + ent(257, 4, 1, h) + ent(258, 3, 1, 8)
           + ent(259, 3, 1, 6) + ent(277, 3, 1, 1)
           + ent(513, 4, 1, jpeg_off) + ent(514, 4, 1, len(jstream))
           + struct.pack("<I", 0) + jstream)
    (page,) = decode_gray_tiff(out)
    assert (page == decode_gray_jpeg(jstream)).all()
    # fragment layout (no 513/514): named error
    out2 = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 5)
            + ent(256, 4, 1, w) + ent(257, 4, 1, h) + ent(258, 3, 1, 8)
            + ent(259, 3, 1, 6) + ent(277, 3, 1, 1)
            + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="JPEGInterchangeFormat"):
        decode_gray_tiff(out2)

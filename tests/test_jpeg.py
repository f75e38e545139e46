"""Baseline JPEG codec: roundtrip fidelity, restart/color paths, seam errors.

Reference contract: SetImage accepts any Leptonica-readable raster
(/root/reference/src/api/baseapi.cpp:881,906); JPEG is the one mainstream
format the container has no library for, so the codec is from scratch and
these tests are its only ground truth.
"""

import numpy as np
import pytest

from sparkstract.functions.codecs import decode_pages
from sparkstract.functions.jpeg import decode_gray_jpeg, encode_gray_jpeg


def _gradient(h=37, w=53, seed=0):
    rng = np.random.default_rng(seed)
    img = np.cumsum(rng.normal(0, 8, (h, w)), axis=1) + 128
    return np.clip(img, 0, 255).astype(np.uint8)


def test_roundtrip_gradient_quality():
    img = _gradient()
    prev_err = None
    for q in (95, 75, 50):
        dec = decode_gray_jpeg(encode_gray_jpeg(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = float(np.abs(dec.astype(int) - img.astype(int)).mean())
        assert err < 8.0
        if prev_err is not None:
            assert err >= prev_err - 0.5  # lower quality, no better error
        prev_err = err


def test_roundtrip_bilevel_text_separable():
    """Glyph-shaped bilevel content must survive q95 Otsu-separably — the
    property the jpeg_page fixture family relies on."""
    img = np.full((40, 64), 255, np.uint8)
    img[8:12, 4:60] = 0
    img[20:33, 10:14] = 0
    dec = decode_gray_jpeg(encode_gray_jpeg(img, quality=95))
    assert ((dec < 128) == (img < 128)).all()


def test_non_multiple_of_8_dims():
    img = _gradient(17, 23, seed=3)
    dec = decode_gray_jpeg(encode_gray_jpeg(img, quality=90))
    assert dec.shape == (17, 23)


def test_restart_markers():
    img = _gradient(40, 48, seed=1)
    plain = decode_gray_jpeg(encode_gray_jpeg(img, quality=90))
    enc = encode_gray_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    assert np.array_equal(decode_gray_jpeg(enc), plain)


def test_color_stream_decodes_luma():
    img = _gradient(24, 32, seed=2)
    gray = decode_gray_jpeg(encode_gray_jpeg(img, quality=90))
    color = decode_gray_jpeg(encode_gray_jpeg(img, quality=90, color=True))
    # same luma data, constant chroma: identical reconstruction
    assert np.array_equal(color, gray)


def test_codec_dispatch():
    img = _gradient(16, 16)
    pages = decode_pages(encode_gray_jpeg(img, quality=95))
    assert len(pages) == 1 and pages[0].shape == (16, 16)


def test_progressive_named_error():
    enc = bytearray(encode_gray_jpeg(_gradient(16, 16), quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_gray_jpeg(bytes(enc))


def test_truncated_raises():
    enc = encode_gray_jpeg(_gradient(32, 32), quality=90)
    with pytest.raises(ValueError):
        decode_gray_jpeg(enc[: len(enc) // 2])


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"\x00\x01\x02\x03")


def test_oversized_dims_guarded():
    """A corrupt SOF must fail fast, not allocate a multi-GB buffer
    (CheckAndReportIfImageTooLarge, baseapi.cpp:354)."""
    enc = bytearray(encode_gray_jpeg(_gradient(16, 16), quality=90))
    i = enc.find(b"\xff\xc0")
    enc[i + 5 : i + 9] = (60000).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="too large"):
        decode_gray_jpeg(bytes(enc))


def test_decoder_total_on_mutations():
    """Byte-flipped streams must terminate promptly — either decode or
    raise; the pipeline's decode-failure isolation handles the rest."""
    rng = np.random.default_rng(11)
    img = _gradient(24, 24, seed=5)
    base = bytearray(encode_gray_jpeg(img, quality=85))
    for _ in range(200):
        enc = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            enc[int(rng.integers(0, len(enc)))] = int(rng.integers(0, 256))
        try:
            out = decode_gray_jpeg(bytes(enc))
            assert out.dtype == np.uint8
        except Exception:
            pass  # corrupt media is data, not a bug


def test_sixteen_bit_quant_table_read():
    """DQT with Pq=1 (16-bit entries) must parse — external encoders use
    it at very high quality."""
    enc = bytearray(encode_gray_jpeg(_gradient(16, 16), quality=90))
    i = enc.find(b"\xff\xdb")
    ln = int.from_bytes(enc[i + 2 : i + 4], "big")
    body = enc[i + 5 : i + 4 + ln - 2]  # 64 8-bit entries
    wide = b"".join(int(b).to_bytes(2, "big") for b in body)
    seg = b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10" + wide
    patched = bytes(enc[:i]) + seg + bytes(enc[i + 4 + ln - 2 :])
    assert np.array_equal(decode_gray_jpeg(patched),
                          decode_gray_jpeg(bytes(enc)))


def test_exif_orientation_app1_roundtrip():
    """APP1 Exif Orientation: the tagged decode equals the untagged decode
    put through the same transform (exact equality — identical DCT data,
    the tag only adds the upright step)."""
    from sparkstract.functions.raster import apply_exif_orientation

    rng = np.random.default_rng(11)
    for o in (2, 3, 4, 5, 6, 7, 8):
        stored = rng.integers(0, 256, (16, 24), dtype=np.uint8)
        plain = decode_gray_jpeg(encode_gray_jpeg(stored, quality=95))
        tagged = decode_gray_jpeg(
            encode_gray_jpeg(stored, quality=95, exif_orientation=o))
        assert (tagged == apply_exif_orientation(plain, o)).all(), o


def test_exif_malformed_blob_is_ignored():
    """A truncated/garbage Exif payload must degrade to orientation 1,
    not fail the image."""
    img = _gradient(16, 16, seed=3)
    enc = bytearray(encode_gray_jpeg(img, quality=95, exif_orientation=6))
    i = enc.find(b"Exif\x00\x00")
    enc[i + 6 : i + 10] = b"XXXX"  # smash the TIFF byte-order header
    plain = decode_gray_jpeg(encode_gray_jpeg(img, quality=95))
    assert np.array_equal(decode_gray_jpeg(bytes(enc)), plain)

"""JBIG2 embedded-organization decode (functions/jbig2.py): MMR generic
regions over the shared fax machinery, named errors for every
out-of-scope coding family, and the PDF /JBIG2Decode + /JBIG2Globals
seam (ISO 32000 §7.4.7; T.88 §7.2 segment headers)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.functions.jbig2 import (
    _segment_header,
    decode_jbig2,
    encode_jbig2,
)
from sparkstract.functions.pdf import encode_simple_pdf, parse_pdf


def _bits(seed: int = 2, shape=(137, 211)) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < 0.2).astype(np.uint8)


# ----------------------------------------------------------- roundtrips


@pytest.mark.parametrize("stripes", [1, 2, 5])
def test_roundtrip_striped_regions(stripes):
    bits = _bits()
    got = decode_jbig2(encode_jbig2(bits, stripes=stripes))
    assert (got == bits).all()


def test_globals_stream_carries_page_info():
    bits = _bits()
    full = encode_jbig2(bits)
    split = 11 + 19  # page-info segment: header + body
    got = decode_jbig2(full[split:], globals_data=full[:split])
    assert (got == bits).all()


def test_region_without_page_info_sizes_itself():
    bits = _bits(shape=(40, 64))
    full = encode_jbig2(bits)
    got = decode_jbig2(full[11 + 19:])  # drop page info entirely
    assert (got == bits).all()


def test_composition_operators():
    a = np.zeros((8, 8), np.uint8)
    a[:4] = 1
    header = encode_jbig2(a)[: 11 + 19]

    def region(bits, op):
        h, w = bits.shape
        from sparkstract.functions.ccitt import g4_encode

        body = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + (0).to_bytes(8, "big") + bytes([op, 0x01])
                + g4_encode(bits))
        return _segment_header(1, 39, 1, len(body)) + body

    b = np.zeros((8, 8), np.uint8)
    b[:, :4] = 1
    got_or = decode_jbig2(header + region(a, 0) + region(b, 0))
    assert (got_or == (a | b)).all()
    got_xor = decode_jbig2(header + region(a, 0) + region(b, 2))
    assert (got_xor == (a ^ b)).all()
    got_and = decode_jbig2(header + region(a, 0) + region(b, 1))
    assert (got_and == (a & b)).all()
    got_rep = decode_jbig2(header + region(a, 0) + region(b, 4))
    assert (got_rep == b).all()


# --------------------------------------------------------- named errors


def _tamper_generic_flags(data: bytes, new_flags: int) -> bytes:
    # generic flags byte sits right after the 17-byte region info of the
    # first region segment (which follows the 30-byte page-info segment)
    i = 30 + 11 + 17
    return data[:i] + bytes([new_flags]) + data[i + 1:]


def test_arithmetic_region_named_error():
    data = _tamper_generic_flags(encode_jbig2(_bits()), 0x00)
    with pytest.raises(ValueError, match="MQ coder"):
        decode_jbig2(data)


def test_tpgdon_with_mmr_rejected():
    data = _tamper_generic_flags(encode_jbig2(_bits()), 0x09)
    with pytest.raises(ValueError, match="TPGDON"):
        decode_jbig2(data)


@pytest.mark.parametrize("seg_type,msg", [
    (0, "symbol/text"), (4, "symbol/text"), (16, "halftone"),
    (20, "halftone"), (40, "refinement"), (53, "code tables"),
    (36, "intermediate"),
])
def test_out_of_scope_segment_types_named(seg_type, msg):
    data = encode_jbig2(_bits())[:30] + _segment_header(1, seg_type, 1, 0)
    with pytest.raises(ValueError, match=msg):
        decode_jbig2(data)


def test_unknown_length_named_error():
    hdr = _segment_header(0, 48, 1, 0)
    data = hdr[:-4] + b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="unknown segment length"):
        decode_jbig2(data)


def test_truncated_stream_raises():
    data = encode_jbig2(_bits())
    with pytest.raises(ValueError, match="truncated"):
        decode_jbig2(data[:40])


def test_region_outside_page_rejected():
    bits = _bits(shape=(8, 8))
    full = encode_jbig2(bits)
    # shrink the declared page to 4x4; the 8x8 region now overflows
    data = bytearray(full)
    data[11:15] = (4).to_bytes(4, "big")
    data[15:19] = (4).to_bytes(4, "big")
    with pytest.raises(ValueError, match="outside page bounds"):
        decode_jbig2(bytes(data))


def test_page_bomb_guard():
    page_info = ((1 << 20).to_bytes(4, "big") + (1 << 20).to_bytes(4, "big")
                 + (0).to_bytes(8, "big") + bytes([0]) + (0).to_bytes(2, "big"))
    data = _segment_header(0, 48, 1, len(page_info)) + page_info
    with pytest.raises(ValueError, match="too large"):
        decode_jbig2(data)


def test_no_region_rejected():
    with pytest.raises(ValueError, match="no region"):
        decode_jbig2(_segment_header(0, 49, 1, 0))


# ----------------------------------------------------------- PDF seam


def _page_img() -> np.ndarray:
    rng = np.random.default_rng(21)
    return np.where(rng.random((40, 64)) < 0.2, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("encrypt", [False, True])
def test_pdf_jbig2_image_roundtrip_exact(encrypt):
    img = _page_img()
    data = encode_simple_pdf([[("jbig2_image", img, 0, 0)]],
                             page_size=(64, 40), encrypt=encrypt)
    (page,) = parse_pdf(data)
    got = next(it for it in page.items if it[0] == "image")[1]
    assert (got == img).all()


def test_pdf_jbig2_fixture_family_builds():
    from sparkstract.fixtures.gen import _Builder

    b = _Builder(seed=9)
    ref, blocks = b.add_page("pdf_jbig2_page")
    assert blocks and b.media[-1]["image"][:5] == b"%PDF-"

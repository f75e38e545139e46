"""PNM/BMP codecs, dispatch, and the music-staff mask."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.functions.codecs import decode_gray_any, decode_pages
from sparkstract.functions.raster import (
    decode_gray_bmp,
    decode_gray_pnm,
    encode_gray_bmp,
    encode_gray_pnm,
)


def _img(seed: int, h: int = 30, w: int = 45) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)


def test_pnm_roundtrips():
    img = _img(1)
    assert (decode_gray_pnm(encode_gray_pnm(img, binary=True)) == img).all()
    assert (decode_gray_pnm(encode_gray_pnm(img, binary=False)) == img).all()


def test_pnm_comments_and_maxval():
    data = b"P5\n# a comment line\n3 2\n# another\n255\n" + bytes(range(6))
    out = decode_gray_pnm(data)
    assert out.shape == (2, 3) and out[1, 2] == 5
    # non-255 maxval rescales
    data = b"P2\n2 1\n100\n0 100\n"
    out = decode_gray_pnm(data)
    assert list(out[0]) == [0, 255]


def test_bmp_roundtrip_padding():
    # width not divisible by 4 exercises the row stride
    for w in (45, 46, 47, 48):
        img = _img(2, 10, w)
        assert (decode_gray_bmp(encode_gray_bmp(img)) == img).all()


def test_dispatch_all_formats():
    img = _img(3)
    assert (decode_gray_any(encode_gray_pnm(img)) == img).all()
    assert (decode_gray_any(encode_gray_bmp(img)) == img).all()
    with pytest.raises(ValueError, match="JPEG"):
        decode_pages(b"\xff\xd8\xff\xe0 fake jpeg")


def test_music_staff_mask():
    """pagesegmain.cpp:253: a tight 5-line staff (+ note dots) is ONE image
    region; a lone separator rule stays a horz_line."""
    from sparkstract.fixtures.render import PageSpec, Rule, StaffLines, Text, render_page
    from sparkstract.operators.page import analyse_page

    img, truth = render_page(PageSpec(elements=[
        Text(["FOX DOG CAT RUN"], col=0),
        StaffLines(n_lines=5, pitch_units=4, n_notes=4, col=0),
        Rule(col=0),
        Text(["END OF THE PAGE"], col=0),
    ], scale=2))
    got = [(b.kind, b.text) for b in analyse_page(img)]
    want = [(t.kind, t.text) for t in truth]
    assert got == want
    kinds = [k for k, _ in got]
    assert kinds.count("flowing_image") == 1  # the staff, once
    assert kinds.count("horz_line") == 1      # the lone rule survives

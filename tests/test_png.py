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

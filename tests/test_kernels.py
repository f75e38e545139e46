"""Pure-numpy kernel tests — mirrors the reference's kernel-level unit tests
(stats_test.cc, rect_test.cc, linlsq_test.cc; see SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkstract.fixtures.font import DECODE_CHARS, GLYPHS, decode_glyph
from sparkstract.functions.cclabel import label_blobs
from sparkstract.functions.otsu import binarize, otsu_threshold
from sparkstract.operators.page import _xy_cut


class TestOtsu:
    def test_bimodal(self):
        # two clean modes at 20 and 220 → threshold strictly between
        img = np.array([[20] * 50 + [220] * 50], dtype=np.uint8)
        t = otsu_threshold(img)
        assert 20 <= t < 220

    def test_constant_image_no_ink(self):
        img = np.full((10, 10), 255, dtype=np.uint8)
        assert otsu_threshold(img) == -1
        assert not binarize(img).any()

    def test_between_class_variance_argmax(self):
        # hand-checkable: equal halves at 0 and 255 → t maximizing
        # w0*w1*(mu0-mu1)^2 is anywhere in [0,254]; ink = dark side only
        img = np.array([[0] * 10 + [255] * 10], dtype=np.uint8)
        b = binarize(img)
        assert b[:, :10].all() and not b[:, 10:].any()

    @given(st.integers(1, 254), st.integers(2, 40), st.integers(2, 40))
    @settings(max_examples=25, deadline=None)
    def test_separates_two_levels(self, t_lo, n_dark, n_light):
        img = np.array([[t_lo - 1] * n_dark + [t_lo + 100 if t_lo + 100 < 256 else 255] * n_light],
                       dtype=np.uint8)
        if int(img.min()) == int(img.max()):
            return
        b = binarize(img)
        assert b[:, :n_dark].all() and not b[:, n_dark:].any()


class TestCCLabel:
    def test_empty(self):
        assert len(label_blobs(np.zeros((5, 5), dtype=bool))) == 0

    def test_single_rect(self):
        ink = np.zeros((10, 10), dtype=bool)
        ink[2:5, 3:8] = True
        b = label_blobs(ink)
        assert len(b) == 1
        assert (b.left[0], b.top[0], b.right[0], b.bottom[0]) == (3, 2, 7, 4)
        assert b.area[0] == 15

    def test_two_components(self):
        ink = np.zeros((10, 10), dtype=bool)
        ink[1, 1] = True
        ink[8, 8] = True
        assert len(label_blobs(ink)) == 2

    def test_8_connectivity_diagonal(self):
        ink = np.zeros((4, 4), dtype=bool)
        ink[0, 0] = True
        ink[1, 1] = True  # diagonal touch → one component under 8-conn
        b = label_blobs(ink)
        assert len(b) == 1
        assert b.area[0] == 2

    def test_u_shape_merges(self):
        # two vertical arms joined at the bottom: union-find must merge
        ink = np.zeros((5, 5), dtype=bool)
        ink[0:4, 0] = True
        ink[0:4, 4] = True
        ink[4, :] = True
        b = label_blobs(ink)
        assert len(b) == 1

    def test_all_glyphs_label(self):
        for ch, bits in GLYPHS.items():
            b = label_blobs(bits)
            assert len(b) >= 1, ch
            assert int(b.area.sum()) == int(bits.sum()), ch

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=20, deadline=None)
    def test_area_conservation(self, seed):
        rng = np.random.default_rng(seed)
        ink = rng.random((30, 30)) < 0.3
        b = label_blobs(ink)
        assert int(b.area.sum()) == int(ink.sum())


class TestFont:
    def test_decode_exact(self):
        for ch, bits in GLYPHS.items():
            assert decode_glyph(bits) == ch

    def test_decode_one_bit_noise(self):
        # flipping one pixel must still decode to the same char for most
        # glyphs (hamming fallback) — check a known-robust one
        bits = GLYPHS["H"].copy()
        bits[3, 1] ^= True
        assert decode_glyph(bits) == "H"

    def test_lut_covers_alphabet(self):
        for ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789":
            assert ch in DECODE_CHARS


class TestXYCut:
    """F05: the reading-order comparator property from layout_test.cc:122-147:
    if two blocks x-overlap the upper one reads first; otherwise left first."""

    def _boxes_2x2(self):
        # A(top-left) C(bottom-left, taller) B(top-right) D(bottom-right)
        return {
            "A": (0, 0, 40, 20), "C": (0, 40, 40, 100),
            "B": (60, 0, 100, 50), "D": (60, 70, 100, 90),
        }

    def test_column_major_2x2(self):
        names = list(self._boxes_2x2())
        boxes = list(self._boxes_2x2().values())
        order = _xy_cut(boxes, list(range(4)))
        assert [names[i] for i in order] == ["A", "C", "B", "D"]

    def test_horizontal_band_first(self):
        # full-width heading above two columns → heading, left col, right col
        boxes = [(0, 0, 100, 10), (0, 20, 40, 90), (60, 20, 100, 90)]
        assert _xy_cut(boxes, [0, 1, 2]) == [0, 1, 2]

    @given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                    min_size=1, max_size=8, unique=True))
    @settings(max_examples=40, deadline=None)
    def test_rough_order_invariant(self, cells):
        # place boxes on a sparse grid (guaranteed gaps) and verify the
        # VerifyRoughBlockOrder invariant pairwise
        boxes = [(cx * 20, cy * 20, cx * 20 + 10, cy * 20 + 10) for cx, cy in cells]
        order = _xy_cut(boxes, list(range(len(boxes))))
        assert sorted(order) == list(range(len(boxes)))
        pos = {i: r for r, i in enumerate(order)}
        for i in range(len(boxes)):
            for j in range(len(boxes)):
                li, ti, ri, bi = boxes[i]
                lj, tj, rj, bj = boxes[j]
                x_overlap = min(ri, rj) >= max(li, lj)
                if x_overlap and bi < tj:  # i strictly above j, same column
                    assert pos[i] < pos[j]

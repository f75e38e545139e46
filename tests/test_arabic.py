"""Arabic cursive script (VERDICT r4 item 3): positional glyph forms,
baseline word fusion + the bottom-half splitter, 8-way script vote ->
RTL, presentation-form normalization. Reference contract: Arabic rides
the same unicharset/bidi machinery as Hebrew (resultiterator.cpp:285);
the fused-word un-split mirrors devanagari_processing.cpp vertically."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.fixtures.font import (
    ARABIC_DUAL,
    ARABIC_JOINED_FORM,
    ARABIC_NORM,
    ARABIC_RIGHT_JOIN,
    GLYPHS,
    STRONG_ARABIC,
    STRONG_RTL,
    shape_arabic,
)
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import PageSpec, Text, render_page
from sparkstract.functions.cclabel import label_blobs
from sparkstract.operators.page import (
    _page_script,
    _split_shiro_rekha,
    analyse_page,
    binarize,
)


# ------------------------------------------------------------- shaping


def test_shaping_rules():
    # dual-joiner followed by a joinable letter -> joined form
    assert shape_arabic("بتن") == (ARABIC_JOINED_FORM["ب"]
                                   + ARABIC_JOINED_FORM["ت"] + "ن")
    # right-joining-only letters never take a joined form
    assert shape_arabic("ادر") == "ادر"
    # last letter never joins forward
    assert shape_arabic("سم")[-1] == "م"
    # a dual-joiner before a right-joiner still joins forward
    assert shape_arabic("بد") == ARABIC_JOINED_FORM["ب"] + "د"


def test_norm_is_inverse_of_shaping():
    for w in ("بتن", "سملع", "ادر", "فو", "معسد"):
        assert "".join(ARABIC_NORM.get(c, c) for c in shape_arabic(w)) == w


def test_form_sets_consistent():
    assert set(ARABIC_JOINED_FORM) == set(ARABIC_DUAL)
    assert not (ARABIC_DUAL & ARABIC_RIGHT_JOIN)
    assert STRONG_ARABIC <= STRONG_RTL
    # every form is a real glyph
    for c in STRONG_ARABIC:
        assert c in GLYPHS


def test_glyph_structure_invariants():
    for c in STRONG_ARABIC:
        g = GLYPHS[c]
        assert g[6, :].all(), c          # connected baseline (bottom row)
        assert g[4, :].all(), c          # body shelf on the baseline
        assert g[5, :].sum() <= 2, c     # sparse row 5 -> 1-row stroke
        assert g[0, :].any(), c          # ink at the top edge


# ------------------------------------------------------- baseline split


def _fused_word_ink(word: str, scale: int = 2):
    spec = PageSpec(elements=[Text([shape_arabic(word)],
                                   truth_lines=[word], col=0)],
                    scale=scale, width_chars=len(word) + 2, seed=3)
    img, _ = render_page(spec)
    return binarize(img)


def test_joined_word_is_one_component_then_splits():
    ink = _fused_word_ink("بتن")
    b = label_blobs(ink)
    # fully-joined 3-letter word -> ONE fused component
    assert b.left.shape[0] == 1
    nl, nt, nr, nb = _split_shiro_rekha(ink, b.left, b.top, b.right,
                                        b.bottom)
    assert nl.shape[0] == 3              # one box per letter
    # boxes span the full glyph height (top marks through baseline)
    assert (nb - nt + 1 == 14).all()


def test_non_joining_word_stays_per_letter():
    ink = _fused_word_ink("ادر")         # right-joiners: no forward joins
    b = label_blobs(ink)
    assert b.left.shape[0] == 3
    nl, _, _, _ = _split_shiro_rekha(ink, b.left, b.top, b.right, b.bottom)
    assert nl.shape[0] == 3              # splitter leaves them alone


def test_devanagari_headline_still_splits():
    # the bottom-half branch must not regress the top-half one
    spec = PageSpec(elements=[Text(["कखग"], truth_lines=["कखग"], col=0)],
                    scale=2, width_chars=5, seed=3)
    img, _ = render_page(spec)
    ink = binarize(img)
    b = label_blobs(ink)
    assert b.left.shape[0] == 1
    nl, _, _, _ = _split_shiro_rekha(ink, b.left, b.top, b.right, b.bottom)
    assert nl.shape[0] == 3


def test_mid_height_stroke_not_split():
    # a stroke just below half-height is neither headline (top half)
    # nor baseline (bottom-edge-flush) — must stay unsplit
    ink = np.zeros((14, 40), np.uint8)
    ink[8:10, :] = 1
    ink[0:14, 0:2] = 1
    ink[0:14, 38:40] = 1
    b = label_blobs(ink)
    nl, _, _, _ = _split_shiro_rekha(ink, b.left, b.top, b.right, b.bottom)
    assert nl.shape[0] == b.left.shape[0]


# -------------------------------------------------------------- e2e


@pytest.mark.parametrize("strategy", ["template", "model",
                                      "model-degraded"])
def test_arabic_page_decodes_to_logical_truth(strategy):
    rng = np.random.default_rng(17)
    for fam in ("arabic_page", "arabic_bidi_page"):
        spec = page_spec(fam, rng)
        img, truth = render_page(spec)
        got = [(b.kind, b.text) for b in
               analyse_page(img, recognizer=strategy)]
        want = [(t.kind, t.text) for t in truth]
        assert got == want, (fam, strategy)


def test_script_vote_is_arabic_and_flips_rtl():
    rng = np.random.default_rng(23)
    spec = page_spec("arabic_page", rng)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    assert _page_script(blocks) == "arabic"
    # word order came out logical (RTL): equality with truth proves the
    # flip happened without any rtl config flag
    assert [b.text for b in blocks] == [t.text for t in truth]


def test_mixed_arabic_latin_digits_bidi():
    a1, a2, a3 = "بتن", "سمل", "عفد"
    pos = (f"{shape_arabic(a1)} {shape_arabic(a2)} "
           f"FOX 12 DOG {shape_arabic(a3)}")
    want = f"{a3} FOX 12 DOG {a2} {a1}"
    spec = PageSpec(elements=[Text([pos], truth_lines=[want], col=0)],
                    scale=2, width_chars=26, rtl=True, seed=6)
    img, _ = render_page(spec)
    blocks = analyse_page(img)
    assert [b.text for b in blocks] == [want]

"""F9 shiro-rekha splitter (reference
/root/reference/src/textord/devanagari_processing.cpp:231
SplitWordShiroRekha): Devanagari words arrive as ONE connected component
(the headline fuses every letter and the padding between them); the
kernel must split the fused blob back into per-letter boxes before the
row/pitch/decode machinery runs, and must NOT split anything that merely
looks wide (rules, solid boxes, ordinary wide-tracked Latin)."""

import numpy as np

from sparkstract.fixtures.font import GLYPHS, STRONG_DEVANAGARI
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import (PageSpec, Text, _render_line,
                                         render_page)
from sparkstract.functions.cclabel import label_blobs
from sparkstract.functions.otsu import binarize
from sparkstract.operators.page import (_page_script, _split_shiro_rekha,
                                        analyse_page)


def _boxes(ink):
    b = label_blobs(ink)
    return (b.left.astype(np.int64), b.top.astype(np.int64),
            b.right.astype(np.int64), b.bottom.astype(np.int64))


def test_glyph_family_invariants():
    """Each Devanagari glyph is one 8-connected CC (no detached serifs —
    a stray island would survive the split as phantom noise), carries the
    full-ink headline row, and has body ink in every column (a zero body
    column would let the splitter cut inside the glyph)."""
    assert len(STRONG_DEVANAGARI) >= 8
    for ch in STRONG_DEVANAGARI:
        bits = GLYPHS[ch]
        assert bits[0, :].all(), ch
        assert bits[1:, :].any(axis=0).all(), ch
        assert len(label_blobs(bits)) == 1, ch


def test_word_fuses_to_one_cc_and_splits_to_letters():
    """The rendered word is ONE CC (the splitter has real work to do);
    _split_shiro_rekha recovers exactly the per-letter glyph boxes the
    unfused rendering would have produced."""
    s = 2
    canvas = np.full((40, 80), 255, dtype=np.uint8)
    _render_line(canvas, 4, 4, "कखग", s)
    ink = binarize(canvas)
    tl, tt, tr, tb = _boxes(ink)
    assert tl.shape[0] == 1  # fused: headline connects all three letters
    l, t, r, b = _split_shiro_rekha(ink, tl, tt, tr, tb)
    got = sorted(zip(l.tolist(), t.tolist(), r.tolist(), b.tolist()))
    assert got == [(4, 4, 13, 17), (16, 4, 25, 17), (28, 4, 37, 17)]


def test_guards_leave_non_devanagari_untouched():
    """Safeguards from the reference (devanagari_processing.cpp:249-262):
    a solid wide box (stroke == height) and a thin rule are never split,
    and a single glyph fails the width prefilter outright."""
    ink = np.zeros((30, 120), dtype=bool)
    ink[3:9, 4:100] = True       # wide solid bar: stroke == height
    ink[20:22, 4:110] = True     # thin rule
    tl, tt, tr, tb = _boxes(ink)
    n0 = tl.shape[0]
    l, t, r, b = _split_shiro_rekha(ink, tl, tt, tr, tb)
    assert l.shape[0] == n0
    # single glyph: w (10) < 2*h (28) — prefilter rejects before any
    # histogram work
    canvas = np.full((40, 40), 255, dtype=np.uint8)
    _render_line(canvas, 4, 4, "क", 2)
    ink1 = binarize(canvas)
    tl, tt, tr, tb = _boxes(ink1)
    l, t, r, b = _split_shiro_rekha(ink1, tl, tt, tr, tb)
    assert l.shape[0] == tl.shape[0]


def test_devanagari_page_decodes_exactly():
    """End-to-end: the fixture family decodes verbatim (split → rows →
    measured 6s pitch → per-cell LUT match), and the five-way script vote
    elects devanagari without flipping reading order (LTR script)."""
    rng = np.random.default_rng(11)
    img, truth = render_page(page_spec("devanagari_page", rng))
    blocks = analyse_page(img)
    assert [b.text for b in blocks] == [t.text for t in truth]
    assert _page_script(blocks) == "devanagari"


def test_mixed_devanagari_latin_line():
    """A line mixing a fused Devanagari word with Latin words keeps both:
    the splitter fires only on the fused CC and the word gaps survive."""
    spec = PageSpec(elements=[Text(["कखग FOX दकन", "DOG मरस CAT"], col=0)],
                    scale=2, width_chars=13)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    assert [b.text for b in blocks] == [t.text for t in truth]

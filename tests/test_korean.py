"""Hangul (Korean) script family: square syllable-block glyphs over the
ORDINARY space-separated word segmenter (unlike cjk_page's pitch engine),
with the 8-way script vote picking 'hangul' — an identification-only LTR
win like greek/cyrillic (osdetect.cpp:286 scores every script)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.fixtures.font import GLYPHS, STRONG_HANGUL
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import render_page
from sparkstract.operators.page import _page_script, analyse_page


def test_hangul_glyphs_single_component():
    # every block is drawn as ONE 8-connected component, so the ordinary
    # blob path handles it without the CJK multi-blob merge
    from sparkstract.functions.cclabel import label_blobs

    for ch in STRONG_HANGUL:
        assert len(label_blobs(GLYPHS[ch])) == 1, ch


def test_korean_page_decodes_and_votes_hangul():
    rng = np.random.default_rng(7)
    for _ in range(3):
        spec = page_spec("korean_page", rng)
        img, truth = render_page(spec)
        blocks = analyse_page(img)
        assert [(b.kind, b.text) for b in blocks] == \
            [(t.kind, t.text) for t in truth]
        assert _page_script(blocks) == "hangul"


def test_hangul_win_is_ltr():
    # hangul is identification-only: no RTL flip, no pitch consequence
    from sparkstract.operators.page import _script_vote_rtl

    rng = np.random.default_rng(3)
    img, _ = render_page(page_spec("korean_page", rng))
    blocks = analyse_page(img)
    assert _page_script(blocks) == "hangul"
    assert not _script_vote_rtl(blocks)


@pytest.mark.parametrize("recognizer", ["model", "model-degraded"])
def test_korean_page_under_model_packs(recognizer):
    # the retrained packs decode the widened charset identically
    from sparkstract.config import ExtractConfig

    rng = np.random.default_rng(11)
    spec = page_spec("korean_page", rng)
    img, truth = render_page(spec)
    blocks = analyse_page(img, ExtractConfig(recognizer=recognizer))
    assert [(b.kind, b.text) for b in blocks] == \
        [(t.kind, t.text) for t in truth]

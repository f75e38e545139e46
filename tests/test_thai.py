"""Thai script family: the SPACE-LESS script — words run together and
boundaries exist only in the dictionary, so C13 word segmentation must be
driven by greedy longest-match over THAI_LEXICON (the reference's Thai
language pack segments through its word Dawgs the same way,
dict/dawg.h:385), with the 9-way script vote picking 'thai' (an
identification-only LTR win like greek/cyrillic/hangul)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstract.fixtures.font import GLYPHS, STRONG_THAI
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.lexicon import THAI_LEXICON, THAI_WORDS
from sparkstract.fixtures.render import render_page
from sparkstract.operators.page import (_page_script, _thai_segment,
                                        analyse_page)


def test_thai_glyphs_single_component():
    from sparkstract.functions.cclabel import label_blobs

    for ch in STRONG_THAI:
        assert len(label_blobs(GLYPHS[ch])) == 1, ch


def test_thai_glyph_hamming_floor():
    # every Thai bitmap stays >= 3 hamming from the ENTIRE LUT so the
    # template decode margin holds
    for ch in STRONG_THAI:
        for other, bits in GLYPHS.items():
            if other != ch:
                assert int((GLYPHS[ch] ^ bits).sum()) >= 3, (ch, other)


def test_greedy_segmentation_recovers_fixture_phrases():
    """Every phrase the fixture renders must segment back to its intended
    word sequence — the property the curated lexicon guarantees."""
    phrases = {
        "กามา": ["กา", "มา"], "ขานา": ["ขา", "นา"],
        "จานนก": ["จาน", "นก"], "คนงาน": ["คน", "งาน"],
        "มดตา": ["มด", "ตา"], "นากา": ["นา", "กา"],
        "ตาขา": ["ตา", "ขา"], "นกมด": ["นก", "มด"],
        "งานคน": ["งาน", "คน"],
    }
    for run, words in phrases.items():
        cuts = _thai_segment(run)
        assert cuts is not None, run
        assert [run[a:z] for a, z in cuts] == words


def test_segmentation_is_total_or_none():
    # an unsegmentable run returns None (the kernel keeps it whole) —
    # never a partial cover
    assert _thai_segment("กาก") is None          # trailing 'ก' alone
    assert _thai_segment("".join(THAI_WORDS)) is not None


def test_thai_page_decodes_segmented_and_votes_thai():
    rng = np.random.default_rng(7)
    for _ in range(3):
        spec = page_spec("thai_page", rng)
        img, truth = render_page(spec)
        blocks = analyse_page(img)
        assert [(b.kind, b.text) for b in blocks] == \
            [(t.kind, t.text) for t in truth]
        assert _page_script(blocks) == "thai"
        # the rendered lines are space-less; the decoded text carries
        # the dictionary-recovered boundaries
        assert " " in blocks[0].text


def test_thai_win_is_ltr():
    from sparkstract.operators.page import _script_vote_rtl

    rng = np.random.default_rng(3)
    img, _ = render_page(page_spec("thai_page", rng))
    blocks = analyse_page(img)
    assert _page_script(blocks) == "thai"
    assert not _script_vote_rtl(blocks)


def test_thai_word_sidecar_boxes_nest_in_line():
    """Dictionary-segmented words carry their own geometry from the
    decode cells: boxes are disjoint along x, ordered, and inside the
    block."""
    rng = np.random.default_rng(5)
    img, _ = render_page(page_spec("thai_page", rng))
    blocks = analyse_page(img)
    b = blocks[0]
    words = b.words
    assert len(words) == 18                      # 6 words x 3 lines
    assert [w[3] for w in words[:6]] == \
        ["กา", "มา", "ขา", "นา", "จาน", "นก"]
    rows: dict[int, list] = {}
    for w in words:
        rows.setdefault(w[5], []).append(w)      # group by box top
    assert len(rows) == 3
    for row in rows.values():
        xs = sorted((w[4], w[6]) for w in row)
        for (l1, r1), (l2, r2) in zip(xs, xs[1:]):
            assert r1 < l2                       # disjoint, ordered


@pytest.mark.parametrize("recognizer", ["model", "model-degraded"])
def test_thai_page_under_model_packs(recognizer):
    from sparkstract.config import ExtractConfig

    rng = np.random.default_rng(11)
    spec = page_spec("thai_page", rng)
    img, truth = render_page(spec)
    blocks = analyse_page(img, ExtractConfig(recognizer=recognizer))
    assert [(b.kind, b.text) for b in blocks] == \
        [(t.kind, t.text) for t in truth]

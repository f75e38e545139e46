"""K4 beam top-k + dictionary re-decode (reference
/root/reference/src/lstm/recodebeam.cpp:87 RecodeBeamSearch::Decode —
top-k states per timestep, dictionary continuations scored through the
word Dawgs, dict/dawg.h). Greedy per-cell argmin must stand everywhere
except on imperfect non-dictionary words, where the beam may substitute a
dictionary word only within the cost margin."""

import numpy as np

from sparkstract.fixtures.font import (DECODE_CHARS, DECODE_MATRIX,
                                       smudge_glyph)
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.lexicon import LEXICON
from sparkstract.fixtures.render import PageSpec, Text, render_page
from sparkstract.operators.page import BEAM_CELL_MARGIN, analyse_page


def _nearest2(bits):
    dist = np.abs(DECODE_MATRIX - bits.astype(np.int8).ravel()).sum(axis=1)
    order = np.argsort(dist, kind="stable")
    return [(DECODE_CHARS[int(i)], int(dist[i])) for i in order[:2]]


def test_smudge_glyph_is_adversarial_to_greedy():
    """The corrupted bitmap decodes greedily as the WRONG (toward) char,
    with the true char trailing within the beam's per-cell margin — the
    exact low-certainty shape the dict-gated beam exists for."""
    for c, toward in [("O", "Q"), ("C", "G"), ("N", "M"), ("F", "P")]:
        (g1, d1), (g2, d2) = _nearest2(smudge_glyph(c, toward))
        assert g1 == toward and g2 == c, (c, toward, g1, g2)
        assert 0 < d2 - d1 <= BEAM_CELL_MARGIN


def test_smudged_page_recovers_dictionary_words():
    """End-to-end: greedy would read FQX / QUIGK / TOKEM; the beam +
    dictionary recovers the rendered truth."""
    rng = np.random.default_rng(5)
    img, truth = render_page(page_spec("smudged_page", rng))
    blocks = analyse_page(img)
    assert [b.text for b in blocks] == [t.text for t in truth]
    for w in ("FOX", "QUICK", "TOKEN"):
        assert w in blocks[0].text


def test_dict_never_forces_a_fit():
    """An imperfect NON-lexicon word with no nearby dictionary word keeps
    its greedy decode (a smudged digit string must not be rewritten into
    some alphabetic lexicon word): the dict margin is a gate, not a
    magnet — garbage stays garbage, exactly like the reference's
    dict_ratio-bounded beam."""
    spec = PageSpec(elements=[Text(["123 456 789"], smudges={(0, 0): "2"})],
                    scale=2, width_chars=11)
    img, _ = render_page(spec)
    blocks = analyse_page(img)
    first = blocks[0].text.split()[0]
    assert first == "223"  # greedy (wrong vs render intent) survives
    assert first not in LEXICON


def test_perfect_non_lexicon_words_untouched():
    """A cleanly decoded word is never second-guessed, lexicon or not —
    the beam only opens on imperfect words (greedy cost > 0)."""
    spec = PageSpec(elements=[Text(["XQJ ZWK VYB"], col=0)], scale=2,
                    width_chars=11)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    assert [b.text for b in blocks] == [t.text for t in truth]

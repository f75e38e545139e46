"""C15 post-recognition fuzzy-space fix (fix_fuzzy_spaces,
/root/reference/src/ccmain/fixspace.cpp:79): the dictionary arbitrates
gaps near the word-break threshold — a too-wide in-word gap that split a
word is merged back, a too-narrow inter-word gap that fused two words is
re-decoded apart. Both directions plus the negative controls."""

from __future__ import annotations

import numpy as np

from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import PageSpec, Text, render_page
from sparkstract.operators.page import analyse_page


def _texts(img):
    return [b.text for b in analyse_page(img)
            if getattr(b, "kind", "") == "flowing_text"]


def test_fuzzy_space_family_matches_truth():
    rng = np.random.default_rng(7)
    img, truth = render_page(page_spec("fuzzy_space_page", rng))
    assert _texts(img) == [t.text for t in truth if t.kind == "flowing_text"]
    assert truth[0].text == "VECTOR\nFOX DOG\nCACHE BATCH"


def test_fuzzy_merge_direction():
    # advance 9s after 'C' -> 4s ink gap > the 3s break: segmentation reads
    # "VEC TOR"; the dictionary merge must rejoin it (VECTOR is a word,
    # VEC/TOR are not)
    img, _ = render_page(PageSpec(
        elements=[Text(["VECTOR"], adv_tweaks={(0, 2): 9})],
        scale=2, width_chars=13))
    assert _texts(img) == ["VECTOR"]


def test_fuzzy_split_direction():
    # advance 8s after 'X' (no space char) -> 3s ink gap <= the break:
    # the words fuse, DOG sits 2s off the pitch grid and decodes dirty;
    # the re-decode-split must recover both dictionary words
    img, _ = render_page(PageSpec(
        elements=[Text(["FOXDOG"], adv_tweaks={(0, 2): 8})],
        scale=2, width_chars=13))
    assert _texts(img) == ["FOX DOG"]


def test_fuzzy_merge_negative_control():
    # same fuzzy gap, but the concatenation is NOT a dictionary word:
    # the split interpretation must stand ("CACHE BATCH" stays two words
    # even though each part IS a word — and GRIDFOX is not a word)
    img, _ = render_page(PageSpec(
        elements=[Text(["GRIDFOX"], adv_tweaks={(0, 3): 9},
                       truth_lines=["GRID FOX"])],
        scale=2, width_chars=13))
    assert _texts(img) == ["GRID FOX"]


def test_real_word_space_untouched():
    # a nominal 7s space is far outside the fuzzy band: no merge attempt
    # even though "CACHETOKEN" would not pass and "CACHE TOKEN" parts are
    # both words — plain rendering must round-trip unchanged
    img, _ = render_page(PageSpec(
        elements=[Text(["CACHE TOKEN"])], scale=2, width_chars=13))
    assert _texts(img) == ["CACHE TOKEN"]

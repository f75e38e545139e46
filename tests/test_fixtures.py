"""Renderer/truth self-consistency + page-kernel correctness per family
(no Spark — the pure analog of the reference's layout_test.cc)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkstract.fixtures.gen import PAGE_FAMILIES, build_fixtures, page_spec
from sparkstract.fixtures.render import render_page
from sparkstract.operators.page import analyse_page


def test_fixture_set_deterministic():
    a = build_fixtures(seed=42)
    b = build_fixtures(seed=42)
    pd.testing.assert_frame_equal(a.docs, b.docs)
    pd.testing.assert_frame_equal(a.media, b.media)
    pd.testing.assert_frame_equal(a.truth, b.truth)


@pytest.mark.parametrize("family", PAGE_FAMILIES)
def test_page_analysis_matches_truth(family):
    rng = np.random.default_rng(7)
    for _ in range(3):  # several random variants per family
        spec = page_spec(family, rng)
        img, truth = render_page(spec)
        blocks = analyse_page(img)
        got = [(b.kind, b.text) for b in blocks]
        want = [(t.kind, t.text) for t in truth]
        assert got == want, f"{family}: {got} != {want}"


def test_block_order_is_dense():
    rng = np.random.default_rng(3)
    spec = page_spec("interleaved_order", rng)
    img, _ = render_page(spec)
    blocks = analyse_page(img)
    assert [b.order for b in blocks] == list(range(len(blocks)))


def test_interleaved_kind_sequence():
    """The layout_test.cc:53-55 pin: heading, flowing, pullout-image,
    caption, flowing — in that order."""
    rng = np.random.default_rng(11)
    spec = page_spec("interleaved_order", rng)
    img, _ = render_page(spec)
    kinds = [b.kind for b in analyse_page(img)]
    assert kinds == ["heading_text", "flowing_text", "pullout_image",
                     "caption_text", "flowing_text"]


def test_truth_order_dense_per_doc():
    fs = build_fixtures(seed=42)
    for doc_id, grp in fs.truth.groupby("doc_id"):
        assert sorted(grp["order"]) == list(range(len(grp))), doc_id

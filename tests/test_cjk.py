"""CJK fixed-pitch support: multi-blob character merge + vertical lines.

Reference contract: CJK pitch is its own engine in the reference
(src/textord/cjkpitch.cpp — 1,152 LoC): characters have NO word spaces,
may be SEVERAL disconnected components (FPRow::MergeFragments
cjkpitch.cpp:862 reassembles them bounded by the estimated body size, not
by gap), and pitch is estimated from merged character cells
(FPRow::EstimatePitch cjkpitch.cpp:623). The script half of OSD scores CJK
like every other script (osdetect.cpp:286).
"""

import numpy as np

import sparkstract.operators.page as P
from sparkstract.fixtures.font import GLYPHS, STRONG_CJK
from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import render_page
from sparkstract.functions.cclabel import label_blobs
from sparkstract.operators.page import _merge_pitch_cells, analyse_page


def test_multi_blob_glyphs_are_really_multi_blob():
    """川 (three strokes) and 三 (three bars) must be disconnected — the
    whole point of the merge; solid han shapes stay one component."""
    assert len(label_blobs(GLYPHS["川"].astype(bool)).left) == 3
    assert len(label_blobs(GLYPHS["三"].astype(bool)).left) == 3
    for ch in "山口田中日月王木":
        assert len(label_blobs(GLYPHS[ch].astype(bool)).left) == 1, ch


def test_merge_pitch_cells_fuses_strokes_not_characters():
    s = 2
    # three strokes of one 川 at stroke pitch 2s, then a solid char at 6s
    gl = np.array([0, 2 * s, 4 * s, 6 * s])
    gr = np.array([s - 1, 3 * s - 1, 5 * s - 1, 11 * s - 1])
    gt = np.zeros(4, dtype=np.int64)
    gb = np.full(4, 7 * s - 1)
    ml, mt, mr, mb = _merge_pitch_cells(gl, gt, gr, gb, s)
    assert ml.tolist() == [0, 6 * s]
    assert mr.tolist() == [5 * s - 1, 11 * s - 1]
    # two FULL characters at nominal pitch never merge (span bound)
    gl2 = np.array([0, 6 * s])
    gr2 = np.array([5 * s - 1, 11 * s - 1])
    z = np.zeros(2, dtype=np.int64)
    ml2, _, mr2, _ = _merge_pitch_cells(gl2, z, gr2, z + 7 * s - 1, s)
    assert ml2.tolist() == [0, 6 * s] and mr2.tolist() == [5 * s - 1,
                                                          11 * s - 1]
    # a wide fuzzy gap (> s) between fragments does not merge either
    gl3 = np.array([0, 3 * s])
    gr3 = np.array([s - 1, 4 * s - 1])
    ml3, _, _, _ = _merge_pitch_cells(gl3, z, gr3, z + 7 * s - 1, s)
    assert ml3.shape[0] == 2


def _run(fam, merge=True, seed=0, trials=4):
    orig = P._merge_pitch_cells
    if not merge:
        P._merge_pitch_cells = lambda gl, gt, gr, gb, s: (gl, gt, gr, gb)
    try:
        rng = np.random.default_rng(seed)
        for _ in range(trials):
            spec = page_spec(fam, rng)
            img, truth = render_page(spec)
            blocks = analyse_page(img)
            got = [(b.kind, b.text) for b in blocks]
            want = [(t.kind, t.text) for t in truth]
            if got != want:
                return False, got, want
        return True, None, None
    finally:
        P._merge_pitch_cells = orig


def test_cjk_page_decodes_and_needs_the_merge():
    """The tracked all-川 line kills every raw pitch sample (all group
    deltas are intra-character stroke steps), so the decode only recovers
    the true 7s pitch from MERGED characters — without the merge the
    family must fail, proving the fixture exercises cjkpitch, not the
    nominal grid."""
    ok, got, want = _run("cjk_page", merge=True)
    assert ok, (got, want)
    assert not _run("cjk_page", merge=False)[0]


def test_cjk_vertical_page_decodes_and_needs_the_merge():
    """A vertical stack containing 川 presents one row of three groups to
    the block-shape vertical rule; only the merged single-cell row lets the
    stack read as vertical_text top-to-bottom."""
    ok, got, want = _run("cjk_vertical_page", merge=True)
    assert ok, (got, want)
    assert not _run("cjk_vertical_page", merge=False)[0]


def test_script_vote_is_six_way():
    """A CJK page must tally and win 'cjk' (LTR — no RTL flip), not fall
    into latin or any other script."""
    rng = np.random.default_rng(1)
    img, _ = render_page(page_spec("cjk_page", rng))
    blocks = analyse_page(img)
    assert P._page_script(blocks) == "cjk"
    text = "".join(b.text or "" for b in blocks)
    assert sum(1 for c in text if c in STRONG_CJK) >= 14


def test_latin_rows_untouched_by_pitch_merge():
    """Gap <= s between two full Latin characters must NOT merge them
    (span bound): pin by running a plain page with and without the merge
    and requiring identical decode."""
    rng1, rng2 = np.random.default_rng(5), np.random.default_rng(5)
    img, _ = render_page(page_spec("single_column", rng1))
    img2, _ = render_page(page_spec("single_column", rng2))
    assert (img == img2).all()
    a = [(b.kind, b.text) for b in analyse_page(img)]
    orig = P._merge_pitch_cells
    P._merge_pitch_cells = lambda gl, gt, gr, gb, s: (gl, gt, gr, gb)
    try:
        b_ = [(b.kind, b.text) for b in analyse_page(img2)]
    finally:
        P._merge_pitch_cells = orig
    assert a == b_

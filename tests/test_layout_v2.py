"""v2 layout features: rule lines (F5), tables (C8), deskew (C6)."""

import numpy as np
import pytest

from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import render_page
from sparkstract.functions.geometry import estimate_skew, rotate_nn, shear_y
from sparkstract.operators.page import analyse_page


def _run_family(family, seed, trials=6):
    rng = np.random.default_rng(seed)
    for _ in range(trials):
        spec = page_spec(family, rng)
        img, truth = render_page(spec)
        got = analyse_page(img)
        assert len(got) == len(truth), (
            family, [t.kind for t in truth], [(g.kind, g.text) for g in got])
        for t, g in zip(truth, got):
            assert g.kind == t.kind, (family, t.kind, g.kind, g.text)
            assert (g.text or None) == (t.text or None), (family, t.text, g.text)


def test_ruled_page_family():
    _run_family("ruled_page", seed=101)


def test_table_page_family():
    _run_family("table_page", seed=102)


def test_skewed_page_family():
    _run_family("skewed_page", seed=103, trials=12)


def test_estimate_skew_recovers_known_slope():
    theta = 1.3
    xs = np.tile(np.arange(20) * 18.0, 5)
    ys = np.repeat(np.arange(5) * 36.0, 20) - xs * np.tan(np.deg2rad(theta))
    est = estimate_skew(xs, ys, bin_px=4.0)
    # the deprojection angle that flattens the rows is -theta
    assert abs(est - (-theta)) < 0.15, est


def test_estimate_skew_straight_page_is_zero():
    xs = np.tile(np.arange(20) * 18.0, 5)
    ys = np.repeat(np.arange(5) * 36.0, 20)
    assert abs(estimate_skew(xs, ys, bin_px=4.0)) < 0.1


def test_shear_preserves_ink_count():
    img = np.zeros((50, 200), dtype=bool)
    img[10:20, 30:180] = True
    out = shear_y(img, np.tan(np.deg2rad(1.5)), False)
    assert out.sum() == img.sum()


def test_rotate_round_trip_keeps_shape_content():
    img = np.zeros((60, 90), dtype=np.uint8)
    img[20:40, 30:60] = 255
    out = rotate_nn(rotate_nn(img, 2.0, np.uint8(0)), -2.0, np.uint8(0))
    # the block survives with its approximate mass (NN jitter tolerated)
    assert abs(int((out > 0).sum()) - 600) < 60


@pytest.mark.parametrize("deg", [0.0, 1e-10])
def test_rotate_identity(deg):
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert rotate_nn(img, deg, np.uint8(0)) is img


def test_rotated_page_family():
    # C10 OSD: pages at 90/180/270 come back upright (osd_test.cc:78-92)
    _run_family("rotated_page", seed=104, trials=9)


def test_textured_photo_family():
    # F7 non-text density mask: halftone region → image span, not garbage text
    _run_family("textured_photo", seed=105)


def test_gradient_page_family():
    # F10/F1: uneven illumination flattened by background normalization
    _run_family("gradient_page", seed=106)


def test_contents_page_family():
    # C2 leader detection: dot leaders dropped from text, gap not a gutter
    _run_family("contents_page", seed=107, trials=10)


def test_equation_page_family():
    # C9 equation detection: centered math-dense block → kind 'equation'
    _run_family("equation_page", seed=106)


def test_vertical_page_family():
    # vertical text (strokewidth.cpp:211): stacked glyphs read top-to-bottom
    _run_family("vertical_page", seed=107)


def test_is_equation_rule():
    from sparkstract.operators.page import _is_equation
    assert _is_equation("X = Y + 2")
    assert _is_equation("2+2=4")
    assert not _is_equation("SPARK QUERY")     # no '='
    assert not _is_equation("WORD = WORDY")    # '=' but not math-dense
    assert not _is_equation("")


def test_disc_page_family():
    # C1 stroke-width grading: solid disc (fill < rectangle threshold) → image
    _run_family("disc_page", seed=108)


def test_tracked_page_family():
    # A7/C14 fixed-pitch estimate: wide letter-spacing decoded via the
    # measured pitch, not the nominal 6s grid
    _run_family("tracked_page", seed=109, trials=8)


def test_bowed_page_family():
    # A4 quadratic baseline fit: bowed rows straightened by integer column
    # shifts from the joint skew+bow least-squares estimate
    _run_family("bowed_page", seed=110, trials=8)


def test_margin_note_family():
    _run_family("margin_note", seed=105, trials=8)


def test_ragged_page_family():
    # J4 tab partner join: the gutter is bridged by one intruding long line,
    # so only the aligned-left-edge tab vector can recover the two columns
    _run_family("ragged_page", seed=104, trials=8)


def test_ragged_page_requires_tab_vectors(monkeypatch):
    # control: with tab gutters suppressed, coverage-only segmentation must
    # FAIL on this family — guards the fixture against becoming trivially
    # solvable (and the tab path against going dead)
    import sparkstract.operators.page as P

    rng = np.random.default_rng(104)
    spec = page_spec("ragged_page", rng)
    img, truth = render_page(spec)
    monkeypatch.setattr(P, "_tab_partner_gutters", lambda rows, s: [])
    got = P.analyse_page(img)
    assert [(g.kind, g.text) for g in got] != \
        [(t.kind, t.text) for t in truth]


def test_tab_vector_not_spurious_on_single_column():
    # a plain single-column page must never grow a tab-vector gutter: word
    # gaps are 7*s < TAB_CLEAR_UNITS*s and the left margin has no partner
    _run_family("single_column", seed=105, trials=6)
    _run_family("tracked_page", seed=106, trials=8)


def test_embedded_vertical_family():
    # J2 good-neighbour flow: vertical word beside flowing lines, no gutter
    _run_family("embedded_vertical", seed=107, trials=8)


def test_embedded_vertical_requires_flow(monkeypatch):
    # control: without the flow pass, the stack glyphs pollute the rows —
    # the block-shape vertical rule alone cannot solve this family
    import sparkstract.operators.page as P

    rng = np.random.default_rng(107)
    spec = page_spec("embedded_vertical", rng)
    img, truth = render_page(spec)
    monkeypatch.setattr(P, "_flow_vertical_chains", lambda *a, **k: [])
    got = P.analyse_page(img)
    assert [(g.kind, g.text) for g in got] != \
        [(t.kind, t.text) for t in truth]


def test_sparse_texture_family():
    # C4 textline projection: dot pitch 10px defeats the fixed dense grid;
    # the adaptive projection pass must recover the photo region
    _run_family("sparse_texture", seed=108, trials=8)

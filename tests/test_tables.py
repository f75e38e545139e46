"""Structured tables (C8 v3): merged-cell recognition + the cell sidecar.

Reference contract: tablefind.cpp:200 DETECTS tables from aligned
whitespace; tablerecog.cpp:62 (StructuredTable) then recognizes the cell
GRID — column segments, and cells that span several columns (merged
headers). A spanning header has fewer aligned gaps than the grid expects,
so detection alone would exile it to flowing text.
"""

import numpy as np

from sparkstract.fixtures.gen import page_spec
from sparkstract.fixtures.render import PageSpec, TableGrid, Text, render_page
from sparkstract.operators.page import analyse_page


def _table_block(blocks):
    tbs = [b for b in blocks if b.kind == "table"]
    assert len(tbs) == 1, [b.kind for b in blocks]
    return tbs[0]


def test_spanned_table_family_matches_truth():
    rng = np.random.default_rng(0)
    for _ in range(4):
        spec = page_spec("spanned_table_page", rng)
        img, truth = render_page(spec)
        got = [(b.kind, b.text) for b in analyse_page(img)]
        want = [(t.kind, t.text) for t in truth]
        assert got == want


def test_merged_header_cell_spans_two_columns():
    rng = np.random.default_rng(3)
    spec = page_spec("spanned_table_page", rng)
    img, _ = render_page(spec)
    tb = _table_block(analyse_page(img))
    # header row: REPORT once with span 2 starting at col 0, X9 at col 2
    hdr = [c for c in tb.cells if c[0] == 0]
    assert hdr == [(0, 0, 0, 2, "REPORT"), (0, 1, 2, 1, "X9")]
    # body rows: three span-1 cells each at cols 0/1/2
    for ri in (1, 2, 3):
        row = [c for c in tb.cells if c[0] == ri]
        assert [(c[2], c[3]) for c in row] == [(0, 1), (1, 1), (2, 1)]
        assert all(c[4] for c in row)


def test_plain_table_unaffected_and_all_spans_one():
    """The v2 family (no merged cells) keeps its exact decode and reports
    a uniform span-1 grid."""
    rng = np.random.default_rng(1)
    spec = page_spec("table_page", rng)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    got = [(b.kind, b.text) for b in blocks]
    assert got == [(t.kind, t.text) for t in truth]
    tb = _table_block(blocks)
    assert all(c[3] == 1 for c in tb.cells)
    assert [c[2] for c in tb.cells] == [c[1] for c in tb.cells]


def test_footer_spanning_row_absorbs_below_the_body():
    """Absorption is symmetric: a merged row UNDER the body (a totals
    footer) joins the table too."""
    cells = [["AAA", "BBB", "CCC"], ["DDD", "EEE", "FFF"],
             ["TOTALS", "Z9"]]
    layout = [[(0, 1), (1, 1), (2, 1)]] * 2 + [[(0, 2), (2, 1)]]
    spec = PageSpec(elements=[
        Text(["THE QUICK BROWN FOX JUMPS"], col=0),
        TableGrid(cells=cells, col_chars=[6, 6, 6], layout=layout, col=0),
        Text(["OVER THE LAZY DOG AGAIN"], col=0),
    ], scale=2, width_chars=27)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    got = [(b.kind, b.text) for b in blocks]
    assert got == [(t.kind, t.text) for t in truth]
    tb = _table_block(blocks)
    foot = [c for c in tb.cells if c[0] == 2]
    assert foot == [(2, 0, 0, 2, "TOTALS"), (2, 1, 2, 1, "Z9")]


def test_distant_gappy_text_is_not_absorbed():
    """A line with a table-wide gap but at BLOCK distance (30s) from the
    table must stay flowing text — absorption requires line-pitch
    adjacency."""
    from sparkstract.fixtures.render import LeaderLine

    cells = [["AAA", "BBB", "CCC"], ["DDD", "EEE", "FFF"]]
    spec = PageSpec(elements=[
        LeaderLine("INTRO", "77", col=0),
        TableGrid(cells=cells, col_chars=[6, 6, 6], col=0),
    ], scale=2, width_chars=27)
    img, truth = render_page(spec)
    blocks = analyse_page(img)
    got = [(b.kind, b.text) for b in blocks]
    assert got == [(t.kind, t.text) for t in truth]
    tb = _table_block(blocks)
    assert {c[0] for c in tb.cells} == {0, 1}  # two body rows only

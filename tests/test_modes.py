"""Config-driven modes mirroring the reference's SetVariable-style knobs:

* RTL column order  — layout_test.cc:215-236 (Hebrew), colfind.cpp:347-354
* PageSegMode gates — pagesegmode_test.cc:89, publictypes.h:163-183
* char whitelist    — SetBlackAndWhitelist, baseapi.cpp:1338
* broken-char repair (C3) — FixBrokenCJK, strokewidth.cpp:588
"""

from __future__ import annotations

import numpy as np

from sparkstract.config import ExtractConfig
from sparkstract.fixtures.font import ALPHABET
from sparkstract.fixtures.gen import DOCS_SCHEMA, MEDIA_SCHEMA, page_spec
from sparkstract.fixtures.render import PageSpec, Text, render_page
from sparkstract.functions.png import encode_gray
from sparkstract.operators.page import analyse_page
from sparkstract.plans.pipeline import extract


def _rtl_spec() -> PageSpec:
    # elements listed in READING order: rightmost column (col=1) first
    return PageSpec(
        elements=[Text(["RIGHT COL ONE", "RIGHT COL TWO"], col=1),
                  Text(["LEFT COL ONE", "LEFT COL TWO"], col=0)],
        n_cols=2, scale=2, width_chars=15, rtl=True)


def test_rtl_reading_order_kernel():
    img, truth = render_page(_rtl_spec())
    got = analyse_page(img, rtl=True)
    assert [b.text for b in got] == [t.text for t in truth]
    assert got[0].text.startswith("RIGHT")
    # the same page read LTR starts with the left column
    assert analyse_page(img)[0].text.startswith("LEFT")


def test_rtl_cfg_plumbs_through_pipeline(spark):
    img, truth = render_page(_rtl_spec())
    docs = spark.createDataFrame(
        [("d-rtl", [dict(kind="media", text=None, media_ref="m-rtl", offset=0)])],
        DOCS_SCHEMA)
    media = spark.createDataFrame(
        [("m-rtl", img.shape[1], img.shape[0], encode_gray(img))], MEDIA_SCHEMA)
    res = extract(spark, docs, media, ExtractConfig(rtl=True)) \
        .orderBy("order").collect()
    assert [r.text for r in res] == [t.text for t in truth]


def test_psm_single_block_merges_blocks():
    # two separate blocks (30s apart) — auto yields 2, single_block exactly 1
    spec = PageSpec(elements=[Text(["AAA BBB"], col=0), Text(["CCC DDD"], col=0)],
                    scale=2)
    img, _ = render_page(spec)
    assert len(analyse_page(img)) == 2
    got = analyse_page(img, psm="single_block")
    assert len(got) == 1
    assert got[0].kind == "flowing_text"
    assert got[0].text == "AAA BBB\nCCC DDD"


def test_psm_single_line_ignores_column_gutter():
    # one physical line split by a column gutter — auto reads 2 blocks,
    # single_line forces one row (gutter collapses to a word space)
    spec = PageSpec(elements=[Text(["AA"], col=0), Text(["BB"], col=1)],
                    n_cols=2, scale=2, width_chars=6)
    img, _ = render_page(spec)
    assert len(analyse_page(img)) == 2
    got = analyse_page(img, psm="single_line")
    assert len(got) == 1
    assert got[0].text == "AA BB"


def test_psm_single_column_merges_gutter_keeps_blocks():
    # two columns with rows at the same heights — single_column ignores the
    # gutter (rows span it, gap reads as a word space) but keeps y-structure
    spec = PageSpec(elements=[Text(["AA", "CC"], col=0), Text(["BB", "DD"], col=1)],
                    n_cols=2, scale=2, width_chars=6)
    img, _ = render_page(spec)
    assert len(analyse_page(img)) == 2  # auto: one block per column
    got = analyse_page(img, psm="single_column")
    assert len(got) == 1
    assert got[0].text == "AA BB\nCC DD"


def test_char_whitelist_restricts_decode():
    spec = PageSpec(elements=[Text(["DOG 0K"], col=0)], scale=2)
    img, _ = render_page(spec)
    assert analyse_page(img)[0].text == "DOG 0K"
    got = analyse_page(img, whitelist=ALPHABET.replace("0", ""))
    txt = got[0].text
    assert "0" not in txt
    assert txt[:4] == "DOG " and len(txt) == 6  # only the '0' was remapped


def test_broken_page_family():
    rng = np.random.default_rng(104)
    for _ in range(8):
        spec = page_spec("broken_page", rng)
        img, truth = render_page(spec)
        got = analyse_page(img)
        assert [(b.kind, b.text) for b in got] == \
            [(t.kind, t.text) for t in truth]


def test_broken_cut_actually_splits_components():
    """Sanity that the fixture exercises repair: the cut must increase the
    connected-component count vs the uncut page."""
    from sparkstract.functions.cclabel import label_blobs
    from sparkstract.functions.otsu import binarize

    uncut = PageSpec(elements=[Text(["HHHH"], col=0)], scale=3)
    img_ref, _ = render_page(uncut)
    # margin is 8*s=24px, glyph 'H' spans x 24..38 — cut at x=30 hits it
    cut = PageSpec(elements=[Text(["HHHH"], col=0)], scale=3,
                   cut_x_frac=30.0 / img_ref.shape[1])
    n_cut = len(label_blobs(binarize(render_page(cut)[0])))
    n_ref = len(label_blobs(binarize(img_ref)))
    assert n_cut > n_ref
    # and the repaired decode is still exact
    assert analyse_page(render_page(cut)[0])[0].text == "HHHH"


def test_zone_override_source(spark):
    """S10 zone-file source (read_unlv_file, pagesegmain.cpp:114-127): a
    zones table overrides segmentation per media_ref — here it splits one
    auto-detected block into two forced zones; pages without zones rows
    keep full analysis."""
    from sparkstract.fixtures.gen import DOCS_SCHEMA, MEDIA_SCHEMA
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.functions.png import encode_gray
    from sparkstract.plans.pipeline import ZONES_SCHEMA, extract

    lines = ["SPARK QUERY SCAN", "MERGE BATCH GRID",
             "PAGE LINE WORD", "TOKEN GLYPH ROW"]
    img, _ = render_page(PageSpec(elements=[Text(lines)], scale=2,
                                  width_chars=17))
    h, w = img.shape
    # layout contract (render.py): margin 8s, line pitch 12s → rows top at
    # 16/40/64/88 at scale 2; split between rows 2 and 3
    split = 58
    docs = spark.createDataFrame(
        [("d-z", [dict(kind="media", text=None, media_ref="m-z", offset=0)])],
        DOCS_SCHEMA)
    media = spark.createDataFrame([("m-z", w, h, encode_gray(img))],
                                  MEDIA_SCHEMA)
    zones = spark.createDataFrame(
        [("m-z", [dict(left=0, top=0, right=w - 1, bottom=split - 1,
                       kind="flowing_text"),
                  dict(left=0, top=split, right=w - 1, bottom=h - 1,
                       kind="flowing_text")])], ZONES_SCHEMA)

    # without zones: one auto-detected block
    auto = extract(spark, docs, media).collect()
    assert [r["text"] for r in sorted(auto, key=lambda r: r["order"])] == \
        ["\n".join(lines)]
    # with zones: forced two-block segmentation, kinds from the zone table
    got = sorted(extract(spark, docs, media, zones=zones).collect(),
                 key=lambda r: r["order"])
    assert [(r["kind"], r["text"]) for r in got] == [
        ("flowing_text", "\n".join(lines[:2])),
        ("flowing_text", "\n".join(lines[2:]))]


def test_decode_error_policy(spark):
    """A corrupt media blob must not kill the job: default policy emits one
    auditable decode_error span and the rest of the corpus extracts
    normally (ProcessPagesInternal skips failed pages, baseapi.cpp:1731);
    decode_errors='fail' raises instead."""
    import pytest

    from sparkstract.config import ExtractConfig
    from sparkstract.fixtures.gen import DOCS_SCHEMA, MEDIA_SCHEMA
    from sparkstract.fixtures.render import PageSpec, Text, render_page
    from sparkstract.functions.png import encode_gray
    from sparkstract.plans.pipeline import extract

    img, _ = render_page(PageSpec(elements=[Text(["FOX DOG"])], scale=2))
    docs = spark.createDataFrame(
        [("good", [dict(kind="media", text=None, media_ref="m-ok", offset=0)]),
         ("bad", [dict(kind="text", text="BEFORE", media_ref=None, offset=0),
                  dict(kind="media", text=None, media_ref="m-bad", offset=1)])],
        DOCS_SCHEMA)
    media = spark.createDataFrame(
        [("m-ok", img.shape[1], img.shape[0], encode_gray(img)),
         ("m-bad", 10, 10, b"\x89PNG\r\n\x1a\n garbage after the signature")],
        MEDIA_SCHEMA)
    rows = extract(spark, docs, media).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["kind"] for r in sorted(by_doc["bad"], key=lambda r: r["order"])] \
        == ["text", "decode_error"]
    assert [r["kind"] for r in by_doc["good"]] == ["flowing_text"]
    err = next(r for r in by_doc["bad"] if r["kind"] == "decode_error")
    assert err["text"]  # carries the exception message

    with pytest.raises(Exception, match="PythonException|ValueError"):
        extract(spark, docs, media,
                ExtractConfig(decode_errors="fail")).collect()

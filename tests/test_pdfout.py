"""Searchable-PDF OUTPUT (S8, TessPDFRenderer — reference
/root/reference/src/api/pdfrenderer.cpp, include/tesseract/renderer.h:244).

The renderer's contract: per page, the scan image as an XObject backdrop
plus an INVISIBLE (3 Tr) text layer whose Tz-stretched words cover their
image boxes (pdfrenderer.cpp:355,375,487). These tests pin the strongest
property the sandbox can verify — a full ROUND TRIP through our own PDF
parser: render a page's searchable PDF, re-ingest it, and the extracted
words must match the original decode (text exactly, boxes within the 1px
inclusive-edge vs advance-model difference). Plus byte-determinism of the
assembly and distributed == single-process equality per document.
"""

from __future__ import annotations

import zlib

import pytest

from sparkstract.fixtures.render import PageSpec, Text, render_page
from sparkstract.functions.pdf import blocks_from_pdf_page, parse_pdf
from sparkstract.functions.pdfout import (assemble_pdf, compress_page_image,
                                          page_text_ops)
from sparkstract.operators.page import analyse_page


def _words_of(blocks):
    out = []
    for blk in blocks:
        if blk.words:
            for (_p, _ln, _wn, wt, wl, wtop, wr, wb, _c, _s,
                 _lm) in blk.words:
                out.append((wt, wl, wtop, wr, wb))
    return out


def _page_parts(gray):
    blocks = analyse_page(gray)
    words = _words_of(blocks)
    return {"w": gray.shape[1], "h": gray.shape[0],
            "img": compress_page_image(gray),
            "ops": page_text_ops(words, gray.shape[0])}, words


def test_empty_word_list_renders_no_ops():
    assert page_text_ops([], 100) == ""


def test_roundtrip_raster_page():
    img, _ = render_page(PageSpec(elements=[Text(["TOKEN GRID", "LAZY FOX"])],
                                  scale=2))
    part, words = _page_parts(img)
    assert words, "fixture page must decode words"
    data = assemble_pdf([part])
    assert data.startswith(b"%PDF-") and data.rstrip().endswith(b"%%EOF")

    (pg,) = parse_pdf(data)
    # text layer wins over the full-page backdrop (searchable-PDF ingest
    # rule): the page parses as born-digital, no second OCR pass
    assert pg.has_text
    rt = _words_of(blocks_from_pdf_page(pg))
    assert [w[0] for w in rt] == [w[0] for w in words]
    for (t, l, tp, r, b), (t2, l2, tp2, r2, b2) in zip(words, rt):
        # inclusive pixel boxes vs advance-model boxes: ≤1px drift
        assert abs(l2 - l) <= 1 and abs(tp2 - tp) <= 1
        assert abs(r2 - r) <= 1 and abs(b2 - b) <= 1


def test_backdrop_image_is_lossless():
    img, _ = render_page(PageSpec(elements=[Text(["FOX"])], scale=2))
    part, _ = _page_parts(img)
    assert zlib.decompress(part["img"]) == img.tobytes()


def test_assembly_is_byte_deterministic():
    img, _ = render_page(PageSpec(elements=[Text(["FOX DOG"])], scale=2))
    part, _ = _page_parts(img)
    assert assemble_pdf([part, part]) == assemble_pdf([part, part])


def test_text_only_page_assembles_without_image():
    # born-digital pass-through: a page part with img=None still yields a
    # valid, parseable single-page PDF whose words round-trip
    ops = page_text_ops([("HELLO", 10, 10, 59, 21),
                         ("WORLD", 70, 10, 119, 21)], 200)
    data = assemble_pdf([{"w": 300, "h": 200, "img": None, "ops": ops}])
    (pg,) = parse_pdf(data)
    assert pg.has_text
    rt = _words_of(blocks_from_pdf_page(pg))
    assert [w[0] for w in rt] == ["HELLO", "WORLD"]


@pytest.fixture(scope="module")
def pdf_frames(spark, fixture_set):
    from sparkstract.plans.pipeline import extract_pdf_pages
    from sparkstract.sinks import render_pdf

    docs, media, _ = fixture_set.to_spark(spark)
    pages = extract_pdf_pages(spark, docs, media).persist()
    pdfs = {r["doc_id"]: (bytes(r["pdf"]), r["n_pages"])
            for r in render_pdf(pages).collect()}
    parts = [r.asDict() for r in pages.collect()]
    pages.unpersist()
    return pdfs, parts


def test_distributed_matches_single_process(pdf_frames):
    pdfs, parts = pdf_frames
    by_doc: dict[str, list] = {}
    for p in parts:
        by_doc.setdefault(p["doc_id"], []).append(p)
    assert set(pdfs) == set(by_doc)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: (r["offset"], r["page_seq"]))
        local = assemble_pdf([
            {"w": r["w"], "h": r["h"],
             "img": bytes(r["img"]) if r["img"] is not None else None,
             "ops": r["ops"]} for r in rows])
        assert pdfs[doc_id][0] == local, doc_id
        assert pdfs[doc_id][1] == len(rows)


def test_every_media_doc_gets_a_pdf_and_it_reparses(pdf_frames, fixture_set):
    pdfs, _ = pdf_frames
    media_docs = {
        d.doc_id for d in fixture_set.docs.itertuples()
        if any(s["kind"] == "media" for s in d.spans)}
    assert set(pdfs) == media_docs
    for doc_id, (data, n_pages) in pdfs.items():
        assert len(parse_pdf(data)) == n_pages, doc_id

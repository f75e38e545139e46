"""Renderer sinks over a small spans frame."""

from sparkstract.sinks import (
    render_alto,
    render_hocr,
    render_page_xml,
    render_text,
    render_tsv,
)

ROWS = [
    ("d1", 0, "heading_text", "TITLE", None),
    ("d1", 1, "flowing_image", None, "m-1"),
    ("d1", 2, "flowing_text", "BODY A", None),
    ("d1", 3, "caption_text", "CAP", None),
    ("d2", 0, "text", "LONE & <b>", None),
]
SCHEMA = "doc_id string, order int, kind string, text string, media_ref string"


def _spans(spark):
    # deliberately shuffled input order: renderers must sort by span order
    return spark.createDataFrame([ROWS[2], ROWS[0], ROWS[4], ROWS[3], ROWS[1]], SCHEMA)


def test_render_text_skips_images_and_orders(spark):
    out = {r["doc_id"]: r["text"] for r in render_text(_spans(spark)).collect()}
    assert out["d1"] == "TITLE\n\nBODY A\n\nCAP"
    assert out["d2"] == "LONE & <b>"


def test_render_tsv(spark):
    out = {r["doc_id"]: r["tsv"] for r in render_tsv(_spans(spark)).collect()}
    lines = out["d1"].split("\n")
    assert lines[0] == "0\theading_text\t\tTITLE"
    assert lines[1] == "1\tflowing_image\tm-1\t"
    assert len(lines) == 4


def test_render_alto(spark):
    out = {r["doc_id"]: r["alto"] for r in render_alto(_spans(spark)).collect()}
    d1 = out["d1"]
    assert d1.startswith("<alto ")
    assert "<Illustration ID='block_1' TAGREFS='flowing_image' FILEID='m-1'/>" in d1
    assert "<String CONTENT='TITLE'/>" in d1
    # reading order: heading, image, body, caption
    assert d1.index("TITLE") < d1.index("m-1") < d1.index("BODY A") < d1.index("CAP")
    assert "LONE &amp; &lt;b&gt;" in out["d2"]


def test_render_page_xml(spark):
    out = {r["doc_id"]: r["page_xml"]
           for r in render_page_xml(_spans(spark)).collect()}
    d1 = out["d1"]
    assert d1.startswith("<PcGts ")
    # a typed region per span + an index entry per span, indices in order
    for i in range(4):
        assert f"<RegionRefIndexed index='{i}' regionRef='r{i}'/>" in d1
    assert "<ImageRegion id='r1' custom='flowing_image' imageFilename='m-1'/>" in d1
    assert "<TextRegion id='r0' custom='heading_text'>" in d1
    assert "<Unicode>CAP</Unicode>" in d1
    assert "LONE &amp; &lt;b&gt;" in out["d2"]


def test_render_page_xml_multiline_text(spark):
    rows = [("d3", 0, "flowing_text", "AB\nCD", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    xml = render_page_xml(df).collect()[0]["page_xml"]
    assert "<Unicode>AB&#10;CD</Unicode>" in xml
    alto = render_alto(df).collect()[0]["alto"]
    assert "CONTENT='AB CD'" in alto


def test_render_hocr_escapes(spark):
    out = {r["doc_id"]: r["hocr"] for r in render_hocr(_spans(spark)).collect()}
    assert out["d2"].count("LONE &amp; &lt;b&gt;") == 1
    assert out["d1"].startswith("<html><body>")
    assert "<img src='m-1'/>" in out["d1"]
    # reading order preserved
    assert out["d1"].index("TITLE") < out["d1"].index("m-1") < out["d1"].index("BODY A")


def test_box_aware_renderers(spark, fixture_set):
    """Fed extract_blocks output (geometry present), hOCR titles carry real
    bbox properties and ALTO elements carry HPOS/VPOS/WIDTH/HEIGHT — like
    the reference renderers (hocrrenderer.cpp:123, altorenderer.cpp)."""
    import re

    from pyspark.sql import functions as F

    from sparkstract.plans.pipeline import extract_blocks
    from sparkstract.sinks import render_alto, render_hocr

    docs, media, _ = fixture_set.to_spark(spark)
    docs = docs.filter(F.col("doc_id") == "d-interleaved_order")
    blocks = extract_blocks(spark, docs, media) \
        .withColumn("order", F.col("block_order"))
    hocr = render_hocr(blocks).collect()[0]["hocr"]
    boxes = re.findall(r"bbox (\d+) (\d+) (\d+) (\d+)", hocr)
    assert boxes, hocr
    assert all(int(r) >= int(l) and int(b) >= int(t) for l, t, r, b in boxes)
    alto = render_alto(blocks).collect()[0]["alto"]
    assert re.search(r"HPOS='\d+' VPOS='\d+' WIDTH='\d+' HEIGHT='\d+'", alto)


def test_hierarchy_renderers(spark, fixture_set):
    """Full-depth TSV (levels 1-5) and nested hOCR over the para_page doc:
    the wired paragraph detector must show up as par rows / ocr_par divs."""
    from pyspark.sql import functions as F

    from sparkstract.plans.pipeline import extract_blocks, extract_words
    from sparkstract.sinks import render_hocr_words, render_tsv_levels

    docs, media, _ = fixture_set.to_spark(spark)
    docs = docs.filter(F.col("doc_id") == "d-para_page")
    blocks = extract_blocks(spark, docs, media)
    words = extract_words(spark, docs, media)

    tsv = render_tsv_levels(blocks, words).collect()[0]["tsv"]
    lines = tsv.split("\n")
    levels = [ln.split("\t")[0] for ln in lines]
    assert levels[0] == "1"  # page row first
    # two paragraphs in the para_page block → two level-3 rows for block 1
    par_rows = [ln for ln in lines
                if ln.split("\t")[0] == "3" and ln.split("\t")[2] == "1"]
    assert len(par_rows) == 2
    # word rows are 12 columns with text last and conf 100
    wrow = next(ln for ln in lines if ln.split("\t")[0] == "5")
    cells = wrow.split("\t")
    assert len(cells) == 12 and cells[10] == "100" and cells[11]
    # nesting order: each level-4 line row is followed by its level-5 words
    i4 = levels.index("4")
    assert levels[i4 + 1] == "5"

    hocr = render_hocr_words(blocks, words).collect()[0]["hocr"]
    assert hocr.count("class='ocr_par'") == 2
    assert "class='ocr_line'" in hocr and "x_wconf 100" in hocr
    assert hocr.index("ocr_page") < hocr.index("ocr_carea") \
        < hocr.index("ocr_par") < hocr.index("ocr_line") \
        < hocr.index("ocrx_word")


def test_render_page_xml_words(spark, fixture_set):
    """Word-level PAGE XML: Page → ReadingOrder + TextRegion → TextLine →
    Word with Coords polygons; line TextEquiv joins its words."""
    import re

    from pyspark.sql import functions as F

    from sparkstract.plans.pipeline import extract_blocks, extract_words
    from sparkstract.sinks import render_page_xml_words

    docs, media, _ = fixture_set.to_spark(spark)
    docs = docs.filter(F.col("doc_id") == "d-para_page")
    blocks = extract_blocks(spark, docs, media)
    words = extract_words(spark, docs, media)

    xml = render_page_xml_words(blocks, words).collect()[0]["page_xml"]
    assert xml.startswith("<PcGts") and xml.endswith("</PcGts>")
    # reading order lists every region exactly once, before the regions
    refs = re.findall(r"regionRef='(r[\d_]+)'", xml)
    rids = re.findall(r"<\w+Region id='(r[\d_]+)'", xml)
    assert refs == rids
    assert xml.index("<ReadingOrder>") < xml.index("Region id=")
    # nesting: region → line → word, each with a 4-point Coords polygon
    assert xml.index("<TextRegion") < xml.index("<TextLine") \
        < xml.index("<Word")
    pts = re.findall(r"points='([\d, ]+)'", xml)
    assert pts and all(len(p.split(" ")) == 4 for p in pts)
    # a line's TextEquiv is the space-join of its word TextEquivs
    m = re.search(
        r"<TextLine.*?</TextLine>", xml, re.S)
    wtexts = re.findall(r"<Word.*?<Unicode>(.*?)</Unicode>", m.group(0),
                        re.S)
    lt = re.findall(r"</Word>\s*<TextEquiv><Unicode>(.*?)</Unicode>",
                    m.group(0), re.S)
    assert lt == [" ".join(wtexts)]

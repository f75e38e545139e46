"""Result renderers (sinks) over the extracted-spans DataFrame.

Mirrors the reference's renderer family (include/tesseract/renderer.h):
  render_text  — TessTextRenderer (renderer.h:160): the GetUTF8Text view of a
                 doc. Text spans joined in span order, separated by blank
                 lines; image/line spans are skipped for text output exactly
                 like PTIsTextType gating in GetUTF8Text
                 (/root/reference/src/api/baseapi.cpp:2097-2127).
  render_tsv   — TessTsvRenderer (renderer.h:221, baseapi.cpp:2205): one row
                 per span with level/ids — our flat block-level analog of the
                 page/block/para/line/word TSV.
  render_hocr  — TessHOcrRenderer (renderer.h:171): minimal hOCR HTML, one
                 <div class='ocr_carea'> per span.
  render_alto  — TessAltoRenderer (renderer.h:188, src/api/altorenderer.cpp:131):
                 minimal ALTO XML — a <TextBlock> per text span (one <String>
                 per span; CONTENT carries the text), <Illustration> per image
                 span, <GraphicalElement> per rule span, in reading order
                 inside <PrintSpace>.
  render_page_xml — TessPAGERenderer (renderer.h:204, src/api/pagerenderer.cpp):
                 minimal PAGE XML — a <TextRegion>/<ImageRegion>/<SeparatorRegion>
                 per span with a <ReadingOrder> index.

All are pure built-in DataFrame transforms (no UDFs): string escape /
aggregation stays JVM-side, and the per-doc fold is one shuffle on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Span kinds that carry text into the plain-text rendering (PTIsTextType,
# include/tesseract/publictypes.h:74-80).
TEXT_KINDS = ("text", "flowing_text", "heading_text", "pullout_text",
              "caption_text", "vertical_text", "equation", "inline_equation",
              "table")

# PTIsLineType / PTIsImageType (include/tesseract/publictypes.h:74-92)
LINE_KINDS = ("horz_line", "vert_line")
IMAGE_KINDS = ("flowing_image", "heading_image", "pullout_image")


def render_text(spans: DataFrame, separator: str = "\n\n") -> DataFrame:
    """(doc_id, text): text spans in span order joined by `separator`."""
    return (
        spans.filter(F.col("kind").isin(*TEXT_KINDS) & F.col("text").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("order", "text"))),
                    lambda s: s["text"],
                ),
                separator,
            ).alias("text")
        )
    )


def render_tsv(spans: DataFrame) -> DataFrame:
    """(doc_id, tsv): one tab-separated line per span:
    span_order, kind, media_ref, text (newlines flattened to \\t-safe form)."""
    line = F.concat_ws(
        "\t",
        F.col("order").cast("string"),
        F.col("kind"),
        F.coalesce(F.col("media_ref"), F.lit("")),
        F.coalesce(F.regexp_replace(F.col("text"), "[\\t\\n]", " "), F.lit("")),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("order", line.alias("line")))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("tsv")
        )
    )


def _escape_html(col):
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def _has_boxes(spans: DataFrame) -> bool:
    """Geometry-bearing input (extract_blocks output) vs plain spans — the
    renderers emit real coordinates when they have them, like the reference's
    renderers always do (hocrrenderer.cpp:123 bbox; altorenderer HPOS/VPOS)."""
    return {"left", "top", "right", "bottom"}.issubset(spans.columns)


def _ordered_join(spans: DataFrame, elem, out_name: str,
                  prefix, suffix) -> DataFrame:
    """Fold per-span fragments into one document string in span order."""
    return (
        spans.groupBy("doc_id")
        .agg(
            F.concat(
                prefix,
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("order", elem.alias("e")))
                        ),
                        lambda s: s["e"],
                    ),
                    "\n",
                ),
                suffix,
            ).alias(out_name)
        )
    )


def _escape_xml(col):
    out = _escape_html(col)
    return F.regexp_replace(out, "'", "&apos;")


def render_alto(spans: DataFrame) -> DataFrame:
    """(doc_id, alto): minimal ALTO XML (altorenderer.cpp:131 writes one
    <TextBlock>/<Illustration>/<GraphicalElement> per block in iterator
    order; we carry kind in TAGREFS since our spans keep no geometry)."""
    sid = F.col("order").cast("string")
    if _has_boxes(spans):
        # real coordinates, ALTO-style top-left + extent attributes
        pos = F.concat(
            F.lit("' HPOS='"), F.col("left").cast("string"),
            F.lit("' VPOS='"), F.col("top").cast("string"),
            F.lit("' WIDTH='"), (F.col("right") - F.col("left") + 1).cast("string"),
            F.lit("' HEIGHT='"), (F.col("bottom") - F.col("top") + 1).cast("string"),
        )
    else:
        pos = F.lit("")
    elem = (
        F.when(
            F.col("kind").isin(*LINE_KINDS),
            F.concat(F.lit("    <GraphicalElement ID='block_"), sid,
                     F.lit("' TAGREFS='"), F.col("kind"), pos, F.lit("'/>")),
        )
        .when(
            # branch on KIND, not text-nullness: layout-only output
            # (recognize=False) carries NULL text on genuine text blocks,
            # and those must stay TextBlocks (empty CONTENT), exactly like
            # the reference's renderers type by PTIsTextType, never by
            # whether recognition ran (publictypes.h:74-92)
            F.col("kind").isin(*IMAGE_KINDS),
            F.concat(F.lit("    <Illustration ID='block_"), sid,
                     F.lit("' TAGREFS='"), F.col("kind"), pos, F.lit("' FILEID='"),
                     _escape_xml(F.coalesce(F.col("media_ref"), F.lit(""))),
                     F.lit("'/>")),
        )
        .otherwise(
            F.concat(
                F.lit("    <TextBlock ID='block_"), sid,
                F.lit("' TAGREFS='"), F.col("kind"), pos,
                F.lit("'><TextLine><String CONTENT='"),
                _escape_xml(F.regexp_replace(
                    F.coalesce(F.col("text"), F.lit("")), "\n", " ")),
                F.lit("'/></TextLine></TextBlock>"),
            )
        )
    )
    return _ordered_join(
        spans, elem, "alto",
        F.concat(
            F.lit("<alto xmlns='http://www.loc.gov/standards/alto/ns-v3#'>"
                  "<Layout><Page ID='"),
            _escape_xml(F.col("doc_id")),
            F.lit("'><PrintSpace>\n"),
        ),
        F.lit("\n</PrintSpace></Page></Layout></alto>"),
    )


def render_page_xml(spans: DataFrame) -> DataFrame:
    """(doc_id, page_xml): minimal PAGE XML (pagerenderer.cpp): a typed
    region per span plus a <ReadingOrder> listing region ids in span order."""
    sid = F.col("order").cast("string")
    region = (
        F.when(
            F.col("kind").isin(*LINE_KINDS),
            F.concat(F.lit("    <SeparatorRegion id='r"), sid,
                     F.lit("' custom='"), F.col("kind"), F.lit("'/>")),
        )
        .when(
            # kind-typed, like render_alto: a layout-only text block (NULL
            # text under recognize=False) is still a TextRegion
            F.col("kind").isin(*IMAGE_KINDS),
            F.concat(F.lit("    <ImageRegion id='r"), sid,
                     F.lit("' custom='"), F.col("kind"), F.lit("' imageFilename='"),
                     _escape_xml(F.coalesce(F.col("media_ref"), F.lit(""))),
                     F.lit("'/>")),
        )
        .otherwise(
            F.concat(
                F.lit("    <TextRegion id='r"), sid,
                F.lit("' custom='"), F.col("kind"),
                F.lit("'><TextEquiv><Unicode>"),
                # line breaks as char refs: the per-doc fold joins fragments
                # with \n, so literal newlines inside a region are off-limits
                F.regexp_replace(
                    _escape_xml(F.coalesce(F.col("text"), F.lit(""))),
                    "\n", "&#10;"),
                F.lit("</Unicode></TextEquiv></TextRegion>"),
            )
        )
    )
    ordered_ref = F.concat(
        F.lit("      <RegionRefIndexed index='"), sid,
        F.lit("' regionRef='r"), sid, F.lit("'/>"),
    )
    elem = F.concat(region, F.lit("\x00"), ordered_ref)
    folded = _ordered_join(spans, elem, "page_xml", F.lit(""), F.lit(""))
    # split the interleaved fold into the two document sections
    regions = F.array_join(F.transform(
        F.split(F.col("page_xml"), "\n"),
        lambda ln: F.split(ln, "\x00")[0]), "\n")
    refs = F.array_join(F.transform(
        F.split(F.col("page_xml"), "\n"),
        lambda ln: F.split(ln, "\x00")[1]), "\n")
    return folded.select(
        "doc_id",
        F.concat(
            F.lit("<PcGts xmlns='http://schema.primaresearch.org/PAGE/gts/"
                  "pagecontent/2019-07-15'>\n  <Page imageFilename='"),
            _escape_xml(F.col("doc_id")),
            F.lit("'>\n    <ReadingOrder><OrderedGroup id='ro'>\n"),
            refs,
            F.lit("\n    </OrderedGroup></ReadingOrder>\n"),
            regions,
            F.lit("\n  </Page>\n</PcGts>"),
        ).alias("page_xml"),
    )


def render_hocr(spans: DataFrame) -> DataFrame:
    """(doc_id, hocr): minimal hOCR document — a div per span with its kind
    as the hOCR class annotation."""
    title = F.col("kind")
    if _has_boxes(spans):
        # hOCR bbox property (hocrrenderer.cpp:123): title='kind; bbox l t r b'
        title = F.concat(
            F.col("kind"), F.lit("; bbox "),
            F.concat_ws(" ", F.col("left").cast("string"),
                        F.col("top").cast("string"),
                        F.col("right").cast("string"),
                        F.col("bottom").cast("string")))
    body_div = F.concat(
        F.lit("  <div class='ocr_carea' id='block_"),
        F.col("order").cast("string"),
        F.lit("' title='"),
        title,
        F.lit("'>"),
        # kind-typed like the XML sinks: image kinds embed the media ref,
        # line kinds have no body, text kinds show their (possibly empty
        # under recognize=False) text
        F.when(
            F.col("kind").isin(*IMAGE_KINDS),
            F.concat(F.lit("<img src='"),
                     F.coalesce(F.col("media_ref"), F.lit("")),
                     F.lit("'/>")),
        )
        .when(F.col("kind").isin(*LINE_KINDS), F.lit(""))
        .otherwise(_escape_html(F.coalesce(F.col("text"), F.lit("")))),
        F.lit("</div>"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.concat(
                F.lit("<html><body>\n"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("order", body_div.alias("div")))
                        ),
                        lambda s: s["div"],
                    ),
                    "\n",
                ),
                F.lit("\n</body></html>"),
            ).alias("hocr")
        )
    )

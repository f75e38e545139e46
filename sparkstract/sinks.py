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

All three are pure built-in DataFrame transforms (no UDFs): string escape /
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


def render_hocr(spans: DataFrame) -> DataFrame:
    """(doc_id, hocr): minimal hOCR document — a div per span with its kind
    as the hOCR class annotation."""
    body_div = F.concat(
        F.lit("  <div class='ocr_carea' id='block_"),
        F.col("order").cast("string"),
        F.lit("' title='"),
        F.col("kind"),
        F.lit("'>"),
        F.when(
            F.col("text").isNotNull(), _escape_html(F.col("text"))
        ).otherwise(F.concat(F.lit("<img src='"),
                             F.coalesce(F.col("media_ref"), F.lit("")),
                             F.lit("'/>"))),
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

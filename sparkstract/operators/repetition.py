"""Gopher-style repetition filters (Rae et al. 2021, §A1.1 — the standard
within-document quality rules every large corpus pipeline applies):

  * duplicate-line fraction — share of a doc's lines that are repeats of an
    earlier line (templated pages, scraped chrome)
  * top-n-gram character fraction — share of the doc's characters covered
    by its single most frequent word n-gram (spammy keyword stuffing)

Distributed shape: explode + two-level aggregation — per (doc, line/gram)
counts, then per-doc rollup. Shuffles are on (doc_id, line/gram) with
map-side partial aggregation; no window over the whole corpus, no arrays
of a document's full content in any single aggregation buffer beyond the
per-doc rollup row. Each stat has a bit-identical DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .dedup import spread


def repetition_stats(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_ngram, top_ngram_char_frac).
    Lines split on newline, blank lines ignored; the n-gram stat uses word
    n-grams (default bigrams) over lowercased whitespace tokens, char share
    = occurrences * len(gram) / total non-space char count. Docs shorter
    than one gram score 0 with a NULL top_ngram."""
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    lines = (
        base.select(
            "doc_id",
            F.explode(F.split(F.col("text"), "\n")).alias("line"))
        .select("doc_id", F.trim("line").alias("line"))
        .filter(F.col("line") != "")
    )
    line_stats = (
        lines.groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_lines"),
             (F.sum("c") - F.count(F.lit(1))).alias("n_dup_lines"))
        .select("doc_id", "n_lines",
                F.round(F.col("n_dup_lines") / F.col("n_lines"), 6)
                .alias("dup_line_frac"))
    )

    toks = tokens(F.lower(F.col("text")))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chars = base.select(
        "doc_id",
        F.length(F.regexp_replace(F.lower("text"), "\\s", "")).alias("n_chars"))
    gram_counts = (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # top gram per doc: max_by with a deterministic (count, gram) tie-break
    top = (
        gram_counts.groupBy("doc_id")
        .agg(F.max(F.struct(F.col("c"), F.col("gram"))).alias("t"))
        .select("doc_id", F.col("t.gram").alias("top_ngram"),
                F.col("t.c").alias("top_c"))
    )
    # chars covers every doc (a blank doc has no lines and no grams but must
    # still emit a row) — left-join the stats onto it
    return (
        chars.join(line_stats, "doc_id", "left")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            "top_ngram",
            F.when(
                F.col("top_c").isNotNull() & (F.col("n_chars") > 0),
                F.round(F.col("top_c") *
                        F.length(F.regexp_replace("top_ngram", "\\s", "")) /
                        F.col("n_chars"), 6),
            ).otherwise(F.lit(0.0)).alias("top_ngram_char_frac"),
        )
    )

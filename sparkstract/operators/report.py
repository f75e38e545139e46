"""Corpus data-card report: the per-stratum summary a dataset release ships
with (datasheet/data-card numbers — doc counts, token totals, length stats,
within-stratum exact-dup counts), grouped by (lang, source) with rollup
totals.

Pure GROUP BY ROLLUP over row-local expressions — one shuffle whose key
space is the (lang, source) stratum set (tiny by construction), map-side
combine does the heavy lifting. The dup count rides the same pass as a
distinct-fingerprint aggregate, so no second corpus scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint, token_count


def corpus_report(docs: DataFrame, lang_col: str = "lang",
                  source_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """One row per (lang, source) stratum plus rollup subtotals/total
    (NULL = all): n_docs, n_dup_docs (docs minus distinct whitespace-collapsed
    fingerprints — exact dups WITHIN the stratum), token/char totals and
    the 6dp-rounded mean document length."""
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).alias("n_toks"),
        F.length(F.col(text_col)).alias("n_chars"),
        fingerprint(F.col(text_col)).alias("fp"))
    return (base.rollup("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.count(F.lit(1)) - F.countDistinct("fp"))
                 .alias("n_dup_docs"),
                 F.sum("n_toks").cast("long").alias("total_tokens"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.round(F.avg("n_toks"), 6).alias("avg_tokens")))


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, status): the delta between two corpus snapshots —
    'added' (only in new), 'removed' (only in old), 'changed' (same id,
    different content fingerprint). Unchanged docs are filtered out: the
    DELTA is the small artifact an incremental pipeline run consumes (what
    to re-extract, re-dedup, re-index — the batch-side companion of
    minhash_match's incoming-batch gate).

    Scale shape: fingerprints are computed map-side on each scan, the
    full-outer join keys on the uniform doc_id, and the unchanged filter
    runs before anything downstream — at 10^12 docs the output is
    bounded by the churn rate, not the corpus."""
    from ..functions.textstats import fingerprint

    o = old.select(F.col(id_col).alias("doc_id"),
                   fingerprint(F.col(text_col)).alias("fp_old"))
    n = new.select(F.col(id_col).alias("doc_id"),
                   fingerprint(F.col(text_col)).alias("fp_new"))
    status = (F.when(F.col("fp_old").isNull(), "added")
              .when(F.col("fp_new").isNull(), "removed")
              .when(F.col("fp_old") != F.col("fp_new"), "changed"))
    return (o.join(n, "doc_id", "full_outer")
            .select("doc_id", status.alias("status"))
            .filter(F.col("status").isNotNull()))

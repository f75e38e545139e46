"""End-to-end corpus curation: the composition a 100 TB training-data
pipeline actually runs — content gating (token count, language ID, quality
score) followed by keep-one-per-duplicate-cluster — with an auditable
verdict per document (what was dropped and WHY), not just the survivors.

Scale shape: the stats are pure column expressions (whole-stage codegen,
one corpus scan). Connected components run over the near-dup PAIR graph
only (docs that appear in some pair); the component map and the
per-cluster winner table are both bounded by the pair set. Their joins
back to the corpus are left to AQE on purpose: usually the maps are tiny
and AQE broadcasts them, but on a heavily duplicated corpus the pair
graph is corpus-scale and a hand-forced broadcast would OOM the driver —
AQE degrades those joins to co-partitioned shuffles instead.

Reason precedence is fixed (too_short > wrong_lang > low_quality >
duplicate) so the verdict column is deterministic and the DuckDB oracle twin
can reproduce it with an identical CASE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as ts
from .cluster import connected_components


def curate_corpus(docs: DataFrame, pairs: DataFrame, min_tokens: int = 20,
                  langs: tuple[str, ...] = ("en",), min_quality: float = 0.1,
                  min_coherence: float | None = None,
                  max_dup_line_frac: float | None = None,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per input document: (doc_id, lang, n_tokens, quality,
    cluster_id, kept, reason). `pairs` is any near-dup pair frame
    (doc_a, doc_b) — minhash_lsh_pairs / simhash_near_dup_pairs output.
    The kept doc of a duplicate cluster is the lexicographic min among the
    docs that pass the content gates (a cluster whose canonical doc is
    low-quality should not lose its good members to it).

    Optional gates (None = off): `min_coherence` drops gibberish via the
    char-bigram score ('gibberish' reason); `max_dup_line_frac` drops
    line-repetitive docs via the Gopher rule ('repetitive' reason)."""
    stats = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        ts.token_count(F.col(text_col)).alias("n_tokens"),
        ts.lang_id(F.col(text_col)).alias("lang"),
        ts.quality_score(F.col(text_col)).alias("quality"),
    )
    if min_coherence is not None:
        stats = stats.withColumn(
            "coherence", ts.bigram_coherence(F.col("__text")))
    if max_dup_line_frac is not None:
        from .repetition import repetition_stats

        rep = repetition_stats(docs, id_col=id_col, text_col=text_col) \
            .select("doc_id", "dup_line_frac")
        stats = stats.join(rep, "doc_id")
    stats = stats.drop("__text")
    content_pass = ((F.col("n_tokens") >= min_tokens)
                    & F.col("lang").isin(*langs)
                    & (F.col("quality") >= min_quality))
    if min_coherence is not None:
        content_pass = content_pass & (F.col("coherence") >= min_coherence)
    if max_dup_line_frac is not None:
        content_pass = content_pass & (
            F.col("dup_line_frac") <= max_dup_line_frac)
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    g = (
        stats.join(comp, "doc_id", "left")
        .withColumn("in_pairs", F.col("cluster_id").isNotNull())
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
        .withColumn("content_pass", content_pass)
    )
    # winner per cluster among content-passing members — the filter keeps
    # only pair-involved docs, so the aggregate stays bounded by the pair
    # graph, never the corpus
    winners = (
        g.filter(F.col("content_pass") & F.col("in_pairs"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    g = g.join(winners, "cluster_id", "left")
    kept = F.col("content_pass") & (
        ~F.col("in_pairs") | (F.col("doc_id") == F.col("keep_id")))
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(~F.col("lang").isin(*langs), F.lit("wrong_lang"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
    )
    if min_coherence is not None:
        reason = reason.when(F.col("coherence") < min_coherence,
                             F.lit("gibberish"))
    if max_dup_line_frac is not None:
        reason = reason.when(F.col("dup_line_frac") > max_dup_line_frac,
                             F.lit("repetitive"))
    reason = (reason.when(~kept, F.lit("duplicate"))
              .otherwise(F.lit("kept")))
    return g.select("doc_id", "lang", "n_tokens", "quality", "cluster_id",
                    kept.alias("kept"), reason.alias("reason"))

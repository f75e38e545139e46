"""Deterministic sketches: count-min token counting and Bloom-filter
n-gram membership.

Exact token counts (vocab_topk) shuffle one row per distinct token — fine
until the key space itself is the problem (a 100 TB web corpus has
billions of distinct tokens, most of them junk unigrams seen once). The
count-min sketch (Cormode & Muthukrishnan 2005) bounds the state at
d x w integers REGARDLESS of vocabulary size, overestimating only
(est >= true always; est <= true + eps*N with probability 1-delta, where
eps = e/w and delta = e^-d). The Bloom filter plays the same role for
decontamination membership: a benchmark of 10^8 n-grams becomes m bits
instead of a broadcast string set.

Both sketches hash with md5 slices, so every bucket index — and therefore
every collision and every false positive — is bit-identical in the DuckDB
oracle twin: the approximation itself is deterministic and testable.

Scale shape (100 TB):
  * cms_table: one corpus scan; the aggregation key space is d x w
    (constant), so map-side combine collapses each task's output to at
    most d x w rows before the one exchange.
  * cms_lookup: the sketch is d x w rows by construction — broadcast, by
    construction, not by luck (the decontaminate argument).
  * bloom_bits / decontaminate_bloom: the bit table is at most m rows of
    one integer; the corpus-side probe is a broadcast hash lookup per
    (gram, hash-index) with no shuffle of the gram stream; the only
    exchange is the per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import hex_slice_to_long, tokens
from .dedup import spread, word_ngrams


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row `row`'s bucket for a string key: md5 hex slice [8*row, 8*row+8)
    mod width. md5 yields 32 hex chars, so rows 0..3 are independent
    32-bit hashes of the same key."""
    return hex_slice_to_long(F.md5(col), 8 * row, 8) % width


def cms_table(docs: DataFrame, depth: int = 4, width: int = 1024,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count-min sketch of the corpus token stream (lowercased):
    (row, bucket, cnt), at most depth x width rows. depth <= 4 (md5 gives
    four independent 32-bit slices)."""
    assert 1 <= depth <= 4 and width >= 1
    tok = spread(docs).select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    rows = [
        tok.select(F.lit(r).alias("row"),
                   _bucket(F.col("tok"), r, width).alias("bucket"))
        for r in range(depth)
    ]
    stream = rows[0]
    for frame in rows[1:]:
        stream = stream.unionByName(frame)
    return (stream.groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(cms: DataFrame, keys: DataFrame, depth: int = 4,
               width: int = 1024, key_col: str = "token") -> DataFrame:
    """Point estimates for `keys`: (token, est) where est = min over rows
    of the key's bucket count (0 if a bucket is empty — only possible when
    the key never occurred). est >= true count always."""
    probes = None
    for r in range(depth):
        p = keys.select(
            F.col(key_col).alias("token"),
            F.lit(r).alias("row"),
            _bucket(F.col(key_col), r, width).alias("bucket"))
        probes = p if probes is None else probes.unionByName(p)
    return (probes.join(F.broadcast(cms), ["row", "bucket"], "left")
            .groupBy("token")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est")))


def bloom_bits(grams: DataFrame, m_bits: int = 1 << 20,
               n_hashes: int = 3, gram_col: str = "ngram") -> DataFrame:
    """Bloom bit table for a gram set: (bit,), at most m_bits rows (in
    practice ~ n_grams x n_hashes distinct bits). n_hashes <= 4."""
    assert 1 <= n_hashes <= 4
    bits = None
    for r in range(n_hashes):
        b = grams.select(_bucket(F.col(gram_col), r, m_bits).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    return bits.distinct()


def decontaminate_bloom(train: DataFrame, benchmark: DataFrame, n: int = 8,
                        m_bits: int = 1 << 20, n_hashes: int = 3,
                        min_overlap: int = 1, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the scale path
    when the eval gram set is too large to broadcast as strings (the exact
    variant is operators/decontam.decontaminate). One row per training
    doc: (doc_id, n_grams, n_hits, contaminated). A gram counts as a hit
    iff ALL n_hashes of its bits are set, so n_hits >= the exact overlap
    (false positives only, never false negatives — same guarantee the
    filter gives; both engines see the SAME false positives because the
    bits are md5-derived)."""
    bench_bits = bloom_bits(
        word_ngrams(benchmark, n=n, id_col=id_col, text_col=text_col),
        m_bits=m_bits, n_hashes=n_hashes).withColumn("__set", F.lit(1))
    tg = word_ngrams(train, n=n, id_col=id_col, text_col=text_col)
    probes = None
    for r in range(n_hashes):
        p = tg.select("doc_id", "ngram",
                      _bucket(F.col("ngram"), r, m_bits).alias("bit"))
        probes = p if probes is None else probes.unionByName(p)
    per_gram = (probes.join(F.broadcast(bench_bits), "bit", "left")
                .groupBy("doc_id", "ngram")
                .agg((F.count("__set") == n_hashes).cast("int")
                     .alias("hit")))
    per_doc = (per_gram.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum("hit").alias("n_hits")))
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_overlap)
             .alias("contaminated"),
        )
    )

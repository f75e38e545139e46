"""Training-sequence packing: place chunked samples into fixed token-budget
sequences (the GPT-style "concat and cut" dataset layout) — the step after
chunk_documents in the training-prep chain (sample -> decontaminate ->
split -> chunk -> PACK).

Chunks are ordered by a salted md5 hash (deterministically shuffled, so
one sequence mixes documents/sources — what a trainer wants) and
concatenated; a chunk's sequence is where its first token lands:
seq_id = start_offset // budget, start_in_seq = start_offset % budget.

Scale shape: the running token sum is a window per HASH BUCKET, not a
global window — each bucket's partition is ~corpus/n_buckets (pick
n_buckets so a bucket's chunk rows fit one executor; 4096 at the 100 TB
scale). The only cross-bucket artifact is the tail: at most one partial
sequence per bucket, the documented waste bound. One shuffle total (the
bucket window's hash partitioning)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import hex_prefix_to_long


def pack_sequences(chunks: DataFrame, budget: int = 256,
                   n_buckets: int = 32, salt: str = "pack",
                   id_col: str = "doc_id", chunk_col: str = "chunk_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """(bucket, seq_id, start_in_seq, doc_id, chunk_id, n_tokens) — every
    input chunk placed in a bucket-local sequence. seq_id is bucket-local;
    (bucket, seq_id) is the global sequence key. Deterministic: the order
    inside a bucket is (md5(salt:doc:chunk), doc_id, chunk_id), so retries
    and both engines agree."""
    assert budget >= 1 and n_buckets >= 1
    h = hex_prefix_to_long(
        F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(id_col).cast("string"),
                          F.col(chunk_col).cast("string"))), 8)
    base = chunks.select(
        F.col(id_col).alias("doc_id"),
        F.col(chunk_col).alias("chunk_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        h.alias("h"),
    ).withColumn("bucket", (F.col("h") % n_buckets).cast("int"))
    w = (Window.partitionBy("bucket")
         .orderBy("h", "doc_id", "chunk_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (base
            .withColumn("start", start)
            .select("bucket",
                    F.floor(F.col("start") / budget).alias("seq_id"),
                    (F.col("start") % budget).alias("start_in_seq"),
                    "doc_id", "chunk_id", "n_tokens"))

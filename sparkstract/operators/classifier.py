"""Trained quality classifier: hashed bag-of-words logistic regression —
the fastText-style filter of real curation stacks (CCNet/RefinedWeb/LLaMA
pipelines train a linear classifier to imitate an expensive quality signal,
then score the corpus cheaply). Features are hashed unigram counts
(the importance_scores hash-space trick: the model lives in a FIXED
B-bucket space, so a 100 TB vocabulary never materializes); training is
full-batch gradient descent with the kmeans scale pattern — the MODEL is
the only thing that leaves the executors (B+1 floats per round), the data
never moves.

Determinism contract (two engines, any partitioning): weights are integer
micro-units; a doc's margin is sum(x * w_u) — EXACT integer arithmetic
(x is an integer count, w_u an integer weight); per-doc residuals quantize
to micro-units before the gradient sum, which is again exact integer; and
the weight update rounds inside the ENGINE (Spark/DuckDB round half-away,
python's round is half-even — never round model state driver-side)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import hex_prefix_to_long, tokens
from .dedup import spread


def hashed_features(docs: DataFrame, buckets: int = 64,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, bucket, x): unigram counts hashed into a fixed bucket
    space — md5-salted so the DuckDB twin is bit-identical."""
    tok = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    b = hex_prefix_to_long(
        F.md5(F.concat_ws(":", F.lit("feat"), F.col("tok"))), 8) % buckets
    return (tok.select("doc_id", b.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("x")))


def logreg_fit(feats: DataFrame, labels: DataFrame, buckets: int = 64,
               lr: float = 0.5, iters: int = 2) -> tuple[dict[int, int], int]:
    """Full-batch logistic-regression GD over (doc_id, bucket, x) features
    and (doc_id, y) labels (y in {0.0, 1.0}). Returns the model as integer
    micro-unit weights: ({bucket: w_u}, bias_u); real weight = w_u / 1e6.

    Per round: one margin pass (join against the broadcast B-row weight
    table, exact integer sum), one gradient aggregation whose key space is
    B buckets (map-side combine — the exchange carries at most B rows per
    map task), and a B-row collect. Weight updates are computed with
    engine-side rounding (F.round), never python round."""
    spark = feats.sparkSession
    # labels are read every round (residuals) and may carry their own
    # subplan (e.g. a percentile label gate) — persist once, it's one
    # (doc_id, y) row per doc; a caller that persisted it already (to reuse
    # the frame after training, e.g. for the final scored join) keeps
    # ownership — we must not unpersist a cache we did not create
    from pyspark import StorageLevel

    owns_labels = labels.storageLevel == StorageLevel.NONE
    if owns_labels:
        labels = labels.persist()
    n = labels.count()
    assert n > 0 and iters >= 0
    # the bias rides as synthetic bucket -1 (x=1 for every labeled doc):
    # margins then include it for free and the gradient aggregation covers
    # it in the SAME pass — one Spark action per round instead of three
    # (the arithmetic is identical: m_u + bias_u == sum over buckets+{-1})
    bias_feats = labels.select(
        "doc_id", F.lit(-1).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"))
    # co-partition by doc_id ONCE before the loop, with the label folded
    # into the feature rows: every round's margin groupBy(doc_id) and
    # gradient join(doc_id) then reuse the cached partitioning, and the
    # residual needs NO per-round label join (y rides the margin
    # aggregation as first(y) — constant per doc). The
    # shuffle-once-reuse-across-iterations pattern iterative jobs need.
    all_feats = (feats.select(
        "doc_id", F.col("bucket").cast("long").alias("bucket"),
        F.col("x").cast("long").alias("x")).unionByName(bias_feats)
        .join(labels, "doc_id")
        .repartition("doc_id").persist())
    try:
        w_u: dict[int, int] = {j: 0 for j in range(buckets)}
        w_u[-1] = 0
        for _ in range(iters):
            wtab = spark.createDataFrame(
                [(j, w) for j, w in w_u.items()], "bucket long, w_u long")
            # every labeled doc has at least the bias row, so the margin
            # aggregation covers the full label set — m_u is never null
            margins = (all_feats.join(F.broadcast(wtab), "bucket")
                       .groupBy("doc_id")
                       .agg(F.sum(F.col("x") * F.col("w_u")).alias("m_u"),
                            F.first("y").alias("y")))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(
                -(F.col("m_u") / F.lit(1e6))))
            resid = margins.select(
                "doc_id",
                F.round((p - F.col("y")) * F.lit(1e6), 0)
                 .cast("long").alias("r_u"))
            grads = (all_feats.join(resid, "doc_id")
                     .groupBy("bucket")
                     .agg(F.round(F.lit(lr) * F.sum(F.col("x")
                                                    * F.col("r_u"))
                                  / F.lit(n), 0)
                           .cast("long").alias("d_u"))
                     .collect())
            for r in grads:
                w_u[r["bucket"]] -= r["d_u"]
    finally:
        all_feats.unpersist()
        if owns_labels:
            labels.unpersist()
    bias_u = w_u.pop(-1)
    return w_u, bias_u


def logreg_score(feats: DataFrame, w_u: dict[int, int],
                 bias_u: int) -> DataFrame:
    """(doc_id, score): sigmoid of the exact integer margin under the
    trained model, rounded to 6dp."""
    spark = feats.sparkSession
    wtab = spark.createDataFrame(
        [(j, w) for j, w in w_u.items()], "bucket long, w_u long")
    return (feats.join(F.broadcast(wtab), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.col("w_u")).alias("m_u"))
            .select("doc_id",
                    F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(
                        -((F.col("m_u") + F.lit(bias_u)) / F.lit(1e6)))),
                        6).alias("score")))

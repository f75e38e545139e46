"""Hashed logistic-regression quality classifier (operators/classifier.py)."""
from pyspark.sql import functions as F

from sparkstract.operators.classifier import (
    hashed_features,
    logreg_fit,
    logreg_score,
)


def _corpus(spark):
    rows = ([(i, "good clean fluent prose text here") for i in range(8)]
            + [(100 + i, "zxq vvk jjw garbled noise blob") for i in range(8)])
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logreg_separates_marked_classes(spark):
    docs = _corpus(spark)
    feats = hashed_features(docs, buckets=64)
    labels = docs.select(
        "doc_id", F.when(F.col("doc_id") < 100, 1.0).otherwise(0.0).alias("y"))
    w_u, bias_u = logreg_fit(feats, labels, buckets=64, lr=0.5, iters=3)
    scores = {r["doc_id"]: r["score"]
              for r in logreg_score(feats, w_u, bias_u).collect()}
    pos = [scores[i] for i in range(8)]
    neg = [scores[100 + i] for i in range(8)]
    # every positive doc scores above every negative doc
    assert min(pos) > max(neg)
    # identical docs get identical scores (exact integer margins)
    assert len(set(pos)) == 1 and len(set(neg)) == 1
    assert all(0.0 <= s <= 1.0 for s in scores.values())


def test_logreg_deterministic_across_partitionings(spark):
    docs = _corpus(spark)
    labels = docs.select(
        "doc_id", F.when(F.col("doc_id") < 100, 1.0).otherwise(0.0).alias("y"))
    outs = []
    for parts in (1, 7):
        feats = hashed_features(docs.repartition(parts), buckets=64)
        w_u, b_u = logreg_fit(feats, labels, buckets=64, iters=2)
        outs.append((sorted(w_u.items()), b_u,
                     sorted(map(tuple, logreg_score(feats, w_u, b_u)
                                .collect()))))
    assert outs[0] == outs[1]

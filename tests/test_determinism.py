"""Repartition-determinism: summed scores must be bit-identical across
partition layouts (the integer micro-unit contract in PLANS.md)."""
from sparkstract.operators.lm import lm_doc_nll
from sparkstract.operators.search import bm25_topk


def _docs(spark, parts):
    rows = [(i, ("alpha beta gamma delta " * (1 + i % 5)) + f"tail{i % 7}")
            for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, text string").repartition(parts)


def test_lm_nll_identical_across_partitionings(spark):
    a = sorted(map(tuple, lm_doc_nll(_docs(spark, 1)).collect()))
    b = sorted(map(tuple, lm_doc_nll(_docs(spark, 7)).collect()))
    assert a == b


def test_bm25_identical_across_partitionings(spark):
    a = sorted(map(tuple,
                   bm25_topk(_docs(spark, 1), ["alpha", "tail3"], 20)
                   .collect()))
    b = sorted(map(tuple,
                   bm25_topk(_docs(spark, 7), ["alpha", "tail3"], 20)
                   .collect()))
    assert a == b

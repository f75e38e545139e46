"""Bigram LM quality scoring (operators/lm.py)."""
from sparkstract.operators.lm import lm_doc_nll


def test_lm_doc_nll_separates_fluent_from_gibberish(spark):
    fluent = "the cat sat on the mat and the cat sat again"
    docs = spark.createDataFrame(
        [
            (1, fluent),
            (2, fluent),
            (3, fluent),
            (4, "zq xv jk wp zq bn mm yy"),  # bigrams seen once each
            (5, "solo"),                      # < 2 tokens: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_doc_nll(docs, k=0.1).collect()}
    assert len(out) == 5
    # the repeated fluent pattern is high-probability under its own corpus
    assert out[1]["nll"] < out[4]["nll"]
    assert out[1]["nll"] == out[2]["nll"] == out[3]["nll"]
    # no-bigram doc: NULL score, zero count
    assert out[5]["nll"] is None and out[5]["n_bigrams"] == 0
    assert out[4]["n_bigrams"] == 7
    assert all(out[i]["nll"] > 0 for i in (1, 2, 3, 4))


def test_perplexity_buckets_tercile_semantics(spark):
    # mirror of q_perplexity_buckets over a local frame via the operator +
    # the same boundary CASE
    from pyspark.sql import functions as F
    from sparkstract.operators.lm import lm_doc_nll

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " + ("zz qq " * (i % 3)))
         for i in range(12)],
        "doc_id long, text string",
    )
    s = lm_doc_nll(docs).filter(F.col("nll").isNotNull())
    b = s.agg(F.round(F.percentile("nll", F.lit(1.0 / 3.0)), 6).alias("b1"),
              F.round(F.percentile("nll", F.lit(2.0 / 3.0)), 6).alias("b2"))
    out = (s.crossJoin(F.broadcast(b))
           .select(F.when(F.col("nll") <= F.col("b1"), "head")
                    .when(F.col("nll") <= F.col("b2"), "middle")
                    .otherwise("tail").alias("bucket"), "nll")
           .collect())
    buckets = {}
    for r in out:
        buckets.setdefault(r["bucket"], []).append(r["nll"])
    # all three buckets populated, ordered head < middle < tail by max/min
    assert set(buckets) == {"head", "middle", "tail"}
    assert max(buckets["head"]) <= min(buckets["middle"])
    assert max(buckets["middle"]) <= min(buckets["tail"])

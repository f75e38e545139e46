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

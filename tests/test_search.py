"""BM25 ranking semantics (operators/search.py)."""
from pyspark.sql import functions as F

from sparkstract.operators.search import bm25_topk


def test_bm25_ranks_rare_term_and_length_norm(spark):
    docs = spark.createDataFrame(
        [
            (1, "zebra apple apple"),          # rare term, short doc
            (2, "apple apple apple apple apple apple apple apple"),
            (3, "apple banana cherry date egg fig grape kiwi"),
            (4, "banana cherry date egg fig grape kiwi lemon"),  # no match
            (5, "apple"),                       # tf=1 but shortest
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["zebra", "apple"], topk=10)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    ids = [r["doc_id"] for r in rows]
    # doc 4 matches nothing -> absent; ranks are dense 1..n
    assert 4 not in ids
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # the only zebra doc wins: idf of a 1-of-5 term dominates
    assert ids[0] == 1
    # length normalization: doc 5 (tf=1, dl=1) beats doc 3 (tf=1, dl=8)
    assert ids.index(5) < ids.index(3)
    assert all(r["score"] > 0 for r in rows)


def test_bm25_topk_truncates_and_orders(spark):
    docs = spark.createDataFrame(
        [(i, "apple " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["apple"], topk=3).collect()
    assert len(out) == 3
    # scores are monotone in rank
    by_rank = sorted(out, key=lambda r: r["rank"])
    scores = [r["score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_doc_keywords_prefers_rare_terms(spark):
    from sparkstract.operators.search import doc_keywords
    docs = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common quartz quartz"),
            (3, "common plain words here"),
        ],
        "doc_id long, text string",
    )
    out = doc_keywords(docs, topk=2)
    rows = {(r["doc_id"], r["rank"]): r["tok"] for r in out.collect()}
    # rare repeated term beats the corpus-wide common one
    assert rows[(1, 1)] == "zebra"
    assert rows[(2, 1)] == "quartz"
    # every doc gets exactly topk (or its distinct-term count) rows
    assert len([k for k in rows if k[0] == 1]) == 2

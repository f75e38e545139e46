"""Cross-document repeated-substring removal + per-source quota cap."""

from __future__ import annotations

import pytest

from sparkstract.operators.sampling import cap_per_source
from sparkstract.operators.substrings import (
    repeated_gram_hashes,
    strip_repeated_substrings,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "something THE QUICK BROWN FOX ate yesterday"),  # case-folded hit
        (3, "entirely different content with no shared runs"),
        (4, ""),                                             # empty
        (5, "quick brown"),                                  # shorter than k
        (6, "alpha beta gamma alpha beta gamma"),            # intra-doc only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_shared_run_removed_case_insensitively(docs):
    out = _by_id(strip_repeated_substrings(docs, k=3))
    # "the quick brown fox" (4 tokens) is covered by two shared trigrams
    assert out[1]["clean_text"] == "jumps over the lazy dog"
    assert out[1]["n_removed"] == 4
    # removal preserves the survivor's ORIGINAL case and order
    assert out[2]["clean_text"] == "something ate yesterday"
    assert out[2]["n_removed"] == 4


def test_unshared_short_and_empty_docs_untouched(docs):
    out = _by_id(strip_repeated_substrings(docs, k=3))
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("entirely different")
    assert out[4]["n_tokens"] == 0 and out[4]["clean_text"] == ""
    assert out[5]["n_removed"] == 0  # doc shorter than k never matches
    # intra-doc repetition is NOT cross-document: min_docs counts DISTINCT
    # docs, so doc 6's self-repeated trigram survives
    assert out[6]["n_removed"] == 0


def test_row_count_and_min_docs_threshold(docs):
    out = strip_repeated_substrings(docs, k=3, min_docs=3)
    rows = out.collect()
    assert len(rows) == 6                      # one row per input doc
    assert all(r["n_removed"] == 0 for r in rows)  # no trigram in 3+ docs


def test_fully_boilerplate_doc_empties(spark):
    df = spark.createDataFrame(
        [(1, "same old text"), (2, "same old text")],
        "doc_id long, text string")
    out = _by_id(strip_repeated_substrings(df, k=3))
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 3
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 3


def test_repeated_gram_hashes_count_distinct_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z"), (3, "a b c")],
        "doc_id long, text string")
    # "a b c" occurs twice in doc 1 + once in doc 3 -> 2 distinct docs
    assert repeated_gram_hashes(df, k=3, min_docs=2).count() == 1
    assert repeated_gram_hashes(df, k=3, min_docs=3).count() == 0


@pytest.fixture(scope="module")
def sourced(spark):
    rows = [(i, f"text {i}", f"s{i % 4}") for i in range(40)]
    # s0..s3 have 10 docs each; s4 has 2 (under any cap)
    rows += [(100, "text 100", "s4"), (101, "text 101", "s4")]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_cap_per_source_exact_quota_and_determinism(sourced):
    out = cap_per_source(sourced, max_docs=5)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").count().withColumnRenamed("count", "n")
           .collect()}
    assert per == {"s0": 5, "s1": 5, "s2": 5, "s3": 5, "s4": 2}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in cap_per_source(sourced, 5).collect())
    assert a == b  # md5 coin, not rand: identical subset on re-run


def test_cap_per_source_under_quota_bypass_keeps_all(sourced):
    assert cap_per_source(sourced, max_docs=10).count() == 42
    assert cap_per_source(sourced, max_docs=0).count() == 0


def test_cap_per_source_approximate_path(sourced):
    out = cap_per_source(sourced, max_docs=5, exact=False)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").count().withColumnRenamed("count", "n")
           .collect()}
    # expectation 5 per 10-doc source; binomial spread allowed, cap=1.0
    # for the under-quota source keeps everything
    assert per.get("s4", 0) == 2
    assert all(0 < per[s] <= 10 for s in ("s0", "s1", "s2", "s3"))
    again = cap_per_source(sourced, max_docs=5, exact=False)
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())


def test_importance_scores_rank_target_like_docs_higher(spark):
    from sparkstract.operators.sampling import importance_scores
    rows = ([(i, "alpha beta gamma delta " * 5, "tgt") for i in range(20)]
            + [(100 + i, "omega psi chi phi " * 5, "other")
               for i in range(20)]
            + [(999, "", "other")])
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    from pyspark.sql import functions as F
    target = docs.filter(F.col("src") == "tgt")
    out = {r["doc_id"]: r for r in
           importance_scores(docs, target, n_buckets=1000).collect()}
    assert len(out) == 41                       # one row per raw doc
    assert out[999]["n_tokens"] == 0 and out[999]["score"] == 0.0
    # docs drawn from the target vocabulary must outscore the rest
    assert out[0]["score"] > out[100]["score"]
    assert all(out[i]["score"] > 0 for i in range(20))
    assert all(out[100 + i]["score"] < 0 for i in range(20))
    # deterministic: identical on re-run
    again = {r["doc_id"]: r["score"] for r in
             importance_scores(docs, target, n_buckets=1000).collect()}
    assert again == {k: v["score"] for k, v in out.items()}


def test_kmeans_separates_two_obvious_clusters(spark):
    from sparkstract.operators.similarity import kmeans_assign, kmeans_fit
    rows = ([(i, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(10)]
            + [(100 + i, [0.0, 10.0 + (i % 3) * 0.1]) for i in range(10)])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=2, iters=3)
    assert len(cents) == 2 and all(len(c) == 2 for _, c in cents)
    out = {r["vec_id"]: r["cid"] for r in kmeans_assign(emb, cents).collect()}
    left = {out[i] for i in range(10)}
    right = {out[100 + i] for i in range(10)}
    assert len(left) == 1 and len(right) == 1 and left != right
    # deterministic: identical model on refit
    assert cents == kmeans_fit(emb, k=2, iters=3)


def test_kmeans_empty_cluster_keeps_seed(spark):
    from sparkstract.operators.similarity import kmeans_fit
    # k=3 over 2 distinct points: one centroid never wins a vector and
    # must keep its previous (seed) position instead of vanishing
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [9.0, 9.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=3, iters=2)
    assert len(cents) == 3
    assert all(len(c) == 2 for _, c in cents)


def test_ivf_kmeans_topk_finds_in_bucket_neighbours(spark):
    from sparkstract.operators.similarity import ivf_kmeans_topk, kmeans_fit
    from pyspark.sql import functions as F
    rows = ([(i, [10.0, float(i % 3)]) for i in range(8)]
            + [(100 + i, [0.0, 10.0 + (i % 3)]) for i in range(8)])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=2, iters=2)
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = ivf_kmeans_topk(emb, q, cents, k=20).collect()
    ids = {r["vec_id"] for r in out}
    assert ids == set(range(1, 8))       # own bucket only, self excluded
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranks == list(range(1, 8))


def test_pq_adc_recovers_subspace_structure(spark):
    from sparkstract.operators.similarity import pq_encode, pq_topk, pq_train
    from pyspark.sql import functions as F
    # two well-separated groups in a 4-dim space, m=2 subspaces of 2 dims
    rows = ([(i, [5.0, 5.0, float(i % 2), 0.0]) for i in range(6)]
            + [(100 + i, [-5.0, -5.0, 0.0, float(i % 2)]) for i in range(6)])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(emb, m=2, sub_k=2, iters=2, dim=4)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    codes = pq_encode(emb, books)
    got = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in codes.collect()}
    # subspace 0 separates the two groups: same code within, different across
    assert len({got[i][0] for i in range(6)}) == 1
    assert len({got[100 + i][0] for i in range(6)}) == 1
    assert got[0][0] != got[100][0]
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = sorted(pq_topk(emb, q, books, k=12).collect(),
                 key=lambda r: r["rank"])
    # ADC ranks every own-group member above every cross-group member
    own = [r for r in out if r["vec_id"] < 100]
    other = [r for r in out if r["vec_id"] >= 100]
    assert own and other
    assert max(r["rank"] for r in own) < min(r["rank"] for r in other)
    assert all(r["adist"] >= 0 for r in out)


def test_semdedup_keeps_farthest_from_centroid(spark):
    from sparkstract.operators.similarity import kmeans_fit, semdedup
    # tight group A (ids 0-2, near-identical), tight pair B (ids 100-101,
    # identical), one A-aligned outlier (id 50) below the dup threshold
    rows = [(0, [10.0, 0.0, 0.0, 0.0]),
            (1, [10.0, 0.1, 0.0, 0.0]),
            (2, [10.0, 0.2, 0.0, 0.0]),
            (50, [0.1, 10.0, 0.0, 0.0]),
            (100, [-10.0, 0.0, 0.0, 0.0]),
            (101, [-10.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, k=2, iters=2)
    out = {r["vec_id"]: r for r in semdedup(emb, cents, 0.99).collect()}
    assert len(out) == 6
    # group A: only the farthest-from-centroid member survives; the
    # symmetric-distance tie (0 vs 2) resolves to the smaller id
    assert out[0]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    assert out[0]["n_dups"] == 2 and out[1]["n_dups"] == 2
    # identical pair: smaller id stays
    assert out[100]["keep"] and not out[101]["keep"]
    # outlier is no one's duplicate
    assert out[50]["keep"] and out[50]["n_dups"] == 0

"""Deterministic sampling / mixture / chunking / vocabulary operators."""

from __future__ import annotations

import pytest

from sparkstract.operators.sampling import (
    chunk_documents,
    stratified_sample,
    vocab_topk,
    weighted_mixture,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} common word number {i}",
             "en" if i % 2 == 0 else "de") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_is_deterministic_and_rate_shaped(corpus):
    kept = stratified_sample(corpus, {"en": 0.5}, default_rate=1.0,
                             strata_col="lang")
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())
    assert a == b  # pure function of (salt, doc_id) — no rand()
    en = kept.filter("lang = 'en'").count()
    de = kept.filter("lang = 'de'").count()
    assert de == 200  # default rate 1.0 keeps every de doc
    assert 60 <= en <= 140  # ~100 expected of 200 at rate 0.5


def test_stratified_sample_rate_edges(corpus):
    assert stratified_sample(corpus, {}, default_rate=0.0).count() == 0
    assert stratified_sample(corpus, {}, default_rate=1.0).count() == 400


def test_weighted_mixture_integer_weights_are_exact(corpus):
    out = weighted_mixture(corpus, {"en": 2.0, "de": 0.0}, strata_col="lang")
    per = {r["doc_id"]: r["n"] for r in
           out.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert len(per) == 200 and set(per.values()) == {2}
    copies = sorted(r["copy"] for r in out.filter("doc_id = 0").collect())
    assert copies == [1, 2]


def test_weighted_mixture_fractional_weight_flips_a_coin(corpus):
    out = weighted_mixture(corpus, {"en": 1.5}, default_weight=1.0,
                           strata_col="lang")
    en = out.filter("lang = 'en'").count()
    assert out.filter("lang = 'de'").count() == 200
    assert 240 <= en <= 360  # ~300 expected: 200 base + ~100 extra
    # deterministic: identical second run
    assert out.filter("lang = 'en'").count() == en


def test_chunk_documents_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  # 10 tokens
         (2, "a b"),                               # shorter than window
         (3, "   ")],                              # empty → no chunks
        "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_id"]): r for r in
            chunk_documents(docs, window=4, stride=3).collect()}
    assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (2, 0)]
    assert rows[(1, 0)]["chunk_text"] == "t1 t2 t3 t4"
    assert rows[(1, 1)]["chunk_text"] == "t4 t5 t6 t7"  # overlap of 1
    assert rows[(1, 2)]["chunk_text"] == "t7 t8 t9 t10"  # tail covered
    assert rows[(1, 2)]["n_tokens"] == 4
    assert rows[(2, 0)]["chunk_text"] == "a b"
    assert rows[(2, 0)]["n_tokens"] == 2


def test_stratified_sample_is_monotone_in_rate(corpus):
    """keep = u32 < rate*2^32, so a higher rate keeps a superset — lets a
    pipeline tighten its sampling without resampling from scratch."""
    lo = {r["doc_id"] for r in
          stratified_sample(corpus, {}, default_rate=0.3).collect()}
    hi = {r["doc_id"] for r in
          stratified_sample(corpus, {}, default_rate=0.6).collect()}
    assert lo < hi


def test_chunk_documents_covers_every_token(spark):
    """Property over 120 random-length docs: token at 1-based position p
    belongs to chunk i iff i*stride < p <= i*stride + window, and every
    token lands in at least one chunk (the tail rule guarantees it)."""
    import random

    rng = random.Random(9)
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(rng.randint(0, 40))))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    window, stride = 7, 5
    got = chunk_documents(docs, window=window, stride=stride).collect()
    seen: dict[int, set[str]] = {}
    for r in got:
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(toks) == r["n_tokens"] <= window
        start = r["chunk_id"] * stride
        expect = rows[r["doc_id"]][1].split()[start:start + window]
        assert toks == expect
        seen.setdefault(r["doc_id"], set()).update(toks)
    for i, text in rows:
        want = set(text.split())
        assert seen.get(i, set()) == want  # full coverage, nothing dropped


def test_vocab_topk_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "The the apple"), (2, "the Banana banana apple zz")],
        "doc_id long, text string")
    got = [(r["token"], r["n_occurrences"], r["n_docs"])
           for r in vocab_topk(docs, k=3).collect()]
    # 'the' x3; 'apple' and 'banana' x2 tie → token asc breaks it
    assert got == [("the", 3, 2), ("apple", 2, 2), ("banana", 2, 1)]


def test_vocab_topk_approx_df_close_to_exact(corpus):
    exact = {r["token"]: r["n_docs"]
             for r in vocab_topk(corpus, k=10).collect()}
    approx = {r["token"]: r["n_docs"]
              for r in vocab_topk(corpus, k=10, approx_df=True).collect()}
    assert set(approx) == set(exact)  # same top-k (order keys are exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.1 * n)  # HLL++ ~2% rsd

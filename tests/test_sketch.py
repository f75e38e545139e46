"""Count-min sketch and Bloom-filter decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstract.operators.decontam import decontaminate
from sparkstract.operators.sketch import (
    bloom_bits,
    cms_lookup,
    cms_table,
    decontaminate_bloom,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, " ".join(f"w{j % 11}" for j in range(i, i + 20)))
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_never_underestimates_and_is_exact_when_wide(spark, corpus):
    exact = {r["token"]: r["n"] for r in
             corpus.select(F.explode(F.split(F.lower("text"), "\\s+"))
                           .alias("token"))
             .groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = spark.createDataFrame([(t,) for t in exact], "token string")
    # tight sketch: one-sided error only
    tight = {r["token"]: r["est"] for r in
             cms_lookup(cms_table(corpus, depth=4, width=4), keys,
                        depth=4, width=4).collect()}
    assert all(tight[t] >= c for t, c in exact.items())
    assert any(tight[t] > c for t, c in exact.items())  # collisions happen
    # wide sketch: 11 tokens in 2^14 buckets x4 rows -> exact w.h.p.
    wide = {r["token"]: r["est"] for r in
            cms_lookup(cms_table(corpus, depth=4, width=1 << 14), keys,
                       depth=4, width=1 << 14).collect()}
    assert wide == exact
    # unseen key estimates 0 (all four buckets empty at this width)
    ghost = spark.createDataFrame([("never-seen-token",)], "token string")
    est = cms_lookup(cms_table(corpus, depth=4, width=1 << 14), ghost,
                     depth=4, width=1 << 14).collect()
    assert est[0]["est"] == 0


def test_cms_sketch_size_is_bounded(corpus):
    assert cms_table(corpus, depth=3, width=8).count() <= 3 * 8


def test_bloom_bits_bounded_and_deterministic(spark):
    grams = spark.createDataFrame(
        [(f"g {i} x",) for i in range(50)], "ngram string")
    a = sorted(r["bit"] for r in bloom_bits(grams, 256, 3).collect())
    b = sorted(r["bit"] for r in bloom_bits(grams, 256, 3).collect())
    assert a == b and len(a) <= min(256, 150)
    assert all(0 <= x < 256 for x in a)


def test_bloom_decontamination_supersets_exact(spark, corpus):
    bench = corpus.filter(F.col("doc_id") % 9 == 0)
    train = corpus.filter(F.col("doc_id") % 9 != 0)
    exact = {r["doc_id"]: r for r in
             decontaminate(train, bench, n=3).collect()}
    # big filter: false positives negligible -> matches exact
    big = {r["doc_id"]: r for r in
           decontaminate_bloom(train, bench, n=3, m_bits=1 << 20,
                               n_hashes=3).collect()}
    assert set(big) == set(exact)
    for d, r in big.items():
        assert r["n_grams"] == exact[d]["n_grams"]
        assert r["n_hits"] == exact[d]["n_overlap"]
        assert r["contaminated"] == exact[d]["contaminated"]
    # tiny filter: one-sided — hits only ever grow
    small = {r["doc_id"]: r for r in
             decontaminate_bloom(train, bench, n=3, m_bits=64,
                                 n_hashes=2).collect()}
    assert all(small[d]["n_hits"] >= exact[d]["n_overlap"] for d in exact)
    assert all(small[d]["contaminated"] or not exact[d]["contaminated"]
               for d in exact)

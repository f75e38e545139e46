"""Distributed BPE tokenizer training (operators/bpe.py).

Ground truth for the classic Sennrich corpus is hand-derivable: with word
freqs {low:5, lower:2, newest:6, widest:3} the first merges are
(e,s) 9 -> (es,t) 9 -> (est,</>)... we keep it simpler: check against a
reference implementation inlined here (pure-Python BPE over a word-count
dict), so any corpus is checkable."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstract.operators.bpe import (SEP, bpe_token_counts, bpe_train,
                                       segment_expr)


def _ref_bpe(word_freqs: dict[str, int], merges: int):
    """Reference BPE (Sennrich alg. 1): tuple-of-symbols vocab, argmax
    pair by (count desc, lhs asc, rhs asc), leftmost non-overlap merge."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    model = []
    for step in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(counts.items(),
                              key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        model.append((step, lhs, rhs, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return model, vocab


def _docs(spark, word_freqs):
    text = " ".join(w for w, f in sorted(word_freqs.items())
                    for _ in range(f))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_matches_reference_implementation(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ref_model, ref_vocab = _ref_bpe(wf, merges=5)
    got = bpe_train(_docs(spark, wf), merges=5)
    assert got == ref_model
    # segmentation of every training word matches the reference vocab
    segs = {tuple(w): None for w in wf}
    df = spark.createDataFrame([(w,) for w in wf], "w string")
    for r in df.select("w", segment_expr(F.col("w"), got).alias("s")).collect():
        segs[tuple(r["w"])] = tuple(r["s"].split(SEP))
    ref_segs = {syms_orig: None for syms_orig in segs}
    for syms, _ in ref_vocab.items():
        ref_segs[tuple("".join(syms))] = syms
    for w in wf:
        assert segs[tuple(w)] == ref_segs[tuple(w)], w


def test_bpe_leftmost_nonoverlapping_merge(spark):
    # 'aaaa' under merge (a,a) must become (aa, aa), never (a, aa, a)
    docs = spark.createDataFrame([(1, "aaaa aaaa ab")],
                                 "doc_id long, text string")
    model = bpe_train(docs, merges=1)
    assert model == [(1, "a", "a", 6)]  # 3 per 'aaaa' x2 + 0 from 'ab'
    seg = (spark.range(1).select(F.lit("aaaaa").alias("w"))
           .select(segment_expr(F.col("w"), model).alias("s"))
           .collect()[0]["s"])
    assert seg == "aa" + SEP + "aa" + SEP + "a"


def test_bpe_no_cross_symbol_false_merge(spark):
    # learned merge (a,b) must not fire inside the longer symbol 'xa'
    model = [(1, "x", "a", 0), (2, "a", "b", 0)]
    seg = (spark.range(1).select(F.lit("xab").alias("w"))
           .select(segment_expr(F.col("w"), model).alias("s"))
           .collect()[0]["s"])
    # after (x,a): xa¦b; (a,b) must NOT match across 'xa'|'b'
    assert seg == "xa" + SEP + "b"


def test_bpe_token_counts_monotone_and_generalizes(spark):
    docs = spark.createDataFrame(
        [(1, "lower lower newest"), (2, "widest low"), (3, "  "),
         (4, "unseenword")],
        "doc_id long, text string")
    m0 = bpe_token_counts(docs, [])
    m4 = bpe_token_counts(docs, bpe_train(docs, merges=4))
    c0 = {r["doc_id"]: r["n_tokens"] for r in m0.collect()}
    c4 = {r["doc_id"]: r["n_tokens"] for r in m4.collect()}
    # zero merges = character count; merges only ever reduce token count
    assert c0 == {1: 16, 2: 9, 3: 0, 4: 10}
    assert all(c4[d] <= c0[d] for d in c0)
    assert c4[3] == 0
    # the trained chain applies to words outside the training argmaxes too
    assert 0 < c4[4] <= 10


def test_bpe_fertility_per_stratum(spark):
    from sparkstract.operators.bpe import bpe_fertility

    docs = spark.createDataFrame(
        [(1, "ab ab ab", "s1"), (2, "ab cd", "s1"), (3, "", "s2")],
        "doc_id long, text string, source string")
    model = bpe_train(docs, merges=1)  # learns (a, b)
    out = {r["stratum"]: r for r in
           bpe_fertility(docs, model, strata_col="source").collect()}
    # s1: 5 words -> ab x4 = 1 token each, cd = 2 tokens -> 6 tokens
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_words"] == 5
    assert out["s1"]["n_tokens"] == 6
    assert out["s1"]["tokens_per_word"] == 1.2
    # chars: len("ab ab ab") + len("ab cd") = 8 + 5 = 13 over 6 tokens
    assert out["s1"]["chars_per_token"] == round(13 / 6, 6)
    # empty stratum: zero everything, ratios 0.0 (no div-by-zero)
    assert out["s2"]["n_tokens"] == 0 and out["s2"]["tokens_per_word"] == 0.0


def test_bpe_early_stop_when_fully_merged(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    model = bpe_train(docs, merges=10)
    assert model == [(1, "a", "b", 2)]  # one pair exists, then vocab is atomic


@settings(max_examples=5, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=6),
    st.integers(1, 5), min_size=1, max_size=6))
def test_bpe_property_matches_reference(spark, word_freqs):
    """Degenerate two-letter alphabet: maximal overlap pressure on the
    leftmost-non-overlap merge and on count tie-breaks — the two paths
    where a distributed formulation could silently diverge."""
    ref_model, ref_vocab = _ref_bpe(word_freqs, merges=3)
    got = bpe_train(_docs(spark, word_freqs), merges=3)
    assert got == ref_model
    df = spark.createDataFrame([(w,) for w in word_freqs], "w string")
    segs = {r["w"]: tuple(r["s"].split(SEP)) for r in
            df.select("w", segment_expr(F.col("w"), got).alias("s"))
            .collect()}
    ref_segs = {"".join(syms): syms for syms in ref_vocab}
    for w in word_freqs:
        assert segs[w] == ref_segs[w], (w, segs[w], ref_segs[w])

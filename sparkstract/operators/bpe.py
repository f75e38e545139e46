"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
train-a-tokenizer-on-the-corpus step of a training-data pipeline, built
the same way GPT-2's BPE was: over the WORD-FREQUENCY table, never the
raw corpus.

Scale shape: one corpus scan collapses to (word, freq) with map-side
combine (output bounded by the distinct-word vocabulary, and hard-capped
to the `top_words` heavy hitters — the standard practice; Sennrich's
reference implementation also trains on a word-count dictionary). Every
merge round then runs over the MATERIALIZED segmented-vocab frame,
applying only the newest rule (O(R·V) total work — see bpe_train for the
incremental carry and the measured curve): one small shuffle for the pair
counts and a 1-row argmax. The MODEL (the merge table, R rows) is the
only thing that reaches the driver — the kmeans_fit pattern
(similarity.py): model driver-sized, data never moves.

Determinism / oracle parity: pair counts are exact integers; the argmax
tie-breaks (count DESC, lhs ASC, rhs ASC); applying a merge is a plain
string `replace` on a delimiter-expanded form (see `_apply_merge`) whose
leftmost-non-overlapping semantics are identical in Spark and DuckDB, so
a DuckDB twin unrolled per round is bit-identical.

Reference seam: the reference engine consumes tokenizations but does not
train them (its unicharset is produced offline by tesstrain); this is the
corpus-scale analog of that offline step, per SURVEY §2.8's model-seam
note."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

# Symbol separator inside a word's working representation. U+00A6 never
# appears in whitespace-split tokens of the fixture corpora; words that do
# contain it are excluded from training (guard below) rather than silently
# mis-segmented.
SEP = "¦"


def _char_split(word: Column) -> Column:
    """'abc' -> 'a¦b¦c' (initial character-level segmentation)."""
    return F.btrim(F.regexp_replace(word, "(.)", "$1" + SEP), F.lit(SEP))


def _apply_merge(s: Column, lhs: str, rhs: str) -> Column:
    """Merge every adjacent (lhs, rhs) pair in delimited form `s`,
    leftmost-first non-overlapping — exactly BPE's merge semantics.

    Trick: expand each boundary to a DOUBLE separator and wrap the ends
    ('a¦b¦c' -> '¦a¦¦b¦¦c¦') so every symbol owns a private delimiter on
    each side; then a plain string replace of '¦lhs¦¦rhs¦' -> '¦lhsrhs¦'
    cannot match inside a longer symbol, and consecutive overlapping
    candidates resolve leftmost-first ('a a a a' -> 'aa aa') because the
    replacement re-forms the boundary the next scan needs. Both engines'
    `replace` scans leftmost and resumes after the replacement, so the
    oracle matches byte for byte."""
    exp = F.concat(F.lit(SEP), F.replace(s, F.lit(SEP), F.lit(SEP + SEP)),
                   F.lit(SEP))
    pat = F.lit(SEP + lhs + SEP + SEP + rhs + SEP)
    rep = F.lit(SEP + lhs + rhs + SEP)
    return F.replace(F.btrim(F.replace(exp, pat, rep), F.lit(SEP)),
                     F.lit(SEP + SEP), F.lit(SEP))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): corpus-frequency-weighted adjacent-symbol pair
    counts over the vocab frame's current segmentation `s`."""
    syms = F.split(F.col("s"), SEP)
    idx = F.sequence(F.lit(1), F.size(syms) - 1)
    pairs = F.when(F.size(syms) >= 2,
                   F.transform(idx, lambda i: F.struct(
                       F.get(syms, i - 1).alias("lhs"),
                       F.get(syms, i).alias("rhs")))
                   ).otherwise(F.array().cast(
                       "array<struct<lhs:string,rhs:string>>"))
    return (vocab.select(F.explode(pairs).alias("p"), "f")
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("f").alias("cnt")))


def word_freqs(docs: DataFrame, top_words: int = 4096,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(w, f): the capped word-frequency table BPE trains on. The groupBy
    collapses corpus-sized input to vocab-sized output map-side; the cap
    keeps the heavy hitters (freq DESC, word ASC — deterministic), which
    carry almost all the pair mass at web scale."""
    wf = (docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
          .filter(~F.col("w").contains(SEP))
          .groupBy("w").agg(F.count(F.lit(1)).alias("f")))
    return (wf.orderBy(F.desc("f"), F.asc("w")).limit(top_words))


def bpe_train(docs: DataFrame, merges: int = 6, top_words: int = 4096,
              id_col: str = "doc_id", text_col: str = "text",
              cache: bool = True) -> list[tuple[int, str, str, int]]:
    """Learn `merges` BPE merge rules from the corpus; returns the model
    as [(step, lhs, rhs, pair_count)] (1-based steps, application order).

    INCREMENTAL round shape (Sennrich's reference loop, distributed): the
    segmented vocab is carried across rounds as a materialized frame, and
    each round applies only the NEWEST merge rule — one `replace`
    expression, not a re-derivation of the whole R-rule chain — so total
    expression work is O(R·V), not the O(R²·V) the naive per-round rebuild
    pays (measured: 48 rounds at sf0.01 dropped ~22s -> ~8s; curve in
    PLANS.md). The carry uses a LAZY localCheckpoint (the cluster.py
    fusion trick): the next round's pair-count job materializes the
    checkpointed segmentation as a side effect — one job per round, and
    the plan is truncated so Catalyst analysis stays constant-size no
    matter how many rounds have run.

    Per round: one scan of the vocab-sized frame for pair counts (small
    shuffle keyed on the pair space) and a 1-row argmax collect — the
    MODEL is the only thing that reaches the driver. Stops early if no
    pair remains (fully merged vocab).

    At production merge counts (32k), prefer collecting the capped
    (word, freq) table and running the in-memory Sennrich loop driver-side
    — `word_freqs` is already bounded to driver-sized `top_words`, so the
    collect is safe and exact; this distributed loop is for when the vocab
    cap is raised beyond driver memory (then R round-trip latencies, not
    data volume, dominate the cost)."""
    assert merges >= 1 and top_words >= 1
    base = word_freqs(docs, top_words, id_col, text_col)
    seg = base.select(_char_split(F.col("w")).alias("s"), "f")
    if cache:
        seg = seg.localCheckpoint(eager=False)
    model: list[tuple[int, str, str, int]] = []
    for step in range(1, merges + 1):
        best = (_pair_counts(seg)
                .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
                .limit(1).collect())
        if not best:
            break
        r = best[0]
        model.append((step, r["lhs"], r["rhs"], int(r["cnt"])))
        if step < merges:
            seg = seg.select(
                _apply_merge(F.col("s"), r["lhs"], r["rhs"]).alias("s"), "f")
            if cache:
                seg = seg.localCheckpoint(eager=False)
    return model


def segment_expr(word: Column,
                 model: list[tuple[int, str, str, int]]) -> Column:
    """Delimited BPE segmentation of `word` under a trained model — the
    full merge chain as ONE whole-stage-codegen string expression, so
    applying the tokenizer to unseen words costs zero joins and zero
    Python. ('lowest' under [(l,o),(lo,w)] -> 'low¦e¦s¦t')."""
    s = _char_split(word)
    for _, lhs, rhs, _ in model:
        s = _apply_merge(s, lhs, rhs)
    return s


def bpe_token_counts(docs: DataFrame, model: list[tuple[int, str, str, int]],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens): per-document token count under the trained
    tokenizer. Segments each DISTINCT word once (vocab-sized frame), then
    joins the per-word length back to the exploded corpus — AQE broadcasts
    the vocab side; the per-doc sum is the only corpus shuffle. Empty docs
    count 0."""
    words = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w")))
    lens = (words.select("w").distinct()
            .select("w", F.size(F.split(segment_expr(F.col("w"), model),
                                        SEP)).alias("n_tok")))
    per_doc = (words.join(lens, "w")
               .groupBy("doc_id").agg(F.sum("n_tok").alias("n_tokens")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
                     .alias("n_tokens")))


def bpe_fertility(docs: DataFrame, model: list[tuple[int, str, str, int]],
                  strata_col: str = "source", id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-stratum tokenizer data card: (stratum, n_docs, n_words,
    n_tokens, tokens_per_word, chars_per_token) under the trained BPE
    model. Fertility (tokens/word) and compression (chars/token) are THE
    two numbers a tokenizer report quotes per language/source — a stratum
    whose fertility is an outlier is under-served by the merge table.

    Plan: rides bpe_token_counts' single corpus scan, joined back to the
    (doc, stratum, chars) projection; the final aggregation's key space is
    the stratum set. Ratios divide two exact integer sums, rounded 6dp —
    deterministic under any partitioning."""
    from ..functions.textstats import token_count

    per_doc = bpe_token_counts(docs, model, id_col=id_col,
                               text_col=text_col)
    meta = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(strata_col).alias("stratum"),
                       F.length(text_col).cast("long").alias("n_chars"),
                       token_count(F.col(text_col)).cast("long")
                        .alias("n_words"))
    return (meta.join(per_doc, "doc_id")
            .groupBy("stratum")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("n_words"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("n_chars").alias("n_chars"))
            .select("stratum", "n_docs", "n_words", "n_tokens",
                    F.when(F.col("n_words") == 0, F.lit(0.0))
                     .otherwise(F.round(F.col("n_tokens") / F.col("n_words"),
                                        6)).alias("tokens_per_word"),
                    F.when(F.col("n_tokens") == 0, F.lit(0.0))
                     .otherwise(F.round(F.col("n_chars") / F.col("n_tokens"),
                                        6)).alias("chars_per_token")))

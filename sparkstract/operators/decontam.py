"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene pass (GPT-3 appendix C used 13-gram
overlap; Llama/GPT-4 report 8-10-gram variants): any eval n-gram appearing
verbatim in a training document marks it contaminated, so eval scores
aren't inflated by memorized test items. Production n is 8-13; the driver
contract query runs n=3 because the synthetic corpus is short word-soup
where 8-gram collisions never occur (a 0-row query would be vacuous
evidence).

Scale shape (100 TB corpus vs a benchmark of 10^3-10^5 docs):
  * the benchmark n-gram set is SMALL by definition (eval suites are
    human-curated) — it is broadcast explicitly, so the corpus-side gram
    frame never shuffles for the membership probe. This is the one join in
    the repo where a hand-forced broadcast beats leaving it to AQE: the
    small side's size is guaranteed by the problem, not by luck.
  * ONE corpus scan: the left-probe carries a hit marker, so per-doc gram
    counts and overlap counts come out of the SAME groupBy (no second
    shingle pipeline, no second aggregation over the corpus).
  * the only shuffle is the per-doc aggregation on doc_id — uniform key,
    map-side partial agg.
  * a hot (stop-phrase) n-gram costs nothing extra: the probe is a hash
    lookup per gram row, output rows stay bounded by the corpus gram count.

No reference analog (the reference is an OCR engine); this belongs to the
LLM-data-pipeline family alongside operators/dedup.py and curate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_ngrams


def decontaminate(train: DataFrame, benchmark: DataFrame, n: int = 8,
                  min_overlap: int = 1, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """One row per training document: (doc_id, n_grams, n_overlap,
    overlap_frac, contaminated).

    `n_grams` counts the doc's distinct word n-grams, `n_overlap` how many
    of those appear anywhere in `benchmark`, `contaminated` is
    n_overlap >= min_overlap. Docs shorter than n words have n_grams = 0
    and are never contaminated. Raising `min_overlap` above 1 tolerates
    incidental single-phrase collisions (common with small n)."""
    bench_grams = (
        word_ngrams(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("ngram").distinct()
        .withColumn("__hit", F.lit(1))
    )
    train_grams = word_ngrams(train, n=n, id_col=id_col, text_col=text_col)
    # bench ngrams are distinct, so the left probe never fans rows out:
    # per-doc totals and overlap counts share one aggregation
    per_doc = (
        train_grams.join(F.broadcast(bench_grams), "ngram", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.count("__hit").alias("n_overlap"))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
             .otherwise(F.round(F.col("n_overlap") / F.col("n_grams"), 6))
             .alias("overlap_frac"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
             .alias("contaminated"),
        )
    )


def contamination_report(train: DataFrame, benchmark: DataFrame, n: int = 8,
                         max_dirty_frac: float = 0.5,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """The reverse view of `decontaminate` — per BENCHMARK item, how dirty
    is it: (doc_id, n_grams, n_dirty, dirty_frac, clean), where n_dirty
    counts the item's distinct n-grams that appear anywhere in the
    training corpus (GPT-3 appendix C reports eval results on exactly this
    clean/dirty split; `clean` is dirty_frac <= max_dirty_frac).

    Scale shape: the corpus gram set is corpus-sized, so the probe runs
    the OTHER way from decontaminate's — the benchmark gram set broadcasts
    to the corpus scan, the semi-join's distinct output is bounded by the
    BENCHMARK gram count (a gram seen a billion times in the corpus
    surfaces once), and that small dirty-gram set broadcasts back for the
    per-item aggregation. One corpus scan, no corpus shuffle."""
    bench_grams = word_ngrams(benchmark, n=n, id_col=id_col,
                              text_col=text_col)
    bench_set = bench_grams.select("ngram").distinct()
    dirty = (word_ngrams(train, n=n, id_col=id_col, text_col=text_col)
             .join(F.broadcast(bench_set), "ngram", "left_semi")
             .select("ngram").distinct()
             .withColumn("__hit", F.lit(1)))
    per_item = (bench_grams.join(F.broadcast(dirty), "ngram", "left")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_grams"),
                     F.count("__hit").alias("n_dirty")))
    return (
        benchmark.select(F.col(id_col).alias("doc_id"))
        .join(per_item, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dirty", F.lit(0)).alias("n_dirty"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
             .otherwise(F.round(F.col("n_dirty") / F.col("n_grams"), 6))
             .alias("dirty_frac"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(True))
             .otherwise(F.round(F.col("n_dirty") / F.col("n_grams"), 6)
                        <= max_dirty_frac)
             .alias("clean"),
        )
    )

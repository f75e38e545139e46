"""Corpus data-card rollup (operators/report.py)."""
from sparkstract.operators.report import corpus_report


def test_corpus_report_rollup_and_dups(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "web", "alpha beta"),
            (2, "en", "web", "alpha  beta"),    # exact dup after collapse
            (3, "en", "book", "gamma delta epsilon"),
            (4, "de", "web", "zeta"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = corpus_report(docs).collect()
    rows = {(r["lang"], r["source"]): r for r in out}
    # leaf strata
    assert rows[("en", "web")]["n_docs"] == 2
    assert rows[("en", "web")]["n_dup_docs"] == 1
    assert rows[("en", "web")]["total_tokens"] == 4
    assert rows[("en", "book")]["n_dup_docs"] == 0
    # lang subtotal and grand total from the rollup
    assert rows[("en", None)]["n_docs"] == 3
    assert rows[(None, None)]["n_docs"] == 4
    assert rows[(None, None)]["total_tokens"] == 8
    assert abs(rows[(None, None)]["avg_tokens"] - 2.0) < 1e-9


def test_snapshot_diff_statuses(spark):
    from sparkstract.operators.report import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same  TEXT"), (2, "did change"), (4, "brand new")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    # doc 1 is fingerprint-identical (case + whitespace fold): filtered out
    assert out == {2: "changed", 3: "removed", 4: "added"}

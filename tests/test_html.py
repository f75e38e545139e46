"""functions/html.py — the context-sensitive jusText-family main-content
extraction: hand-computed expected outputs per rule (the oracle twin is
independently-written SQL; this pins both against the intended
classification, not just against each other)."""

from __future__ import annotations

import pytest

from sparkstract.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[2]", app="test-html")
    s.sparkContext.setLogLevel("ERROR")
    yield s


GOOD = "The quick brown fox jumps over the lazy dog daily."
GOOD2 = "A second paragraph of body prose continues here now."
BADLONG = "colorless green ideas sleep furiously beside seven quiet mountains"


def _run(spark, docs):
    from sparkstract.functions.html import justext_main_content

    df = spark.createDataFrame(docs, "doc_id string, html string")
    out = justext_main_content(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r["main_text"] for r in out}


def test_context_rules_expected_values(spark):
    got = _run(spark, [
        ("c1", f"<p>{GOOD}</p><div>Figure 2</div><p>{GOOD2}</p>"),
        ("c2", "<div><a href='/1'>Home page link menu</a></div>"
               "<div>Subscribe now</div>"
               "<div><a href='/2'>Site map index pages</a></div>"),
        ("c3", f"<p>{GOOD}</p><p>The fox is quick</p>"
               f"<div>{BADLONG}</div>"),
        ("c4", f"<div>{BADLONG}</div><p>The fox is quick</p>"
               f"<div>{BADLONG}</div>"),
        ("c5", f"<div>Figure 2</div><p>{GOOD}</p>"),
        ("c6", f"<p>The fox is quick</p><p>{GOOD}</p>"),
        ("c7", f"<nav><a href='/'>Home</a></nav><p>{GOOD}</p>"
               f"<div>Caption A</div><p>{GOOD2}</p>"),
    ])
    assert got["c1"] == f"{GOOD}\nFigure 2\n{GOOD2}"   # short between goods
    assert got["c2"] == ""                              # chrome collapses
    assert got["c3"] == f"{GOOD}\nThe fox is quick"     # near: one good side
    assert got["c4"] == ""                              # near between bads
    assert got["c5"] == GOOD                            # edge short dropped
    assert got["c6"] == f"The fox is quick\n{GOOD}"     # edge near kept
    assert got["c7"] == f"{GOOD}\nCaption A\n{GOOD2}"   # nav pre-dropped


def test_no_content_and_null_html(spark):
    got = _run(spark, [("e1", "<nav><a href='/'>x</a></nav>"),
                       ("e2", None)])
    assert got == {"e1": "", "e2": ""}


def test_plan_single_doc_exchange(spark):
    """The two window sorts must share ONE exchange on the doc id (the
    line_dedup plan shape) — no second shuffle between the windows."""
    from sparkstract.functions.html import justext_main_content

    df = spark.createDataFrame([("d", "<p>x</p>")],
                               "doc_id string, html string")
    plan = justext_main_content(df)._jdf.queryExecution().executedPlan().toString()
    # exchanges: one hashpartitioning(doc_id) for windows+group, plus
    # whatever the tiny left join adds — but never TWO window exchanges
    assert plan.count("hashpartitioning(doc_id") <= 3

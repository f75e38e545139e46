"""Kill-and-resume: exactly-once spans after an injected mid-job failure
(north rule: resume from last committed snapshot; FIXTURES.md test plan)."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkstract.plans.checkpoint import (
    InjectedFailure,
    committed_groups,
    lineage,
    read_result,
    run_job,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["doc_id", "order", "kind", "text", "media_ref"]]
        .fillna({"text": "", "media_ref": ""})
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )


def test_kill_and_resume_exactly_once(spark, fixture_set, tmp_path):
    docs, media, truth = fixture_set.to_spark(spark)
    out = str(tmp_path / "job")

    with pytest.raises(InjectedFailure):
        run_job(spark, docs, media, out, n_groups=4, fail_after_groups=2)

    partial = committed_groups(out)
    assert len(partial) == 2  # two groups committed before the kill

    # resume: only the remaining groups run; result is complete and exact
    result = run_job(spark, docs, media, out, n_groups=4)
    got = _norm(result.toPandas())
    want = _norm(truth.toPandas())
    pd.testing.assert_frame_equal(got, want)

    lin = lineage(spark, out).toPandas()
    assert sorted(lin["group"]) == [0, 1, 2, 3]
    assert int(lin["spans_out"].sum()) == len(want)  # no dupes, no gaps


def test_rerun_is_noop(spark, fixture_set, tmp_path):
    docs, media, truth = fixture_set.to_spark(spark)
    out = str(tmp_path / "job2")
    run_job(spark, docs, media, out, n_groups=2)
    before = committed_groups(out)
    run_job(spark, docs, media, out, n_groups=2)  # all committed → skip
    after = committed_groups(out)
    assert {g: r["committed_at"] for g, r in before.items()} == {
        g: r["committed_at"] for g, r in after.items()
    }
    got = _norm(read_result(spark, out).toPandas())
    want = _norm(truth.toPandas())
    pd.testing.assert_frame_equal(got, want)

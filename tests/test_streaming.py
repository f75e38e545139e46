"""Streaming extraction drains a file-source backlog to the same exact spans
as the batch plan (micro-batch == batch semantics per doc)."""

from __future__ import annotations

import pandas as pd


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["doc_id", "order", "kind", "text", "media_ref"]]
        .fillna({"text": "", "media_ref": ""})
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )


def test_stream_matches_truth(spark, fixture_set, tmp_path):
    from sparkstract.sources.docs import write_docs
    from sparkstract.streaming.stream import stream_extract

    docs, media, truth = fixture_set.to_spark(spark)
    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "spans_out")
    ckpt = str(tmp_path / "ckpt")
    write_docs(docs.repartition(3), docs_dir)

    stream_extract(spark, docs_dir, media, out_dir, ckpt,
                   max_files_per_trigger=1, available_now=True)

    got = _norm(spark.read.parquet(out_dir).toPandas())
    want = _norm(truth.toPandas())
    pd.testing.assert_frame_equal(got, want)

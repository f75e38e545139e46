"""functions/encoding.py — mojibake repair table + chain semantics."""

import numpy as np
import pytest

from sparkstract.functions.encoding import (
    MOJIBAKE_TABLE,
    _sloppy_cp1252,
    fix_mojibake,
    mojibake_sql_chunks,
)


def _corrupt(s: str) -> str:
    return _sloppy_cp1252(s.encode("utf-8"))


def _fix_py(s: str, passes: int = 1) -> str:
    for _ in range(passes):
        for moji, ch in MOJIBAKE_TABLE:
            s = s.replace(moji, ch)
    return s


def test_table_derivation_and_order():
    # every entry derives from the sloppy-cp1252 model, no transcription
    for moji, ch in MOJIBAKE_TABLE:
        assert moji == _sloppy_cp1252(ch.encode("utf-8"))
        assert len(moji) >= 2
    # longest-first application order
    lens = [len(m) for m, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)


def test_every_target_roundtrips_in_context():
    for _, ch in MOJIBAKE_TABLE:
        s = f"ab {ch} cd"
        assert _fix_py(_corrupt(s)) == s, ch


def test_single_and_double_encoding_repair():
    good = "café naïve — “quoted” … €5 ±3° żółć"
    assert _fix_py(_corrupt(good)) == good
    assert _fix_py(_corrupt(_corrupt(good)), passes=2) == good


def test_clean_text_untouched_and_idempotent():
    clean = "plain ascii text with (parens), 100% symbols & <tags>"
    assert _fix_py(clean) == clean
    good = "café — “q” …"
    assert _fix_py(good) == good  # already-clean non-ASCII untouched


def test_mixed_damage_in_running_text():
    rng = np.random.default_rng(41)
    words = ["alpha", "béta", "—dash", "“q”", "naïve", "plain", "€9"]
    for _ in range(50):
        s = " ".join(words[int(i)] for i in rng.integers(0, len(words), 12))
        assert _fix_py(_corrupt(s)) == s


def test_sql_chunks_cover_whole_table_and_stay_shallow():
    chunks = mojibake_sql_chunks("t", chunk=60)
    assert sum(c.count("replace(") for c in chunks) == len(MOJIBAKE_TABLE)
    assert all(c.count("replace(") <= 60 for c in chunks)


def test_spark_chain_matches_python(spark):
    from pyspark.sql import functions as F

    good = "café naïve — “quoted” … €5 żółć"
    rows = [("d1", _corrupt(good)), ("d2", "clean text"),
            ("d3", _corrupt(_corrupt(good)))]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.fixed for r in df.select(
        "doc_id", fix_mojibake(F.col("text"), passes=2).alias("fixed")
    ).collect()}
    assert got["d1"] == good
    assert got["d2"] == "clean text"
    assert got["d3"] == good

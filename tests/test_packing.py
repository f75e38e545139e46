"""Sequence packing invariants (operators/packing.py)."""
from pyspark.sql import functions as F

from sparkstract.operators.packing import pack_sequences


def _chunks(spark, n_docs=40, toks_per_chunk=10, chunks_per_doc=3):
    rows = [(d, c, toks_per_chunk)
            for d in range(n_docs) for c in range(chunks_per_doc)]
    return spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_tokens int")


def test_pack_sequences_is_contiguous_within_bucket(spark):
    out = pack_sequences(_chunks(spark), budget=25, n_buckets=4).collect()
    assert len(out) == 120
    # within a bucket, offsets (seq_id*budget + start_in_seq) are the exact
    # running sum: sorted, they start at 0 and step by n_tokens
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for rows in by_bucket.values():
        offs = sorted(r["seq_id"] * 25 + r["start_in_seq"] for r in rows)
        expect = 0
        for o in offs:
            assert o == expect
            expect += 10
    # every start_in_seq is inside the budget
    assert all(0 <= r["start_in_seq"] < 25 for r in out)


def test_pack_sequences_deterministic_and_salted(spark):
    ch = _chunks(spark, n_docs=10)
    a = sorted(map(tuple, pack_sequences(ch, budget=30).collect()))
    b = sorted(map(tuple, pack_sequences(ch, budget=30).collect()))
    assert a == b
    c = sorted(map(tuple,
                   pack_sequences(ch, budget=30, salt="other").collect()))
    assert a != c  # a different salt reshuffles the layout


def test_pack_sequences_random_sizes_exact_running_sums(spark):
    import random

    rng = random.Random(17)
    rows = [(d, c, rng.randint(1, 40))
            for d in range(30) for c in range(rng.randint(1, 4))]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_tokens int")
    out = pack_sequences(chunks, budget=64, n_buckets=4).collect()
    assert len(out) == len(rows)  # every chunk placed exactly once
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    placed = sorted((r["doc_id"], r["chunk_id"]) for r in out)
    assert placed == sorted((d, c) for d, c, _ in rows)
    for rows_b in by_bucket.values():
        offs = sorted((r["seq_id"] * 64 + r["start_in_seq"], r["n_tokens"])
                      for r in rows_b)
        expect = 0
        for off, n in offs:
            assert off == expect  # contiguous concatenation, no gaps
            expect += n

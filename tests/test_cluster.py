"""Connected-components dup clustering vs a brute-force union-find."""

from __future__ import annotations

import random

import pytest


def _uf_components(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_components(spark, pairs):
    from sparkstract.operators.cluster import connected_components

    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    return {r["node"]: r["cluster_id"]
            for r in connected_components(df).collect()}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 12, 6),     # sparse: mostly singletons + small chains
    (2, 30, 25),    # mixed component sizes
    (3, 40, 80),    # dense: few big components
    (4, 64, 63),    # long-path regime (CC needs the log-round contraction)
])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    nodes = [f"d{i:03d}" for i in range(n_nodes)]
    if seed == 4:
        pairs = [(nodes[i], nodes[i + 1]) for i in range(n_nodes - 1)]
    else:
        pairs = [tuple(rng.sample(nodes, 2)) for _ in range(n_edges)]
    expected = _uf_components(nodes, pairs)
    got = _spark_components(spark, pairs)
    touched = {n for p in pairs for n in p}
    assert got == {n: c for n, c in expected.items() if n in touched}


def test_cc_empty_and_self_pairs(spark):
    from sparkstract.operators.cluster import connected_components

    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "doc_a string, doc_b string")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(loops).collect()}
    assert got == {"a": "a", "b": "a"}


def test_dedup_assign_singletons_and_keep(spark):
    from sparkstract.operators.cluster import dedup_assign

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(6)], "doc_id string")
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5"), ("d0", "d4")],
        "doc_a string, doc_b string")
    rows = {r["doc_id"]: r for r in dedup_assign(docs, pairs).collect()}
    assert rows["d1"]["cluster_id"] == "d1"
    assert rows["d3"]["cluster_id"] == "d1"
    assert rows["d5"]["cluster_id"] == "d1"
    assert rows["d5"]["cluster_size"] == 3
    assert rows["d0"]["cluster_id"] == "d0" and rows["d4"]["cluster_id"] == "d0"
    assert rows["d2"]["cluster_id"] == "d2" and rows["d2"]["cluster_size"] == 1
    kept = {d for d, r in rows.items() if r["keep"]}
    assert kept == {"d0", "d1", "d2"}


def test_cluster_split_keeps_clusters_whole(spark):
    from sparkstract.operators.cluster import cluster_split

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(40)], "doc_id string")
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5"), ("d0", "d4")],
        "doc_a string, doc_b string")
    rows = {r["doc_id"]: r for r in
            cluster_split(docs, pairs, val_fraction=0.3).collect()}
    # a cluster never straddles the split boundary
    assert rows["d1"]["split"] == rows["d3"]["split"] == rows["d5"]["split"]
    assert rows["d0"]["split"] == rows["d4"]["split"]
    sides = {r["split"] for r in rows.values()}
    assert sides == {"train", "val"}  # 0.3 over 37 clusters hits both
    # deterministic md5 coin: identical re-run
    again = {r["doc_id"]: r["split"] for r in
             cluster_split(docs, pairs, val_fraction=0.3).collect()}
    assert again == {d: r["split"] for d, r in rows.items()}


def test_curate_corpus_reasons_and_winner(spark):
    from sparkstract.operators.curate import curate_corpus

    good = ("the fox and the dog is it to of in " * 6).strip()  # en, long, stopwordy
    docs = spark.createDataFrame(
        [
            ("d0", good),                      # kept (cluster winner)
            ("d1", good + " extra"),           # duplicate of d0 (passing)
            ("d2", "short text"),              # too_short
            ("d3", "der die und ist das " * 8),  # wrong_lang (de)
            ("d4", ("of # " * 12).strip()),    # low_quality: en-marked but
                                               # short + punct-heavy
            ("d5", good + " more"),            # kept: its cluster-min d6 FAILS
            ("d6", "tiny"),                    # too_short, cluster-min of {d5,d6}
        ],
        "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d5", "d6")], "doc_a string, doc_b string")
    rows = {r["doc_id"]: r for r in
            curate_corpus(docs, pairs, min_tokens=20, langs=("en",),
                          min_quality=0.1).collect()}
    assert rows["d0"]["reason"] == "kept" and rows["d0"]["kept"]
    assert rows["d1"]["reason"] == "duplicate" and not rows["d1"]["kept"]
    assert rows["d2"]["reason"] == "too_short"
    assert rows["d3"]["reason"] == "wrong_lang"
    assert rows["d4"]["reason"] == "low_quality"
    # the winner is the min among PASSING members, not the raw cluster min
    assert rows["d5"]["reason"] == "kept" and rows["d5"]["kept"]
    assert rows["d6"]["reason"] == "too_short" and not rows["d6"]["kept"]


def test_curate_optional_gates(spark):
    from sparkstract.operators.curate import curate_corpus

    good = ("the fox and the dog is it to of in " * 6).strip()
    docs = spark.createDataFrame(
        [
            ("d0", good),
            ("d1", ("xq zk jv qx wz of qj xz kq vj " * 4).strip()),
            ("d2", "\n".join(["the fox and the dog is it to of in"] * 8)),
        ],
        "doc_id string, text string")
    pairs = spark.createDataFrame([], "doc_a string, doc_b string")
    rows = {r["doc_id"]: r for r in curate_corpus(
        docs, pairs, min_tokens=20, langs=("en",), min_quality=0.05,
        min_coherence=0.25, max_dup_line_frac=0.5).collect()}
    assert rows["d0"]["reason"] == "kept"
    assert rows["d1"]["reason"] == "gibberish"
    assert rows["d2"]["reason"] == "repetitive"

"""Duplicate-cluster assignment: connected components over near-dup pairs.

The pair emitters (minhash_lsh_pairs / simhash_near_dup_pairs /
ngram_jaccard_pairs) produce an EDGE LIST; an actual dedup pass needs the
transitive closure — one cluster id per document, one kept canonical doc per
cluster (near-dup is not transitive, but dedup treats it as if it were:
that is the standard keep-one-per-component policy).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii, "Connected Components in MapReduce and Beyond",
SoCC 2014) — the standard O(log n)-round distributed CC. Each round is two
self-contained DataFrame jobs (a groupBy min + a join), no driver-side graph
state; `localCheckpoint` truncates the lineage each round so the plan does
not grow with iterations (on a real cluster use `spark.sparkContext
.setCheckpointDir` + `checkpoint()` for fault-tolerant truncation).

Node ids are compared with min()/least() under whatever total order the id
column's type carries (the driver tables use BIGINT doc_ids → numeric order;
string ids order lexicographically) — DuckDB's min() agrees in both cases,
so the oracle twin (a recursive-CTE transitive closure, tractable at test
scale) is bit-identical.

100 TB notes: every round shuffles the CURRENT edge set only — after the
first large-star the set contracts toward one edge per non-root node, so
round cost is dominated by the first pass over the near-dup pairs, which is
|pairs|, not |corpus|. No collect, no per-row Python; convergence is
detected with a 1-row checksum aggregate per round (count + two 64-bit hash
sums — a false stop needs a simultaneous 3-way collision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u > v, no self-loops."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _sym(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node x: attach every strictly-larger neighbour to
    m = min(N(x) ∪ {x}). Emitted edges are canonical by construction
    (y > x >= m)."""
    sym = _sym(edges)
    mins = (sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select(F.col("u").alias("x"), F.least("u", "mn").alias("m")))
    return (
        sym.join(mins, sym["u"] == mins["x"])
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node x over its smaller-or-equal neighbourhood N⁻(x):
    attach N⁻(x) ∪ {x} to m = min(N⁻(x)). Canonical edges only come in
    (u > v), so N⁻ is just the stored direction."""
    mins = (edges.groupBy("u").agg(F.min("v").alias("m")))
    return (
        edges.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _truncate(df: DataFrame) -> DataFrame:
    """Cut the iteration's lineage. Reliable checkpoint when the job has a
    checkpoint dir configured (survives executor loss on a real cluster);
    executor-local checkpoint otherwise (tests, local mode).

    The local path is LAZY (eager=False) on purpose: every _truncate here is
    immediately followed by `_checksum`, whose aggregate is the action that
    materializes the checkpoint — the round's edges are computed in ONE job
    (materialize + checksum fused) instead of two full-edge-set passes per
    round. The reliable path stays eager: a lazy `checkpoint()` recomputes
    the plan for the checkpoint write on top of the first action."""
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=False)


def _checksum(edges: DataFrame) -> tuple:
    # decimal(38,0) sums: xxhash64 values fill the long range, so a plain
    # long sum overflows under ANSI mode after two rows
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("h1"),
        F.coalesce(F.sum(F.xxhash64("v", "u").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("h2"),
    ).collect()[0]
    return (row["n"], row["h1"], row["h2"])


def connected_components(pairs: DataFrame, a: str = "doc_a",
                         b: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`; cluster_id is
    the lexicographic min of the component. Alternating large/small-star,
    converged when the canonical edge set's checksum is stable."""
    edges = _canon(pairs.select(F.col(a).alias("u"), F.col(b).alias("v")))
    edges = _truncate(edges)
    prev = _checksum(edges)
    for _ in range(max_iter):
        edges = _truncate(_small_star(_large_star(edges)))
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover - max_iter is far beyond the O(log n) bound
        raise RuntimeError(f"CC did not converge in {max_iter} rounds")
    # converged: every edge is (node, component-min); roots map to themselves
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
        .union(edges.select(F.col("v").alias("node"),
                            F.col("v").alias("cluster_id")))
        .groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))
    )


def cluster_split(docs: DataFrame, pairs: DataFrame,
                  val_fraction: float = 0.1, salt: str = "split",
                  id_col: str = "doc_id", a: str = "doc_a",
                  b: str = "doc_b") -> DataFrame:
    """Contamination-safe train/validation split: (doc_id, cluster_id,
    cluster_size, split). The coin is flipped on the CLUSTER id, not the
    doc id, so every member of a near-dup cluster lands on the same side —
    a plain per-doc split leaks near-duplicates of validation docs into
    training (the eval-inflation failure benchmark decontamination guards
    against, here prevented structurally). The coin is the deterministic
    md5 construction from operators/sampling.py: reproducible under task
    retry and bit-identical in the DuckDB oracle. Singleton docs are their
    own cluster, so the realized val fraction tracks `val_fraction` over
    clusters, weighted by cluster size."""
    from .sampling import _salted_key, _u32, rate_threshold

    assigned = dedup_assign(docs, pairs, id_col=id_col, a=a, b=b)
    coin = _u32(_salted_key(salt, "cluster_id"))
    return assigned.select(
        id_col, "cluster_id", "cluster_size",
        F.when(coin < rate_threshold(val_fraction), F.lit("val"))
         .otherwise(F.lit("train")).alias("split"),
    )


def dedup_assign(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                 a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Cluster assignment for EVERY document: (doc_id, cluster_id,
    cluster_size, keep). Docs in no pair are their own singleton cluster;
    the kept canonical doc is the cluster min (deterministic). The join
    strategy is left to AQE deliberately: the component map is bounded by
    the near-dup pair graph, which is usually tiny — but on a heavily
    duplicated corpus it is CORPUS-scale, and a hand-forced broadcast
    would OOM the driver at 10^12 docs. AQE broadcasts when it measures
    small and degrades to a co-partitioned shuffle join when it doesn't."""
    comp = connected_components(pairs, a=a, b=b)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    comp = comp.join(sizes, "cluster_id").select(
        F.col("node").alias(id_col), "cluster_id", "cluster_size")
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col))
            .alias("keep"),
        )
    )

"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the baseline; IVF (inverted-file, centroid-
bucketed) is the scale path — probe only the nearest centroid's bucket so the
candidate set shrinks by ~n_centroids x. Embedding-cosine near-dup pairs ride
the same kernels.

All math uses built-in higher-order functions (zip_with/aggregate) on
double-cast arrays — JVM-side, no Python UDF, and bit-comparable with
DuckDB's list_* functions when rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector.

    queries: (query_id, query_vec). Broadcast the (small) query side and scan
    the big side once — at 100 TB this is one pass, no shuffle until the
    per-query top-k (which AQE keeps tiny because rank filters early).
    Deterministic tie-break: (score desc, vec_id asc), score rounded to 6 dp
    BEFORE ranking so float noise cannot flip ranks between engines.
    """
    scored = spread(emb).crossJoin(F.broadcast(queries)).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), F.col("query_vec")), 6).alias("score"),
    ).filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def label_centroids(emb: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vector — the IVF coarse quantizer codebook.
    (Element-wise mean via posexplode + groupBy: built-ins only.)"""
    dim = F.size(F.col(vec_col))
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.transform(F.col(vec_col), lambda v: v.cast("double"))),
    )
    per_dim = exploded.groupBy("label", "pos").agg(F.avg("col").alias("m"))
    _ = dim
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             label_col: str = "label") -> DataFrame:
    """IVF search: route each query to its nearest centroid (by cosine), then
    brute-force only inside that bucket. The bucket assignment reuses the
    `label` partitioning column — at scale the table is written partitioned
    by label, so the probe is a partition-pruned scan, not a full pass."""
    cents = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    routed = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "query_vec", "label",
                F.round(cosine(F.col("query_vec"), F.col("centroid")), 6).alias("cscore"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("label"))
    probe = (
        routed.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
        .select("query_id", "query_vec", "label")
    )
    scored = (
        spread(emb).join(F.broadcast(probe), on=label_col)
        .select("query_id",
                F.col(id_col).alias("vec_id"),
                F.round(cosine(F.col(vec_col), F.col("query_vec")), 6).alias("score"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          label_col: str = "label",
                          max_label: int = 4096) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by label so the
    quadratic pair join stays within buckets (the IVF trick applied to
    dedup). Returns (id_a, id_b, score) with id_a < id_b.

    `max_label` is the hot-bucket cap, same contract as minhash_lsh_pairs'
    max_bucket: a label with k members emits k²/2 candidate rows, and one
    dominant cluster label (the common case on real corpora) is a quadratic
    blow-up no executor absorbs. Labels above the cap are dropped, not
    truncated — audit with `cosine_label_stats`, and split a genuinely hot
    label upstream (e.g. sub-bucket by an embedding-sign band) before
    re-running. Count-first discipline: the cap filters a plain count
    aggregate and survivors come back via a semi-join, so nothing
    corpus-sized ever sits in one buffer."""
    base = spread(emb).select(F.col(id_col).alias("vid"),
                              F.col(vec_col).alias("vec"),
                              F.col(label_col).alias("label"))
    ok = (
        base.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_label))
        .select("label")
    )
    kept = base.join(ok, "label", "left_semi")
    a = kept.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), "label")
    b = kept.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"), "label")
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random-hyperplane set for sign-LSH (Charikar 2002
    SimHash for vectors): components rounded to 6 dp so BOTH engines (Spark
    expressions and the DuckDB oracle) evaluate the exact same literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in m]


def cosine_lsh_pairs(emb: DataFrame, planes: list[list[float]],
                     threshold: float = 0.9, bands: int = 4,
                     max_bucket: int = 1024,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane (sign) LSH — the
    LABEL-FREE scale path beside the label-bucketed `cosine_near_dup_pairs`:
    signature bit j = sign(v·plane_j), signatures banded like SimHash, and
    candidates sharing any exact band value get an exact cosine verify.
    This is the standard ANN candidate generator: recall is probabilistic
    (P[bit match] = 1 − θ/π per Charikar), precision is exact via the
    verify, and the quadratic work is confined to buckets.

    Same count-first bucket-cap discipline as the other pair emitters:
    counts per (band, key), cap filter, semi-join survivors back, bounded
    collect. Dot-product signs are rounded to 6 dp before the >= 0 test so
    engine-order float noise cannot flip a signature bit.
    Returns (id_a, id_b, score) with id_a < id_b, score >= threshold."""
    n = len(planes)
    assert n % bands == 0
    width = n // bands
    mask = (1 << width) - 1
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    sig_col = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in plane])
        sig_col = sig_col + F.when(
            F.round(_dot(vd, plane_lit), 6) >= 0,
            F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    sig = spread(emb).select(F.col(id_col).alias("vid"),
                             F.col(vec_col).alias("vec"),
                             sig_col.alias("sig"))
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.expr(f"shiftright(sig, {b * width}) & {mask}").alias("key"))
        for b in range(bands)
    ]
    banded = sig.select(
        "vid", "vec", F.explode(F.array(*band_cols)).alias("bk")
    ).select("vid", "vec",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    ok = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .select("band", "key")
    )
    kept = banded.join(ok, ["band", "key"], "left_semi")
    a = kept.select("band", "key", F.col("vid").alias("id_a"),
                    F.col("vec").alias("va"))
    b = kept.select("band", "key", F.col("vid").alias("id_b"),
                    F.col("vec").alias("vb"))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def cosine_label_stats(emb: DataFrame, label_col: str = "label",
                       max_label: int = 4096) -> DataFrame:
    """Audit companion to `cosine_near_dup_pairs`: one row per OVERSIZED
    label the cap dropped, with its size — the same "log what was dropped"
    side channel as lsh_bucket_stats. Count-only aggregate, bounded output."""
    return (
        emb.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("label_size"))
        .filter(F.col("label_size") > max_label)
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cent_struct(cid: int, cent: list, vec: Column) -> Column:
    lit_cent = F.array(*[F.lit(float(x)) for x in cent])
    return F.struct(
        F.round(F.sqrt(_sqdist(vec, lit_cent)), 6).alias("d"),
        F.lit(cid).alias("cid"),
    )


def _assign_expr(centroids: list[tuple[int, list[float]]],
                 vec: Column) -> Column:
    """(d, cid) of the nearest centroid — array_min over literal-centroid
    structs, so assignment is a PURE COLUMN EXPRESSION: one corpus scan,
    zero shuffles, no per-vector window. Distances round to 6dp before the
    argmin and ties break by cid asc, so both engines pick the same
    centroid."""
    return F.array_min(F.array(
        *[_cent_struct(cid, cent, vec) for cid, cent in centroids]))


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               salt: str = "km",
               cache: bool = True) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means over the embedding column; returns the model as a
    plain [(cid, centroid)] list — the real IVF training path (ivf_topk's
    label_centroids assumes a pre-clustered label column; this builds one).

    Deterministic throughout: seeds are the k vectors with the smallest
    md5(salt:id) (reproducible under retry, same trick as
    stratified_sample), assignment rounds distances to 6dp and breaks ties
    by cid, and every updated centroid component rounds to 6dp — the
    resync point that keeps a DuckDB twin bit-identical across rounds.

    Scale shape (the Spark MLlib pattern): the MODEL is driver-sized
    (k x dim floats — the only collects here), the DATA never moves.
    Per Lloyd round: one corpus scan with a row-local argmin over k literal
    centroids (no crossJoin row blow-up, no per-vector window shuffle) and
    one aggregation whose exchange carries at most k x dim rows per map
    task. Empty clusters keep their previous centroid."""
    assert k >= 1 and iters >= 0
    from ..functions.textstats import hex_prefix_to_long

    base = spread(emb).select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("vec"),
    )
    # Lloyd re-scans the input once per round; persisting it is the MLlib
    # pattern (its KMeans warns when the input is uncached). The cached
    # frame is (id, vector) — the embedding TABLE, not the raw corpus —
    # and MEMORY_AND_DISK spills rather than OOMs at scale.
    if cache:
        base = base.persist()
    try:
        h = hex_prefix_to_long(
            F.md5(F.concat_ws(":", F.lit(salt),
                              F.col("vid").cast("string"))), 8)
        seed_rows = (base.select("vid", "vec", h.alias("h"))
                     .orderBy("h", "vid").limit(k).collect())
        cents = [(i, [round(float(x), 6) for x in r["vec"]])
                 for i, r in enumerate(seed_rows)]
        for _ in range(iters):
            assigned = base.select(
                "vec", _assign_expr(cents, F.col("vec")).alias("best"))
            per_dim = (assigned.select(F.col("best")["cid"].alias("cid"),
                                       F.posexplode("vec"))
                       .groupBy("cid", "pos")
                       .agg(F.round(F.avg("col"), 6).alias("m")))
            rows = (per_dim.groupBy("cid")
                    .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                         .alias("pm"))
                    .select("cid",
                            F.transform("pm", lambda s: s["m"]).alias("cent"))
                    .collect())
            updated = {r["cid"]: [float(x) for x in r["cent"]] for r in rows}
            cents = [(cid, updated.get(cid, cent)) for cid, cent in cents]
    finally:
        if cache:
            base.unpersist()
    return cents


def kmeans_assign(emb: DataFrame,
                  centroids: list[tuple[int, list[float]]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cid, dist) — nearest-centroid assignment as one pure-column
    scan (the model rides the plan as literals; nothing shuffles)."""
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    best = _assign_expr(centroids, vec)
    return spread(emb).select(
        F.col(id_col).alias("vec_id"),
        best["cid"].alias("cid"),
        best["d"].alias("dist"),
    )


def ivf_kmeans_topk(emb: DataFrame, queries: DataFrame,
                    centroids: list[tuple[int, list[float]]], k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF search over a TRAINED codebook (kmeans_fit output) instead of a
    pre-clustered label column: assign every vector to its nearest centroid
    (row-local argmin, zero shuffles), route each query the same way, and
    brute-force only inside the routed bucket. At scale the assignment is
    computed once at ingest and the table written partitioned by cid, so
    the probe is a partition-pruned scan; here the assignment rides the
    same plan. Ranking contract matches brute_force_topk: score rounded to
    6dp before ranking, ties (score desc, vec_id asc)."""
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    data = spread(emb).select(
        F.col(id_col).alias("vec_id"), vec.alias("v"),
        _assign_expr(centroids, vec)["cid"].alias("cid"))
    qvec = F.transform(F.col("query_vec"), lambda v: v.cast("double"))
    probe = queries.select(
        "query_id", qvec.alias("qv"),
        _assign_expr(centroids, qvec)["cid"].alias("cid"))
    scored = (data.join(F.broadcast(probe), "cid")
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id",
                      F.round(cosine(F.col("v"), F.col("qv")), 6)
                       .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "score"))


def semdedup(emb: DataFrame, centroids: list[tuple[int, list[float]]],
             threshold: float = 0.35, max_cluster: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    with a trained k-means codebook, call within-cluster pairs whose cosine
    clears `threshold` semantic duplicates, and for each duplicate pair keep
    the member FARTHER from its cluster centroid (the paper's
    low-centroid-similarity keeper), ties broken by smaller vec_id. Returns
    one verdict row per vector: (vec_id, cid, n_dups, keep) — auditable
    drops, same contract as curated_corpus.

    Scale shape: assignment is the zero-shuffle row-local argmin (the model
    rides the plan as literals), the quadratic pair join is confined to
    clusters with the count-first cap discipline of cosine_near_dup_pairs
    (counts per cid, cap filter, semi-join survivors — nothing corpus-sized
    in one buffer; at 100 TB you pick k so n/k is bucket-sized, exactly the
    paper's 50k-cluster setup). Oversized clusters are dropped, not
    truncated — audit via cosine_label_stats over the assignment frame.
    Cosine and centroid distance round to 6dp (the engine-parity contract)
    before any comparison."""
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    best = _assign_expr(centroids, vec)
    base = spread(emb).select(
        F.col(id_col).alias("vec_id"), vec.alias("v"),
        best["cid"].alias("cid"), best["d"].alias("cdist"))
    ok = (base.groupBy("cid")
          .agg(F.count(F.lit(1)).alias("n"))
          .filter((F.col("n") >= 2) & (F.col("n") <= max_cluster))
          .select("cid"))
    kept = base.join(ok, "cid", "left_semi")
    a = kept.select("cid", F.col("vec_id").alias("id_a"),
                    F.col("v").alias("va"), F.col("cdist").alias("da"))
    b = kept.select("cid", F.col("vec_id").alias("id_b"),
                    F.col("v").alias("vb"), F.col("cdist").alias("db"))
    dup = (a.join(b, "cid")
           .filter(F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b", "da", "db",
                   F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
           .filter(F.col("cos") >= threshold))
    # keeper = farther-from-centroid member; on a tie the smaller id stays
    drops = dup.select(
        F.when(F.col("da") < F.col("db"), F.col("id_a"))
         .otherwise(F.col("id_b")).alias("vec_id")).distinct()
    n_dups = (dup.select(F.col("id_a").alias("vec_id"))
              .unionAll(dup.select(F.col("id_b").alias("vec_id")))
              .groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_dups")))
    return (base.join(n_dups, "vec_id", "left")
            .join(drops.withColumn("dropped", F.lit(True)), "vec_id", "left")
            .select("vec_id", "cid",
                    F.coalesce(F.col("n_dups"), F.lit(0)).cast("long")
                     .alias("n_dups"),
                    F.col("dropped").isNull().alias("keep")))


def _per_subspace_assign(books: dict[int, list[tuple[int, list[float]]]],
                         sub: Column) -> Column:
    """(d, cid) of the nearest sub-centroid for a (s, subvector) row — a
    CASE chain over the m per-subspace argmin expressions, still a pure
    column expression."""
    expr = None
    for s in sorted(books):
        e = _assign_expr(books[s], sub)
        expr = (F.when(F.col("s") == s, e) if expr is None
                else expr.when(F.col("s") == s, e))
    return expr


def pq_train(emb: DataFrame, m: int = 4, sub_k: int = 8, iters: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jegou et al. 2011): split the vector
    into `m` equal subspaces and train an independent k-means codebook in
    each. Returns one [(cid, centroid)] list per subspace; the model is
    m x sub_k x (dim/m) floats — driver-sized at any corpus size.

    All m trainings are BATCHED into one Lloyd loop over an exploded
    (vec_id, s, subvector) frame — one seed job and one update job per
    round TOTAL instead of per subspace (m x fewer Spark jobs; the update
    exchange carries at most m x sub_k x d rows per map task). The math is
    bit-identical to m independent kmeans_fit(salt=f"pq{s}") runs: per-s
    md5 seeding, 6dp distance rounding with cid tiebreak, 6dp centroid
    resync, empty clusters keep their previous centroid — so the unrolled
    per-subspace DuckDB chains still hash-match."""
    from ..functions.textstats import hex_prefix_to_long

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    assert dim % m == 0 and sub_k >= 1 and iters >= 0
    d = dim // m
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    subs = F.array(*[
        F.struct(F.lit(s).alias("s"), F.slice(vec, s * d + 1, d).alias("sv"))
        for s in range(m)])
    base = (spread(emb)
            .select(F.col(id_col).alias("vid"), F.explode(subs).alias("x"))
            .select("vid", F.col("x.s").alias("s"), F.col("x.sv").alias("sv"))
            .persist())
    try:
        h = hex_prefix_to_long(
            F.md5(F.concat_ws(":", F.concat(F.lit("pq"),
                                            F.col("s").cast("string")),
                              F.col("vid").cast("string"))), 8)
        w = Window.partitionBy("s").orderBy("h", "vid")
        seed_rows = (base.select("s", "vid", "sv", h.alias("h"))
                     .withColumn("r", F.row_number().over(w))
                     .filter(F.col("r") <= sub_k)
                     .collect())
        books: dict[int, list[tuple[int, list[float]]]] = {
            s: [] for s in range(m)}
        for r in sorted(seed_rows, key=lambda r: (r["s"], r["r"])):
            books[r["s"]].append(
                (r["r"] - 1, [round(float(x), 6) for x in r["sv"]]))
        for _ in range(iters):
            assigned = base.select(
                "s", "sv",
                _per_subspace_assign(books, F.col("sv")).alias("best"))
            rows = (assigned.select("s", F.col("best")["cid"].alias("cid"),
                                    F.posexplode("sv"))
                    .groupBy("s", "cid", "pos")
                    .agg(F.round(F.avg("col"), 6).alias("mu"))
                    .groupBy("s", "cid")
                    .agg(F.array_sort(F.collect_list(F.struct("pos", "mu")))
                         .alias("pm"))
                    .select("s", "cid",
                            F.transform("pm", lambda t: t["mu"])
                             .alias("cent"))
                    .collect())
            updated = {(r["s"], r["cid"]): [float(x) for x in r["cent"]]
                       for r in rows}
            books = {s: [(cid, updated.get((s, cid), cent))
                         for cid, cent in book]
                     for s, book in books.items()}
    finally:
        base.unpersist()
    return [books[s] for s in range(m)]


def pq_encode(emb: DataFrame, books: list[list[tuple[int, list[float]]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(vec_id, code_0..code_{m-1}) — each vector compressed to m small
    codes (nearest sub-centroid per subspace). One scan, zero shuffles:
    every code is a row-local argmin over sub_k literal centroids."""
    m = len(books)
    d = len(books[0][0][1])
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    cols = [F.col(id_col).alias("vec_id")]
    for s in range(m):
        sub = F.slice(vec, s * d + 1, d)
        cols.append(_assign_expr(books[s], sub)["cid"].alias(f"code_{s}"))
    return spread(emb).select(*cols)


def pq_topk(emb: DataFrame, queries: DataFrame,
            books: list[list[tuple[int, list[float]]]], k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query precomputes a distance
    table against every sub-centroid (m x sub_k entries — driver-computed
    from the model plus the collected query rows, both bounded by
    definition), then every encoded vector's approximate distance is a sum
    of m table lookups. The corpus side is ONE scan producing (vec_id,
    subspace, code) probe rows, a broadcast join against the table, and a
    per-(query, vec) sum — no full-vector math per (query, vector) pair,
    which is the entire point of PQ at 100 TB. Table entries are quantized
    to integer micro-units and the m-lookup sum is exact integer
    arithmetic (order-independent across engines and partitionings); the
    final distance rounds to 6dp. Returns (query_id, rank, vec_id, adist),
    rank by distance asc, ties by vec_id."""
    spark = emb.sparkSession
    m = len(books)
    d = len(books[0][0][1])
    qrows = queries.select(
        "query_id",
        F.transform(F.col("query_vec"), lambda v: v.cast("double"))
         .alias("qv")).collect()
    # distance-table entries are integer micro-units so the m-lookup sum
    # per (query, vec) is exact integer arithmetic — independent of join
    # and summation order across engines/partitionings
    table = []
    for q in qrows:
        qv = [float(x) for x in q["qv"]]
        for s in range(m):
            sub = qv[s * d:(s + 1) * d]
            for cid, cent in books[s]:
                acc = 0.0
                for a, b in zip(sub, cent):
                    acc += (a - b) * (a - b)
                table.append((q["query_id"], s, cid, int(round(acc * 1e6))))
    dtab = spark.createDataFrame(
        table, "query_id long, s int, code int, dsq_u long")
    # probes in ONE scan: an array of m (s, code) structs exploded, instead
    # of a union of m selects (which would duplicate the encode subtree
    # into m corpus scans)
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    entries = F.array(*[
        F.struct(F.lit(s).alias("s"),
                 _assign_expr(books[s], F.slice(vec, s * d + 1, d))["cid"]
                  .alias("code"))
        for s in range(m)])
    probes = (spread(emb)
              .select(F.col(id_col).alias("vec_id"),
                      F.explode(entries).alias("p"))
              .select("vec_id", F.col("p.s").alias("s"),
                      F.col("p.code").alias("code")))
    scored = (probes.join(F.broadcast(dtab), ["s", "code"])
              .filter(F.col("vec_id") != F.col("query_id"))
              .groupBy("query_id", "vec_id")
              .agg(F.round(F.sum("dsq_u") / F.lit(1e6), 6).alias("adist")))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "adist"))

"""sf10/sf100 spot-check of the three superlinear-risk dedup queries on
NON-DEGENERATE replicated data (VERDICT r4 item 10).

make_sf1.py replicates documents byte-identically, which turns every doc
into a cross-replica EXACT duplicate — minhash_match measured 6.6x for
10x on that shape (correctly diagnosed as an artifact, but it left the
claimed sublinear curves unconfirmed on realistic data). Here replica
k > 0 is Caesar-rotated by k letters (duckdb translate): every word of
every doc changes, so cross-replica Jaccard collapses to ~0 while
WITHIN-replica near-dup structure is preserved exactly (the rotation is
a bijection applied uniformly). The result is a corpus that is R-times
larger with R-times the dup structure — the shape a real 10x/100x crawl
has — instead of one where everything matches everything.

Measures minhash_lsh_pairs (banded pair emission), dup_clusters
(large/small-star CC over the cached pairs — same reuse protocol as the
headline bench), and minhash_match (incremental cross-corpus gate) at
1x / 10x / 100x, one fresh local[32] session per scale.

Usage: python scripts/bench_sf_mutated.py [--skip-100]
Writes BENCH/sf_mutated.json.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

import duckdb

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_SCRIPTS)
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
QUERIES = ("minhash_lsh_pairs", "dup_clusters", "minhash_match")


def build(dst: str, reps: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    dk = con.execute(
        f"SELECT max(doc_id) + 1 FROM "
        f"read_parquet('{SRC}/documents.parquet')").fetchone()[0]
    # per-replica AFFINE letter permutation i -> (a*i + b) mod 26: the
    # corpus is all-lowercase, and plain Caesar rotations repeat with
    # period 26 — at 100x that made replicas k and k+26 byte-identical,
    # reintroducing the exact-dup artifact this script exists to remove.
    # (a, b) with a coprime to 26 gives 312 distinct bijections; the
    # (k % 12, 17k % 26) schedule keeps all k < 156 in distinct classes
    # and k = 0 the identity. A bijection applied uniformly preserves
    # within-replica dup structure exactly.
    lo = string.ascii_lowercase
    units = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    parts = []
    for k in range(reps):
        a, b = units[k % 12], (k * 17) % 26
        to = "".join(lo[(a * i + b) % 26] for i in range(26))
        txt = ("text" if to == lo
               else f"translate(text, '{lo}', '{to}')")
        parts.append(
            f"SELECT doc_id + {k * dk} AS doc_id, {txt} AS text, lang, "
            f"source, n_chars FROM read_parquet('{SRC}/documents.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{dst}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM "
                    f"read_parquet('{dst}/documents.parquet')").fetchone()[0]
    print(f"{dst}: {n} docs ({reps}x, replicas 1+ Caesar-mutated)",
          flush=True)


def measure(sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod
    from sparkstract.session import get_spark

    spark = get_spark("local[32]", app="sf-mutated",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out: dict = {}
    try:
        for name in QUERIES:
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            out[name] = {"sec": round(time.perf_counter() - t0, 3),
                         "rows": n}
            print(f"  {name}: {out[name]['sec']}s, {n} rows", flush=True)
    finally:
        spark.stop()
    return out


def main() -> None:
    scales = [("1x", SRC)]
    build("/tmp/sfmut10", 10)
    scales.append(("10x", "/tmp/sfmut10"))
    if "--skip-100" not in sys.argv:
        build("/tmp/sfmut100", 100)
        scales.append(("100x", "/tmp/sfmut100"))
    results: dict = {}
    tags = [t for t, _ in scales]
    for tag, d in scales:
        print(f"[{tag}] {d}", flush=True)
        results[tag] = measure(d)
    curves: dict = {}
    for q in QUERIES:
        row = {t: results[t][q] for t in tags}
        c = {}
        if "10x" in row:
            c["x10_vs_1x"] = round(row["10x"]["sec"] / row["1x"]["sec"], 2)
        if "100x" in row:
            c["x100_vs_10x"] = round(
                row["100x"]["sec"] / row["10x"]["sec"], 2)
        curves[q] = c
    results["curves"] = curves
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/sf_mutated.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["curves"]))


if __name__ == "__main__":
    main()

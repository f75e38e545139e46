"""Synthesize an sf1-scale dataset by deterministic 10x replication of the
driver's sf0.1 parquet (VERDICT r3 item 10: one larger-SF headline run to
confirm the per-query scaling curves). Each replica re-keys its rows so
join cardinalities scale like a real 10x corpus:

  * TPC-H keys shift by replica * (max key + 1) — fact/dim ratios and join
    fan-outs are preserved, no accidental key collisions
  * region/nation stay fixed (constant-size dims in TPC-H at every SF)
  * documents/embeddings/events shift their integer ids per replica;
    replica 0 is byte-identical to sf0.1, so near-dup structure is
    preserved and exact cross-replica duplicates appear (what a real 10x
    crawl has more of)

Usage: python scripts/make_sf1.py [src_dir] [dst_dir]
"""

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({R})) AS k")


def emit(table: str, select: str) -> None:
    src = f"read_parquet('{SRC}/{table}.parquet')"
    con.execute(
        f"COPY ({select.format(src=src)}) TO '{DST}/{table}.parquet' "
        f"(FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


def span(table: str, key: str) -> int:
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


for t in ("region", "nation"):
    emit(t, "SELECT * FROM {src}")

ck, ok, pk, sk = (span("customer", "c_custkey"), span("orders", "o_orderkey"),
                  span("part", "p_partkey"), span("supplier", "s_suppkey"))
emit("customer", f"""
    SELECT c_custkey + k * {ck} AS c_custkey, c_name, c_nationkey,
           c_acctbal, c_mktsegment FROM {{src}}, reps""")
emit("supplier", f"""
    SELECT s_suppkey + k * {sk} AS s_suppkey, s_name, s_nationkey,
           s_acctbal FROM {{src}}, reps""")
emit("part", f"""
    SELECT p_partkey + k * {pk} AS p_partkey, p_name, p_brand, p_type,
           p_size, p_retailprice FROM {{src}}, reps""")
emit("orders", f"""
    SELECT o_orderkey + k * {ok} AS o_orderkey,
           o_custkey + k * {ck} AS o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority FROM {{src}}, reps""")
emit("lineitem", f"""
    SELECT l_orderkey + k * {ok} AS l_orderkey,
           l_partkey + k * {pk} AS l_partkey,
           l_suppkey + k * {sk} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate FROM {{src}}, reps""")
ek = span("events", "event_id")
uk = span("events", "user_id")
emit("events", f"""
    SELECT event_id + k * {ek} AS event_id, ts,
           user_id + k * {uk} AS user_id, event_type, value, props
    FROM {{src}}, reps""")
dk = span("documents", "doc_id")
vk = span("embeddings", "vec_id")
emit("documents", f"""
    SELECT doc_id + k * {dk} AS doc_id,
           text, lang, source, n_chars FROM {{src}}, reps""")
emit("embeddings", f"""
    SELECT vec_id + k * {vk} AS vec_id,
           embedding, label FROM {{src}}, reps""")
print(f"sf1 written to {DST}")

#!/usr/bin/env python3
"""Scale-factor multiplier for the driver's synthetic testdata.

Usage: python3 scripts/gen_scale.py <srcDir> <outDir> [factor=10]

Builds a factor-X copy of the TPC-H-ish tables by replicating every table
with DISJOINT key offsets per replica (custkey/suppkey/partkey/orderkey/
event_id/user_id/doc_id/vec_id all shift by replica * keyspace), so join
fan-outs, group cardinalities and graph components scale linearly — the
same shape dbgen produces at a higher SF, minus new surface forms.

`documents` gets a deterministic per-replica TOKEN PERMUTATION (seeded
stride-free Fisher-Yates per (doc, replica)) instead of a verbatim copy:
unigram statistics (language id, stopword ratios, token counts, vocab)
are preserved exactly, while shingle/bigram sets across replicas become
disjoint — verbatim copies would hand the MinHash/LSH family quadratic
(x100) candidate blowup inside each band bucket, which is NOT what a 10x
crawl looks like; ten structurally-identical but textually-disjoint
sub-corpora are. Dates are left untouched (calendar-bounded columns get
denser per day at higher SF, matching dbgen).

Driver-side tooling (duckdb/pyarrow), not part of the Spark library.
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy(table, sql):
        unions = " UNION ALL ".join(
            sql.format(r=r, src=f"'{src}/{table}.parquet'")
            for r in range(factor))
        con.execute(
            f"COPY ({unions}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimension dictionaries stay as-is (region/nation are enums)
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    # Per-replica offsets derive from the SOURCE's own keyspace
    # (max(key)+1), not sf0.1 constants: chaining sf1 -> sf10 with
    # hardcoded sf0.1 offsets would silently collide keys across
    # replicas, corrupting join fan-out and graph structure. The same
    # offset is shared by every table referencing the key (custkey in
    # customer AND orders, etc.) so foreign keys stay consistent.
    def keyspace(table, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]

    off = {"cust": keyspace("customer", "c_custkey"),
           "supp": keyspace("supplier", "s_suppkey"),
           "part": keyspace("part", "p_partkey"),
           "ord": keyspace("orders", "o_orderkey"),
           "event": keyspace("events", "event_id"),
           "user": keyspace("events", "user_id"),
           "vec": keyspace("embeddings", "vec_id"),
           "doc": keyspace("documents", "doc_id")}
    print(f"offsets: {off}")

    copy("customer",
         f"SELECT c_custkey + {{r}} * {off['cust']} AS c_custkey, c_name,"
         " c_nationkey, c_acctbal, c_mktsegment FROM {src}")
    copy("supplier",
         f"SELECT s_suppkey + {{r}} * {off['supp']} AS s_suppkey, s_name,"
         " s_nationkey, s_acctbal FROM {src}")
    copy("part",
         f"SELECT p_partkey + {{r}} * {off['part']} AS p_partkey, p_name,"
         " p_brand, p_type, p_size, p_retailprice FROM {src}")
    copy("orders",
         f"SELECT o_orderkey + {{r}} * {off['ord']} AS o_orderkey,"
         f" o_custkey + {{r}} * {off['cust']} AS o_custkey, o_orderstatus,"
         " o_totalprice, o_orderdate, o_orderpriority FROM {src}")
    copy("lineitem",
         f"SELECT l_orderkey + {{r}} * {off['ord']} AS l_orderkey,"
         f" l_partkey + {{r}} * {off['part']} AS l_partkey,"
         f" l_suppkey + {{r}} * {off['supp']} AS l_suppkey, l_linenumber,"
         " l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
         " l_linestatus, l_shipdate FROM {src}")
    copy("events",
         f"SELECT event_id + {{r}} * {off['event']} AS event_id, ts,"
         f" user_id + {{r}} * {off['user']} AS user_id, event_type, value,"
         " props FROM {src}")
    copy("embeddings",
         f"SELECT vec_id + {{r}} * {off['vec']} AS vec_id, embedding, label"
         " FROM {src}")

    # documents: replica 0 verbatim; replicas 1.. token-permuted
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars"
        f" FROM '{src}/documents.parquet' ORDER BY doc_id").fetchall()
    rows = {"doc_id": [], "text": [], "lang": [], "source": [],
            "n_chars": []}
    for r in range(factor):
        for doc_id, text, lang, source, n_chars in docs:
            if r > 0:
                toks = text.split(" ")
                random.Random(doc_id * 31 + r).shuffle(toks)
                text = " ".join(toks)
            rows["doc_id"].append(doc_id + r * off["doc"])
            rows["text"].append(text)
            rows["lang"].append(lang)
            rows["source"].append(source)
            rows["n_chars"].append(n_chars)
    pq.write_table(pa.table(rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())])), f"{out}/documents.parquet")
    print(f"documents: {len(rows['doc_id'])} rows (token-permuted replicas)")


if __name__ == "__main__":
    main()

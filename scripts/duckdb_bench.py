#!/usr/bin/env python3
"""Paired DuckDB twin of graft.Bench: times every oracle SQL over the same
parquet tables and writes duckdb_bench.json. graft.Bench embeds the file's
total into its own output (duckdb_total / duckdb_recorded fields) so the
round's 2x-of-baseline gate is self-contained in one artifact instead of
being reconstructed from separate runs each round.

Usage:
    python3 scripts/duckdb_bench.py <sfDir> <oracle_sql.json> [out.json]

Measurement discipline mirrors the Spark side: one untimed warm pass
(plan cache + OS page cache), then one timed pass, 32 threads, run on a
quiet machine BACK-TO-BACK with the Spark bench.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "duckdb_bench.json"
    threads = int(os.environ.get("DUCKDB_THREADS", "32"))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))

    for _, sql in sorted(oracle.items()):  # warm pass, untimed
        con.execute(sql).fetchall()
    q = {}
    total = 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        total += dt  # sum UNROUNDED: 111 pre-rounded 2-dp terms could
        q[name] = round(dt, 2)  # bias the gate denominator by ~0.5s

    doc = {"metric": "duckdb_total", "value": round(total, 3),
           "unit": "sec", "threads": threads, "sf": sfdir,
           "n_queries": len(q),
           "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "queries": q}
    json.dump(doc, open(out, "w"), indent=0)
    print(json.dumps({k: doc[k] for k in
                      ("metric", "value", "n_queries", "generated_at")}))


if __name__ == "__main__":
    main()

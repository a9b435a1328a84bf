#!/usr/bin/env python3
"""Per-query, timeout-guarded DuckDB twin for scale spot-benches.

Usage:
    python3 scripts/duckdb_bench_scale.py <sfDir> <oracle_sql.json> <out.json> [timeout_s=600]

Unlike duckdb_bench.py (one process, full warm pass, no guard), each
query runs in its OWN subprocess with a wall-clock timeout: at sf >= 1
a single pathological plan (DuckDB's recursive-CTE connected components
went > 1 h and ~80 GiB on the 10x corpus before this script existed)
must cost its own budget, not the whole artifact. Per query: one
untimed warm run + one timed run inside the subprocess; a timeout or
OOM records an honest DNF, counted at the budget in the total so the
artifact understates (never overstates) the paired gap. A subprocess
that exits non-zero WITHOUT running out the clock (an instant SQL
error, or an OOM kill partway) is charged its measured wall time and
listed under "errors" — charging the full budget to a query that
failed in 0.1s would overstate the gap.
"""
import json
import subprocess
import sys
import time

CHILD = r"""
import duckdb, json, sys, time
sfdir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
con.execute("SET threads=32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
con.execute(sql).fetchall()          # warm
t0 = time.time()
con.execute(sql).fetchall()
print(json.dumps({"sec": time.time() - t0}))
"""


def main():
    sfdir, oracle_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 600
    oracle = json.load(open(oracle_path))
    q, total, dnf, err = {}, 0.0, [], []
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, sfdir], input=sql,
                capture_output=True, text=True, timeout=budget)
            if r.returncode == 0:
                dt = json.loads(r.stdout.strip().splitlines()[-1])["sec"]
                q[name] = round(dt, 2)
                total += dt
                print(f"{name}: {dt:.2f}s (wall {time.time()-t0:.0f}s)")
            else:
                raise RuntimeError(r.stderr[-200:])
        except subprocess.TimeoutExpired:
            q[name] = float(budget)
            total += budget
            dnf.append(name)
            print(f"{name}: DNF (> {budget}s budget)")
        except Exception as e:
            # A genuine timeout is charged the full budget (the DNF cap
            # understates DuckDB's true cost). A child that DIED without
            # running out the clock (instant SQL error, or an OOM kill
            # partway) is charged its MEASURED wall time — charging 600s
            # to a query that failed in 0.1s would overstate the paired
            # gap — and listed under "errors".
            wall = time.time() - t0
            q[name] = round(wall, 2)
            total += wall
            err.append(name)
            print(f"{name}: ERROR after {wall:.1f}s ({e})")
    doc = {"metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
           "threads": 32, "sf": sfdir, "n_queries": len(q),
           "dnf_at_budget": dnf, "errors": err, "budget_s": budget,
           "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "queries": q}
    json.dump(doc, open(out, "w"), indent=0)
    print(json.dumps({k: doc[k] for k in ("metric", "value", "n_queries",
                                          "dnf_at_budget", "errors")}))


if __name__ == "__main__":
    main()

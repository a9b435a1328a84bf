#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables,
loads the Spark-written parquet for the same query name, sorts columns by
name and rows by all columns, and compares values exactly (floats to 1e-9
with an exact-mismatch warning). Mirrors the driver contract: column-name
match, row count match, value hash match.
"""
import sys, os, glob, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    all_dirs = {d for d in os.listdir(outdir)
                if os.path.isdir(os.path.join(outdir, d))}
    no_oracle = sorted(all_dirs - set(oracle))
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype) != str(bv.dtype):
                bad.append(f"dtype[{c}]: {av.dtype} vs {bv.dtype}")
            try:
                import pandas as pd
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    import numpy as np
                    eq = (av.isna() & bv.isna()) | (np.abs(av - bv) < 1e-9)
                    # byte-level equality: the driver's hash sees the raw
                    # representation, so -0.0 vs 0.0 (== under IEEE) is a
                    # real mismatch (round-3 q61 failed on exactly this)
                    exact = (av.isna() & bv.isna()) | (
                        av.astype("f8").to_numpy().view("i8")
                        == bv.astype("f8").to_numpy().view("i8"))
                    if not eq.all():
                        bad.append(f"value[{c}]: {int((~eq).sum())} diffs, e.g. {av[~eq].iloc[0]} vs {bv[~eq].iloc[0]}")
                    elif not exact.all():
                        bad.append(f"WARN inexact[{c}]: {int((~exact).sum())} float byte-diffs <1e-9 (e.g. {av[~exact].iloc[0]!r} vs {bv[~exact].iloc[0]!r}; driver hash may fail)")
                else:
                    eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
                    if not eq.all():
                        bad.append(f"value[{c}]: {int((~eq).sum())} diffs, e.g. {av[~eq].iloc[0]!r} vs {bv[~eq].iloc[0]!r}")
            except Exception as e:
                bad.append(f"cmp[{c}]: {e}")
        if any(not x.startswith("WARN") for x in bad):
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            warn = "; ".join(x for x in bad if x.startswith("WARN"))
            print(f"PASS {name} ({len(sdf)} rows)" + (f" [{warn}]" if warn else ""))
            n_pass += 1
    for name in no_oracle:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if files:
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"INFO {name}: no oracle, rows-only check -> {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

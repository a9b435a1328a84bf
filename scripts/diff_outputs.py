#!/usr/bin/env python3
"""Diff two graft.Verify output trees LOGICALLY (per-query, row-sorted).

Raw parquet bytes differ across runs (part-file UUIDs in the footer), so
the compare is over decoded values: every query's table, rows sorted by
all columns, must be identical between the two runs. Exit 0 iff every
query matches. Used by `sbt verifyStable` (determinism CI).
"""
import glob
import os
import sys

import pyarrow.parquet as pq


def load(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    # row order is part of each query's contract, but concat order of
    # multi-part outputs is filename-dependent — sort for the compare
    return t.sort_by([(c, "ascending") for c in t.column_names])


def main(a, b):
    qa = sorted(os.path.basename(p) for p in glob.glob(os.path.join(a, "q*")))
    qb = sorted(os.path.basename(p) for p in glob.glob(os.path.join(b, "q*")))
    bad = []
    if qa != qb:
        bad.append(f"query sets differ: only-a={set(qa)-set(qb)} only-b={set(qb)-set(qa)}")
        qa = [q for q in qa if q in set(qb)]
    for q in qa:
        ta, tb = load(os.path.join(a, q)), load(os.path.join(b, q))
        if ta is None or tb is None:
            bad.append(f"{q}: missing parquet ({'a' if ta is None else 'b'})")
        elif not ta.equals(tb):
            bad.append(f"{q}: outputs differ between runs")
    for m in bad:
        print("DIFF", m)
    print(f"{len(qa) - sum(1 for m in bad if not m.startswith('query sets'))} stable, {len(bad)} diffs")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

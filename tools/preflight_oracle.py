#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 oracle gate (SURVEY.md §5 tier 3).

Usage:
  python3 tools/preflight_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching DuckDB SQL from oracle_sql.json against the sfDir
tables, and compares strictly: same shape, same columns (sorted by
name), same values in row order. Exits non-zero on any mismatch.

This is a local tool only — it is NOT part of the Scala library and
duckdb/pandas are used here exactly as the driver uses them.
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pandas as pd


def load_spark_dump(path):
    parts = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    if not parts:
        raise FileNotFoundError(f"no part files under {path}")
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def norm_cell(v):
    """Normalize a cell to a comparable canonical value."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if hasattr(v, "isoformat"):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("arr", tuple(norm_cell(x) for x in v))
    return ("o", str(v))


def compare(name, sdf, ddf):
    problems = []
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        return [f"columns differ: spark={scols} duck={dcols}"]
    if len(sdf) != len(ddf):
        problems.append(f"row count differs: spark={len(sdf)} duck={len(ddf)}")
    n = min(len(sdf), len(ddf))
    sdf, ddf = sdf[scols], ddf[scols]
    shown = 0
    for c in scols:
        sv, dv = sdf[c].tolist(), ddf[c].tolist()
        for i in range(n):
            a, b = norm_cell(sv[i]), norm_cell(dv[i])
            if a != b:
                # ints vs numpy ints etc already normalized; decimal vs int:
                if a and b and a[0] in "if" and b[0] in "if" and float(sv[i]) == float(dv[i]):
                    continue
                problems.append(f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}")
                shown += 1
                if shown >= 5:
                    return problems
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        # driver fixtures are single files; GenScale scale-outs are
        # Spark-style directories of part files
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            sdf = load_spark_dump(os.path.join(outdir, name))
        except Exception as e:
            print(f"FAIL {name}: spark dump missing: {e}")
            n_fail += 1
            continue
        probs = compare(name, sdf, ddf)
        if probs:
            print(f"FAIL {name}:")
            for p in probs:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    # queries without oracle: report presence only
    declared = set(oracle)
    for d in sorted(glob.glob(os.path.join(outdir, "q_*"))):
        qn = os.path.basename(d)
        if qn not in declared:
            try:
                r = len(load_spark_dump(d))
                print(f"INFO {qn}: no oracle, {r} rows dumped")
            except Exception as e:
                print(f"WARN {qn}: no oracle and dump unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

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
import sys, os, json, glob, math, re
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


def split_ctes(sql):
    """Split a NON-RECURSIVE top-level `WITH a AS (...), ... SELECT`
    into ([(name, body), ...], final_select).

    Each CTE in a non-recursive WITH references only earlier CTEs, so
    materializing them in order as temp tables is semantically
    identical to the single statement — but it caps the optimizer's
    CTE re-inlining, which is what makes the unrolled loop-family
    oracles (label-propagation / GIM-V, 5 chained self-joins) spill
    >70 GB at sf1 (VERDICT r14 task 2). Returns (None, sql) when not
    applicable (no WITH, or WITH RECURSIVE — whose semantics genuinely
    need the single statement)."""
    s = sql.strip()
    m0 = re.match(r"(?is)^\s*WITH\b", s)
    if not m0 or re.match(r"(?is)^\s*WITH\s+RECURSIVE\b", s):
        return None, sql
    i, n, ctes = m0.end(), len(s), []
    head = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", re.I | re.S)
    comma = re.compile(r"\s*,")
    while True:
        m = head.match(s, i)
        if not m:
            return None, sql
        name, j = m.group(1), m.end()
        # paren scan aware of 'strings' (with '' escapes), "quoted
        # identifiers", -- line comments and /* */ block comments —
        # parens inside any of those must not count (ADVICE r15: the
        # single-quote-only scanner truncated CTE bodies containing
        # e.g. `-- note)` and produced a spurious materialize FAIL).
        # Dollar-quoted strings are ambiguous to scan cheaply: bail
        # to (None, sql) so the caller keeps the single statement.
        depth, k = 1, j
        while k < n and depth > 0:
            c = s[k]
            if c == "'":
                k += 1
                while k < n:
                    if s[k] == "'":
                        if k + 1 < n and s[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
                if k >= n:
                    return None, sql
            elif c == '"':
                k += 1
                while k < n and s[k] != '"':
                    k += 1
                if k >= n:
                    return None, sql
            elif c == "-" and k + 1 < n and s[k + 1] == "-":
                while k < n and s[k] != "\n":
                    k += 1
                continue
            elif c == "/" and k + 1 < n and s[k + 1] == "*":
                e = s.find("*/", k + 2)
                if e < 0:
                    return None, sql
                k = e + 1
            elif c == "$":
                return None, sql
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth != 0:
            return None, sql
        ctes.append((name, s[j:k - 1]))
        m2 = comma.match(s, k)
        if not m2:
            return ctes, s[k:].strip()
        i = m2.end()


def run_oracle(con, sql, materialize):
    """Execute an oracle query, optionally with each top-level CTE
    materialized as a temp table (see split_ctes)."""
    if not materialize:
        return con.execute(sql).df()
    ctes, final = split_ctes(sql)
    if not ctes:
        return con.execute(sql).df()
    try:
        for nm, body in ctes:
            con.execute(f'DROP TABLE IF EXISTS "{nm}"')
            con.execute(f'CREATE TEMP TABLE "{nm}" AS {body}')
        return con.execute(final).df()
    finally:
        for nm, _ in ctes:
            try:
                con.execute(f'DROP TABLE IF EXISTS "{nm}"')
            except Exception:
                pass


def main():
    args = [a for a in sys.argv[1:] if a != "--materialize-ctes"]
    materialize = "--materialize-ctes" in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
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
            ddf = run_oracle(con, sql, materialize)
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

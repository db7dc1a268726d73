#!/usr/bin/env python3
"""Scale-fixture oracle sweep: run preflight_oracle.py one query at a
time with a per-query wall timeout, so slow DuckDB oracle formulations
(single-process, minutes at sf1) are RECORDED as excluded instead of
hanging the whole comparison. Everything that completes must PASS.

Usage:
  python3 tools/preflight_sweep.py <sfDir> <verifyOutDir> [timeoutSec]

A query that TIMES OUT is retried once with --materialize-ctes (each
top-level CTE becomes a temp table — semantically identical for the
non-recursive WITHs every oracle uses, and it kills the CTE
re-inlining spill that makes the unrolled loop-family oracles
minutes-slow at sf1; VERDICT r14 task 2) under a 4x budget.

Writes a summary JSON line at the end:
  {"pass": N, "pass_iter": N, "fail": N, "timeout": N, "no_dump": N,
   "failed": [...], "passed_iter": [...], "timed_out": [...]}
Exit 0 iff fail == 0 (remaining timeouts are a DuckDB-cost matter, not
a correctness signal — same convention as SCALING.md's r13 cut).
"""
import sys, os, json, glob, subprocess

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(oracle.keys())
    res = {"pass": [], "pass_iter": [], "fail": [], "timeout": [],
           "no_dump": []}

    def attempt(name, budget, extra):
        return subprocess.run(
            [sys.executable, os.path.join(here, "preflight_oracle.py"),
             sf_dir, out_dir, name] + extra,
            capture_output=True, text=True, timeout=budget)

    for name in names:
        if not glob.glob(os.path.join(out_dir, name, "part-*.parquet")):
            res["no_dump"].append(name)
            continue
        try:
            p = attempt(name, timeout, [])
            if p.returncode == 0:
                res["pass"].append(name)
                print(f"PASS {name}", flush=True)
                continue
            res["fail"].append(name)
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
            print(f"FAIL {name}: " + " | ".join(tail), flush=True)
            continue
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {timeout}s) — retrying with "
                  f"materialized CTEs", flush=True)
        try:
            p = attempt(name, timeout * 4, ["--materialize-ctes"])
            if p.returncode == 0:
                res["pass_iter"].append(name)
                print(f"PASS {name} (iterative, <= {timeout * 4}s)",
                      flush=True)
            else:
                res["fail"].append(name)
                tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
                print(f"FAIL {name} (iterative): " + " | ".join(tail),
                      flush=True)
        except subprocess.TimeoutExpired:
            res["timeout"].append(name)
            print(f"TIMEOUT {name} (iterative, > {timeout * 4}s)",
                  flush=True)
    print(json.dumps({
        "pass": len(res["pass"]), "pass_iter": len(res["pass_iter"]),
        "fail": len(res["fail"]), "timeout": len(res["timeout"]),
        "no_dump": len(res["no_dump"]), "failed": res["fail"],
        "passed_iter": res["pass_iter"], "timed_out": res["timeout"]}))
    sys.exit(0 if not res["fail"] else 1)

if __name__ == "__main__":
    main()

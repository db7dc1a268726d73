#!/usr/bin/env python3
"""Scale-fixture oracle sweep: run preflight_oracle.py one query at a
time with a per-query wall timeout, so slow DuckDB oracle formulations
(single-process, minutes at sf1) are RECORDED as excluded instead of
hanging the whole comparison. Everything that completes must PASS.

Usage:
  python3 tools/preflight_sweep.py <sfDir> <verifyOutDir> [timeoutSec]

Writes a summary JSON line at the end:
  {"pass": N, "fail": N, "timeout": N, "no_dump": N, "failed": [...],
   "timed_out": [...]}
Exit 0 iff fail == 0 (timeouts are a DuckDB-cost matter, not a
correctness signal — same convention as SCALING.md's r13 cut).
"""
import sys, os, json, glob, subprocess

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(oracle.keys())
    res = {"pass": [], "fail": [], "timeout": [], "no_dump": []}
    for name in names:
        if not glob.glob(os.path.join(out_dir, name, "part-*.parquet")):
            res["no_dump"].append(name)
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "preflight_oracle.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            if p.returncode == 0:
                res["pass"].append(name)
                print(f"PASS {name}", flush=True)
            else:
                res["fail"].append(name)
                tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
                print(f"FAIL {name}: " + " | ".join(tail), flush=True)
        except subprocess.TimeoutExpired:
            res["timeout"].append(name)
            print(f"TIMEOUT {name} (> {timeout}s)", flush=True)
    print(json.dumps({
        "pass": len(res["pass"]), "fail": len(res["fail"]),
        "timeout": len(res["timeout"]), "no_dump": len(res["no_dump"]),
        "failed": res["fail"], "timed_out": res["timeout"]}))
    sys.exit(0 if not res["fail"] else 1)

if __name__ == "__main__":
    main()

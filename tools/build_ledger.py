#!/usr/bin/env python3
"""Rebuild tools/bench_reference.json from quiet-window bench runs.

Usage:
    python3 tools/build_ledger.py RUN1 [RUN2 ...] [--out tools/bench_reference.json]
                                  [--note "..."] [--loadavg "..."]

Each RUN is a file containing graft.Bench stdout (the '"metric"'-grepped
capture is fine). The ledger row for each query is the MIN across runs
of the per-run repeats-median — the documented quiet-window estimate
(load only inflates, so the min across quiet runs is the tightest
stable point; see the r14 note carried in the output). Refuses to write
if the runs disagree on the row set (a registry change between runs
means the runs are not comparable).
"""
import datetime
import json
import subprocess
import sys

from bench_diff import extract_medians


def main():
    args = sys.argv[1:]
    out = "tools/bench_reference.json"
    note_extra = ""
    loadavg = ""
    runs = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out = args[i + 1]; i += 2
        elif args[i] == "--note":
            note_extra = args[i + 1]; i += 2
        elif args[i] == "--loadavg":
            loadavg = args[i + 1]; i += 2
        else:
            runs.append(args[i]); i += 1
    if not runs:
        sys.exit("need at least one bench capture file")
    maps = []
    for r in runs:
        m = extract_medians(open(r).read())
        if not m:
            sys.exit(f"{r}: no per-query median map found")
        maps.append(m)
    keys = set(maps[0])
    for r, m in zip(runs[1:], maps[1:]):
        if set(m) != keys:
            sys.exit(f"{r}: row set differs from {runs[0]} "
                     f"(+{sorted(set(m) - keys)[:3]} -{sorted(keys - set(m))[:3]}) "
                     "— registry changed between runs; not comparable")
    medians = {k: min(m[k] for m in maps) for k in sorted(keys)}
    commit = subprocess.run(["git", "rev-parse", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    ledger = {
        "generated_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_commit": commit,
        "loadavg": loadavg,
        "medians": medians,
        "n_rows": len(medians),
        "note": ("quiet-window estimate: per-row MIN across "
                 f"{len(runs)} full repeats-3 runs. Regenerate: "
                 "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 "
                 "SPARK_GRAFT_CPUS=32 sbt 'runMain graft.Bench' (x2, "
                 "loadavg < ~1 at start), then tools/build_ledger.py. "
                 "Flag adjudication: these mins are TIGHT — isolated "
                 "SPARK_GRAFT_ONLY re-measures pay relatively more "
                 "JIT/codegen warmup and read 1.5-2x above the min on "
                 "UNTOUCHED rows; a flag only counts if an untouched "
                 "control row in the same run does NOT inflate equally."
                 + (" " + note_extra if note_extra else "")),
        "repeats": 3,
        "sf": 0.1,
        "total": round(sum(medians.values()), 3),
    }
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(medians)} rows, per-row-min total "
          f"{ledger['total']}s, commit {commit[:9]}")


if __name__ == "__main__":
    main()

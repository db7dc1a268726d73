#!/usr/bin/env python3
"""Per-row bench regression check against the committed ledger.

Usage:
    python3 tools/bench_diff.py [BENCH_FILE] [--ref tools/bench_reference.json]
                                [--threshold 1.5]

BENCH_FILE is any file containing graft.Bench stdout lines (a driver
BENCH_r{N}.json, a raw captured stdout, or a builder .txt) — the script
extracts the LAST complete per-query median map it can find, compares
every row against the reference ledger, and reports rows above
threshold x their reference median. New rows (no reference) and
missing rows are listed informationally.

Exit code 1 if any regression is flagged, 0 otherwise — so the check
is mechanical: `python3 tools/bench_diff.py BENCH_r13.json && echo OK`.

Ambient-load note: the ledger is a quiet-window run (loadavg recorded
inside it). This host carries external load bursts (BASELINE.md), so a
flagged row under loadavg > ~2 deserves a quiet re-measure via
  SPARK_GRAFT_ONLY=<row> sbt "runMain graft.Bench"
before being treated as a code regression.
"""
import json
import re
import sys


def extract_medians(text):
    """Last complete {"q_name":sec,...} map in the text, as a dict."""
    # Driver BENCH_r{N}.json files wrap the captured bench stdout in a
    # JSON object whose "tail" field holds the (escaped) last bytes —
    # unwrap it so the q_* scrape below sees unescaped quotes.
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    best = {}
    # "queries" metric lines carry the full map; fall back to scraping
    # every q_* pair if no complete JSON object parses.
    for m in re.finditer(r'\{"metric":"queries","queries":(\{[^}]*\})', text):
        try:
            best = json.loads(m.group(1))
        except json.JSONDecodeError:
            pass
    if not best:
        pairs = re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+)', text)
        for k, v in pairs:
            best[k] = float(v)
    return best


def main():
    args = [a for a in sys.argv[1:]]
    ref_path = "tools/bench_reference.json"
    threshold = 1.5
    bench_path = None
    i = 0
    while i < len(args):
        if args[i] == "--ref":
            ref_path = args[i + 1]
            i += 2
        elif args[i] == "--threshold":
            threshold = float(args[i + 1])
            i += 2
        else:
            bench_path = args[i]
            i += 1
    if bench_path is None:
        print("usage: bench_diff.py BENCH_FILE [--ref ...] [--threshold 1.5]")
        return 2

    ref = json.load(open(ref_path))
    ref_medians = ref["medians"]
    cur = extract_medians(open(bench_path).read())
    if not cur:
        print(f"ERROR: no per-query medians found in {bench_path}")
        return 2

    # Sub-ms rows are below the host noise floor; require an absolute
    # floor too so a 0.04 s -> 0.08 s wobble doesn't page anyone.
    ABS_FLOOR = 0.25
    flagged, newrows, missing = [], [], []
    for k, v in sorted(cur.items()):
        if k not in ref_medians:
            newrows.append(k)
            continue
        r = ref_medians[k]
        if v > threshold * r and v > ABS_FLOOR:
            flagged.append((k, r, v, v / r if r > 0 else float("inf")))
    for k in sorted(ref_medians):
        if k not in cur:
            missing.append(k)

    print(f"ledger: {ref_path} (commit {ref.get('git_commit', '?')[:9]}, "
          f"loadavg {ref.get('loadavg', '?')}, {len(ref_medians)} rows)")
    print(f"bench:  {bench_path} ({len(cur)} rows), "
          f"threshold {threshold}x + {ABS_FLOOR}s floor")
    if newrows:
        print(f"new rows (no reference yet): {len(newrows)}: "
              + ", ".join(newrows))
    if missing:
        print(f"rows missing from bench: {len(missing)}: "
              + ", ".join(missing))
    if flagged:
        print(f"\nREGRESSIONS ({len(flagged)}):")
        for k, r, v, ratio in sorted(flagged, key=lambda x: -x[3]):
            print(f"  {k:40s} {r:7.3f}s -> {v:7.3f}s  ({ratio:.2f}x)")
        return 1
    print("no regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())

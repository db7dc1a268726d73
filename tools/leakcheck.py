#!/usr/bin/env python3
"""Leak scan over the shippable tree (src/, build.sbt, project/, tools/).

Greps for references that must not exist in a public, zero-egress
library: imports outside the public dependency roots, non-public URLs,
object-store buckets, chat shortlinks, credential-shaped strings, and
environment variables outside the engine's own namespace.

Writes LEAKCHECK.json with PROVENANCE (UTC timestamp, git commit, file
count, tool name) so a fresh run is distinguishable from an edit of the
previous round's counter (ADVICE r9/r10 asked for exactly this).

Usage: python3 tools/leakcheck.py [round_number]
"""
import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCAN_TARGETS = ["src", "build.sbt", "project", "tools", "Bench.scala",
                "Verify.scala"]

# Roots a public Spark/Scala library may import. Only reversed-domain
# imports are candidates at all (local-value imports like
# `s.implicits._` are scope sugar, not dependencies).
IMPORT_ALLOW = (
    "org.apache.", "scala.", "java.", "javax.", "graft.",
    "org.scalatest", "org.scalacheck", "org.slf4j",
)
IMPORT_DOMAIN = re.compile(r"^(com|org|net|io|ai|co|de|cloud|dev)\.")
# Public documentation/reference hosts; any other URL is a hit.
URL_ALLOW = re.compile(
    r"https?://(localhost|127\.0\.0\.1|[^/\s\"']*\."
    r"(apache\.org|scala-lang\.org|github\.com|wikipedia\.org|"
    r"ieee\.org|acm\.org|duckdb\.org|example\.com)|"
    r"(apache\.org|github\.com|duckdb\.org|example\.com))")
URL_RE = re.compile(r"https?://[^\s\"')>]+")
# The engine's own env namespace plus standard build/JVM vars.
ENV_ALLOW = ("SPARK_GRAFT_", "SPARK_DRIVER_MEM", "COURSIER", "JAVA_",
             "PATH", "HOME", "TMPDIR")
ENV_RE = re.compile(r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"([A-Z0-9_]+)\"")

CHECKS = {
    "internal-import": None,   # handled structurally below
    "internal-url": None,      # handled structurally below
    "internal-pkg2": None,     # package decls outside the two roots
    "internal-bucket": re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://"),
    "slack-link": re.compile(r"slack\.com|\bgo/[a-z][a-z0-9-]{2,}\b"),
    "api-key": re.compile(
        r"sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|xox[baprs]-"),
    "axon-env": None,          # env vars outside ENV_ALLOW
}
PKG_RE = re.compile(r"^\s*package\s+([\w.]+)")
PKG_ALLOW = ("graft", "org.apache.spark.sql.graftbridge")
IMPORT_RE = re.compile(r"^\s*import\s+([\w.]+)")


def files():
    for target in SCAN_TARGETS:
        p = ROOT / target
        if p.is_file():
            yield p
        elif p.is_dir():
            for f in sorted(p.rglob("*")):
                if f.is_file() and f.suffix in (
                        ".scala", ".sbt", ".py", ".java", ".properties"):
                    yield f


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = {k: [] for k in CHECKS}
    n_files = 0
    for f in files():
        n_files += 1
        rel = str(f.relative_to(ROOT))
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            where = f"{rel}:{i}"
            if f.suffix in (".scala", ".sbt", ".java"):
                m = IMPORT_RE.match(line)
                if (m and IMPORT_DOMAIN.match(m.group(1)) and
                        not m.group(1).startswith(IMPORT_ALLOW)):
                    hits["internal-import"].append(f"{where}: {m.group(1)}")
                m = PKG_RE.match(line)
                if m and not any(m.group(1) == a or
                                 m.group(1).startswith(a + ".")
                                 for a in PKG_ALLOW):
                    hits["internal-pkg2"].append(f"{where}: {m.group(1)}")
                for m in ENV_RE.finditer(line):
                    if not m.group(1).startswith(ENV_ALLOW):
                        hits["axon-env"].append(f"{where}: {m.group(1)}")
            for m in URL_RE.finditer(line):
                if not URL_ALLOW.match(m.group(0)):
                    hits["internal-url"].append(f"{where}: {m.group(0)}")
            for key, rx in CHECKS.items():
                if rx is not None and rx.search(line):
                    hits[key].append(f"{where}: {line.strip()[:120]}")
    commit = subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "provenance": {
            "generated_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "git_commit": commit,
            "files_scanned": n_files,
            "tool": "tools/leakcheck.py",
        },
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    print(f"n_hits={out['n_hits']} files={n_files} commit={commit[:12]}")


if __name__ == "__main__":
    main()

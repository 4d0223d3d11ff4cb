#!/usr/bin/env python3
"""Self-run leak scan with provenance stamping.

The driver's LEAKCHECK.json carries only {round, n_hits, hits} — a diff
that bumps the round number is indistinguishable from a hand edit
(ADVICE r15, item 5). This twin scans the same surface and stamps WHEN
it ran, WHAT it scanned (file count + byte count + git sha), and WHICH
patterns it applied, so a fresh artifact proves a fresh run.

Scope: everything the build ships or executes — src/, configs/, tools/,
build.sbt, project/ — plus README.md. Patterns: non-public imports,
non-public URLs, cloud bucket URIs, API-key shapes, and environment
variables outside the documented public set.

Usage: python3 tools/leakcheck.py [jsonOut]
Exit 1 on any hit.
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN = ["src", "configs", "tools", "project", "build.sbt", "README.md"]

# Public-knowledge allowlists. Everything the code may import/read/dial.
# Only TLD-rooted package imports can name an external (possibly
# non-public) artifact; session-local value imports (spark.implicits._)
# and the JDK/Apache/test roots are structurally public.
SUSPECT_IMPORT = re.compile(
    r"^\s*import\s+(?:com|net|io|ai|co|dev|cloud|internal)\.")
# JDK-bundled and Spark-classpath-bundled public roots
ALLOWED_IMPORT = re.compile(r"^\s*import\s+(?:com\.sun|com\.fasterxml\.jackson)\b")
# dotless hosts (http://h) and RFC-2606 reserved TLDs are test fakes
PUBLIC_URL_HOST = re.compile(
    r"https?://(?:[\w-]+|[\w.-]+\.(?:test|invalid|example|localhost)|"
    r"localhost|127\.0\.0\.1|(?:[\w.-]+\.)?(?:apache\.org|"
    r"example\.com|example\.org|github\.com|scala-lang\.org|scalatest\.org|"
    r"w3\.org|duckdb\.org|ietf\.org|wikipedia\.org|arxiv\.org|"
    # the reference's own public demo API (simple_pipeline default endpoint)
    r"jsonplaceholder\.typicode\.com))(?:[:/]|$)")
URL = re.compile(r"https?://[\w.-]+")
BUCKET = re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://([\w.-]+)")
# placeholder buckets used in docs/specs are fine
PUBLIC_BUCKET = re.compile(r"^(?:my-|example|bucket|test|some-|<)")
API_KEY = re.compile(
    r"AKIA[0-9A-Z]{16}|(?:api[_-]?key|secret|token)\s*[:=]\s*['\"][A-Za-z0-9+/_-]{24,}")
ENV_READ = re.compile(r'sys\.env(?:\.get(?:OrElse)?)?\(\s*"([A-Z0-9_]+)"')
PUBLIC_ENV = re.compile(r"^(?:SPARK_|GRAFT_|PATH$|HOME$|USER$|TMPDIR$|TZ$|JAVA_)")

PATTERNS = ["non-public-import", "non-public-url", "bucket-uri",
            "api-key-shape", "non-public-env"]


def files():
    for entry in SCAN:
        p = os.path.join(ROOT, entry)
        if os.path.isfile(p):
            yield p
        elif os.path.isdir(p):
            for d, _, fs in os.walk(p):
                for f in fs:
                    if f.endswith((".scala", ".sbt", ".py", ".md", ".toml",
                                   ".json", ".conf", ".properties")):
                        yield os.path.join(d, f)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else None
    hits = {k: [] for k in PATTERNS}
    n_files = n_bytes = 0
    for path in files():
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        n_files += 1
        n_bytes += len(text)
        for i, line in enumerate(text.splitlines(), 1):
            where = f"{rel}:{i}"
            if rel.endswith((".scala", ".sbt")) and SUSPECT_IMPORT.match(line) \
                    and not ALLOWED_IMPORT.match(line):
                hits["non-public-import"].append(f"{where} {line.strip()[:120]}")
            for u in URL.findall(line):
                if not PUBLIC_URL_HOST.match(u):
                    hits["non-public-url"].append(f"{where} {u[:120]}")
            for b in BUCKET.findall(line):
                if not PUBLIC_BUCKET.match(b):
                    hits["bucket-uri"].append(f"{where} {b[:120]}")
            if API_KEY.search(line):
                hits["api-key-shape"].append(f"{where} {line.strip()[:120]}")
            for v in ENV_READ.findall(line):
                if not PUBLIC_ENV.match(v):
                    hits["non-public-env"].append(f"{where} {v}")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    n_hits = sum(len(v) for v in hits.values())
    record = {
        "ran_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": sha,
        "scanned_files": n_files,
        "scanned_bytes": n_bytes,
        "patterns": PATTERNS,
        "n_hits": n_hits,
        "hits": hits,
    }
    print(json.dumps(record, indent=2)[:2000])
    print(f"== leakcheck: {n_hits} hits over {n_files} files ==")
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {out}")
    sys.exit(1 if n_hits else 0)


if __name__ == "__main__":
    main()

"""Regenerate the registry/test counts quoted in COVERAGE.md and
README.md from the actual sources (the counts drifted when maintained
by hand — run this after adding queries or tests).

Usage: python tools/gen_counts.py
"""

from __future__ import annotations

import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def main():
    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    n_q = len(REGISTRY)
    n_sql = sum(1 for _f, sql in REGISTRY.values() if sql is not None)
    n_rows_only = n_q - n_sql
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd="/root/repo").stdout
    m = re.search(r"(\d+) tests collected", collected)
    n_tests = int(m.group(1)) if m else 0

    cov = open("/root/repo/COVERAGE.md").read()
    cov = re.sub(
        r"\*\*Registry totals: \d+ queries — \d+ with exact SQL twins, "
        r"\d+ rows-only",
        f"**Registry totals: {n_q} queries — {n_sql} with exact SQL twins, "
        f"{n_rows_only} rows-only",
        cov)
    open("/root/repo/COVERAGE.md", "w").write(cov)

    rd = open("/root/repo/README.md").read()
    rd = re.sub(
        r"\d+ tests green; \d+ driver-facing queries \(\d+ with bit-exact "
        r"DuckDB\n  SQL twins, \d+ approximate/rows-only",
        f"{n_tests} tests green; {n_q} driver-facing queries ({n_sql} with "
        f"bit-exact DuckDB\n  SQL twins, {n_rows_only} approximate/rows-only",
        rd)
    open("/root/repo/README.md", "w").write(rd)

    sk = "/root/repo/.claude/skills/verify/SKILL.md"
    t = open(sk).read()
    t = re.sub(
        r"As of round (\d+): \d+ queries, \d+ with SQL twins, \d+ rows-only; "
        r"full pytest\nsuite is \d+ tests",
        lambda m: (f"As of round {m.group(1)}: {n_q} queries, {n_sql} with "
                   f"SQL twins, {n_rows_only} rows-only; full pytest\n"
                   f"suite is {n_tests} tests"),
        t)
    open(sk, "w").write(t)
    print(f"queries={n_q} sql_twins={n_sql} rows_only={n_rows_only} "
          f"tests={n_tests}")


if __name__ == "__main__":
    main()

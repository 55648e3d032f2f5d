"""Regenerate PERF.md's headline table from BENCH_FULL.json.

Run after every `bench.py` pass:

    python tools/regen_perf.py

Rewrites the `## Headline benchmark` table (rows in bench.HEADLINE
order) and the "Total: **X**s for N queries" sentence in place.  The
plan-audit table and all prose are left untouched.
`tests/test_catalog_cache.py` asserts the result stays consistent with
the live registry.
"""

from __future__ import annotations

import importlib.util
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    timings = full["queries"]
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    rows = "\n".join(
        f"| {q} | {timings[q]:.2f} |" for q in bench.HEADLINE if q in timings
    )
    perf_path = os.path.join(REPO, "PERF.md")
    perf = open(perf_path).read()
    head, rest = perf.split("## Headline benchmark", 1)
    intro, after = rest.split("| query | seconds |", 1)
    _old_table, tail = after.split("\n\n", 1)
    intro = re.sub(
        r"Total: \*\*[\d.]+s\*\* for \d+ queries",
        f"Total: **{full['value']:.2f}s** for {len(timings)} queries",
        intro,
    )
    open(perf_path, "w").write(
        head
        + "## Headline benchmark"
        + intro
        + "| query | seconds |\n|---|---|\n"
        + rows
        + "\n\n"
        + tail
    )
    print(f"PERF.md headline: {len(timings)} rows, total {full['value']:.2f}s")


if __name__ == "__main__":
    main()

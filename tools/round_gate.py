"""Round gate — ONE command that fails when a round is about to be
declared done while still owing process work (VERDICT r14 item 7).

    python tools/round_gate.py [--skip-plan-golden]

Checks, in order (each prints PASS/FAIL; exit 1 on any FAIL):

1. **Bench-drift adjudication is not owed.**  For the two latest
   `BENCH_r{N}.json` records: if `tools/bench_diff.py` finds
   DRIFT-SLOWER rows, PERF.md must carry a
   `### Drift-slower follow-up (round <N+1>)` section adjudicating
   them (the r13→r14 bucket was left owing exactly this record —
   VERDICT r14 item 2; this gate makes that impossible to repeat).
2. **Stale-stamp invariants.**  From CORRECTNESS_r01..rN + the live
   registry: every never-driver-checked query is inside the 50-entry
   window or on the explicit DEFERRED queue (the same invariant
   tests/test_oracle_parity.py pins, re-checked here without Spark);
   DEFERRED stays within its 12-slot cap so next round's window keeps
   >= 38 stale re-check slots; and the oldest re-checkable stamp is
   reported so the rotation comment in registry.py can be verified by
   eye.
3. **Plan-drift golden.**  Runs
   `pytest tests/test_plans.py::test_plan_audit_golden_no_drift`
   (rebuilds every registered query's physical plan and fails on
   shuffles-up / broadcasts-down / pushdown-down vs PERF.md's table).
   Skippable with --skip-plan-golden when the full pytest suite (which
   contains the same test) just ran.

Driver-facing artifacts (BENCH/CORRECTNESS) are produced per-round by
the driver; this gate only READS them — it never mutates state.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFERRED_CAP = 12
WINDOW = 50


def _latest_bench_rounds() -> tuple[int, int] | None:
    rounds = sorted(
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    )
    if len(rounds) < 2:
        return None
    return rounds[-2], rounds[-1]


def check_bench_adjudication() -> list[str]:
    pair = _latest_bench_rounds()
    if pair is None:
        return []
    a, b = pair
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_diff.py"), f"r{a}", f"r{b}"],
        capture_output=True,
        text=True,
    )
    if proc.returncode == 0:
        return []
    # drift-slower rows exist: the doctrine says PERF.md owes a
    # follow-up adjudication section written in the round AFTER the
    # drifted bench (round b+1), naming its bucket.
    # The heading and the bucket mention may sit on different lines —
    # match the whole section body (heading up to the next heading of
    # EQUAL-OR-HIGHER level or EOF; a #### subheading stays inside the
    # body) with DOTALL so formatting can't fail a legitimately
    # recorded adjudication (ADVICE r15 + round-16 review).
    perf = open(os.path.join(REPO, "PERF.md")).read()
    section = re.search(
        rf"### Drift-slower follow-up \(round {b + 1}\)(.*?)(?=\n#{{1,3}} |\Z)",
        perf,
        re.DOTALL,
    )
    if section and re.search(rf"r{a}\s*(→|->)\s*r?{b}", section.group(1)):
        return []
    err = proc.stderr.strip()
    return [
        f"bench_diff r{a} r{b} flags DRIFT-SLOWER rows ({err.splitlines()[-1] if err else 'see tool output'}) "
        f"but PERF.md has no '### Drift-slower follow-up (round {b + 1})' section "
        f"adjudicating the r{a}→r{b} bucket"
    ]


def check_stamp_invariants() -> list[str]:
    sys.path.insert(0, REPO)
    from spark_nifi_kafka_connected_device_stream_spark import registry

    problems: list[str] = []
    specs = registry.all_specs()
    names = list(specs)
    window = set(names[:WINDOW])

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            latest[name] = rnd

    never = [n for n in names if n not in latest]
    stranded = [n for n in never if n not in window and n not in registry.DEFERRED]
    if stranded:
        problems.append(
            f"{len(stranded)} never-driver-checked queries are neither in the "
            f"50-entry window nor on DEFERRED: {stranded[:5]}"
        )
    if len(registry.DEFERRED) > DEFERRED_CAP:
        problems.append(
            f"DEFERRED holds {len(registry.DEFERRED)} names (cap {DEFERRED_CAP}: "
            f"next round's window must keep {WINDOW - DEFERRED_CAP} stale re-check slots)"
        )
    ghost = [n for n in registry.DEFERRED if n not in specs]
    if ghost:
        problems.append(f"DEFERRED names not in the registry: {ghost}")

    stamped = {n: r for n, r in latest.items() if n in specs}
    if stamped:
        oldest = min(stamped.values())
        cohort = sorted(n for n, r in stamped.items() if r == oldest)
        print(
            f"  oldest re-checkable stamp: r{oldest} "
            f"({len(cohort)} queries, e.g. {cohort[:3]})"
        )
    return problems


def check_plan_golden() -> list[str]:
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_plans.py::test_plan_audit_golden_no_drift",
            "-q",
            "--no-header",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if proc.returncode == 0:
        return []
    tail = "\n".join((proc.stdout or proc.stderr).splitlines()[-15:])
    return [f"plan-drift golden failed:\n{tail}"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-plan-golden", action="store_true")
    args = ap.parse_args()

    failures: list[str] = []
    for title, fn in (
        ("bench-drift adjudication", check_bench_adjudication),
        ("stale-stamp invariants", check_stamp_invariants),
        ("plan-drift golden", None if args.skip_plan_golden else check_plan_golden),
    ):
        if fn is None:
            print(f"SKIP  {title}")
            continue
        probs = fn()
        print(("PASS  " if not probs else "FAIL  ") + title)
        failures.extend(probs)
    for p in failures:
        print(f"  - {p}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

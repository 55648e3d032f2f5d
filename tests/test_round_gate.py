"""Round-gate enforcement inside the suite (VERDICT r15 item 8):
rotation/adjudication debt fails `pytest tests/` itself instead of
relying on the builder remembering to run the tool.

The plan-golden check is skipped here because the suite already runs
the same test directly (tests/test_plans.py::test_plan_audit_golden_
no_drift) — shelling it twice would double the most expensive test.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_round_gate_invariants_hold():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "round_gate.py"), "--skip-plan-golden"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"round gate failed:\n{proc.stdout}\n{proc.stderr}"
    )

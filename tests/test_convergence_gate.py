"""Opt-in convergence gates (slow: ~10 min each on CPU).

Run with SPECFORGE_RUN_CONVERGENCE=1 — mirroring the reference's env-gated
live gates (SPECFORGE_RUN_SERVER_CAPTURE_TESTS, .github/workflows/test.yaml:72-84).
The gate itself is scripts/gates/convergence_gate.py; measured pass numbers
are recorded in STATUS.md (eagle3: eval/simulated_acc_len 0.063 → 1.265
over 256 steps; exported accept length 3.72/4.0 vs 1.0 untrained).
"""

import json
import os
import subprocess
import sys

import pytest

RUN = os.environ.get("SPECFORGE_RUN_CONVERGENCE") == "1"
REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.skipif(not RUN, reason="set SPECFORGE_RUN_CONVERGENCE=1")
@pytest.mark.parametrize(
    "algorithm", ["eagle3", "domino", "dspark", "dflash", "peagle"]
)
def test_convergence_gate(tmp_path, algorithm):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "gates", "convergence_gate.py"),
         "--workdir", str(tmp_path), "--algorithm", algorithm],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["status"] == "pass"
    assert verdict["climbed"]

"""Always-on convergence smoke: the default suite proves the framework
still LEARNS, not just that it compiles.

Scaled-down eagle3 convergence gate (--smoke: ~190-sequence Markov corpus,
200-step target, 2-epoch draft train, climb-metric only — ~60-90 s on CPU)
asserting ``eval/simulated_acc_len`` climbs >= 2x during training. The full
five-family gates with the export/serving-accept legs stay opt-in behind
SPECFORGE_RUN_CONVERGENCE=1 (test_convergence_gate.py); this test has NO
env flag, so a silent math regression cannot ship on a green suite.

Mirrors the reference CI's always-on numerics gate
(/root/reference/.github/workflows/test.yaml:72-84).
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_eagle3_convergence_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # under xdist the suite's other workers contend for every core; cap
    # this gate's thread fan-out and give it slack (measured ~50 s alone,
    # can balloon >30x when xdist workers churn heavy tests alongside)
    env.setdefault("OMP_NUM_THREADS", "8")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "gates", "convergence_gate.py"),
         "--workdir", str(tmp_path), "--algorithm", "eagle3", "--smoke"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["status"] == "pass"
    assert verdict["smoke"]
    assert verdict["climbed"]
    # the climb is the learning proof: last eval acc_len >= 2x the first
    assert verdict["last"] >= 2.0 * verdict["first"]

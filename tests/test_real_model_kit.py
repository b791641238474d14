"""Real-model readiness kit: the one-command capture→train→export→accept
pipeline must run end-to-end on the built-in tiny proxy (--smoke), leaving
every stage marker and a REPORT.json with grid cells.

The kit is the runnable form of the BASELINE Δ≤2% north star (reference
docs/benchmarks/eagle3-disaggregated-parity.md): when real weights and
hardware appear, the same command with --target-model/--data/--reference-
accept produces the verdict. This test keeps the pipeline from rotting
until then.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_kit_smoke_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "real_model_kit.py"),
         "--workdir", str(tmp_path), "--smoke"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for stage in ("capture", "train", "export", "accept"):
        assert (tmp_path / f".{stage}_complete").exists(), stage
    report = json.loads((tmp_path / "REPORT.json").read_text())
    assert report["cells"], "accept grid produced no cells"
    assert report["best_accept"] is not None
    # resume: a second invocation must skip every completed stage fast
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "real_model_kit.py"),
         "--workdir", str(tmp_path), "--smoke"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "[kit:capture]" not in proc2.stderr

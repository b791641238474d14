"""Metric trackers behind one ``log(metrics, step)`` seam.

Reference: specforge/tracker.py:75-360 (wandb/tensorboard/swanlab/mlflow/no-op
family with secret redaction). Here: no-op, stdout, JSONL (always available),
plus wandb/tensorboard adapters that activate only when their packages exist.
"""

from __future__ import annotations

import json
import logging
import os
import re
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger("specforge_tpu.tracking")

_SECRET_RE = re.compile(r"(key|token|secret|password)", re.IGNORECASE)


def redact_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively mask values under secret-looking keys before logging."""
    def _walk(obj):
        if isinstance(obj, dict):
            return {
                k: ("<redacted>" if _SECRET_RE.search(str(k)) else _walk(v))
                for k, v in obj.items()
            }
        if isinstance(obj, (list, tuple)):
            return [_walk(v) for v in obj]
        return obj

    return _walk(config)


class Tracker:
    def log(self, metrics: Dict[str, float], step: int) -> None: ...

    def log_config(self, config: Dict[str, Any]) -> None: ...

    def finish(self) -> None: ...


class NoOpTracker(Tracker):
    pass


class StdoutTracker(Tracker):
    def log(self, metrics, step):
        short = {k: round(float(v), 6) for k, v in sorted(metrics.items())}
        logger.info("step %d: %s", step, short)


class JsonlTracker(Tracker):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, metrics, step):
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(record) + "\n")

    def log_config(self, config):
        self._f.write(json.dumps({"config": redact_config(config)}) + "\n")

    def finish(self):
        self._f.close()


class TensorBoardTracker(Tracker):
    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # optional dep

        self.writer = SummaryWriter(log_dir)

    def log(self, metrics, step):
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), step)

    def finish(self):
        self.writer.close()


class WandbTracker(Tracker):
    def __init__(self, project: str, run_name: Optional[str] = None, **kwargs):
        import wandb  # optional dep

        self.run = wandb.init(project=project, name=run_name, **kwargs)

    def log(self, metrics, step):
        self.run.log(metrics, step=step)

    def log_config(self, config):
        self.run.config.update(redact_config(config))

    def finish(self):
        self.run.finish()


class MlflowTracker(Tracker):
    """mlflow backend (reference tracker family, tracker.py:75-360)."""

    def __init__(self, experiment: str, run_id: str):
        import mlflow  # noqa: F401 — availability probe

        self._mlflow = mlflow
        mlflow.set_experiment(experiment)
        self._run = mlflow.start_run(run_name=run_id)

    def log(self, metrics, step):
        self._mlflow.log_metrics(
            {k.replace("/", "."): float(v) for k, v in metrics.items()},
            step=step,
        )

    def log_config(self, config):
        flat = {}

        def _walk(obj, prefix=""):
            if isinstance(obj, dict):
                for k, v in obj.items():
                    _walk(v, f"{prefix}{k}.")
            else:
                flat[prefix[:-1]] = str(obj)

        _walk(redact_config(config))
        self._mlflow.log_params(flat)

    def finish(self):
        self._mlflow.end_run()


class SwanlabTracker(Tracker):
    """swanlab backend (reference tracker family, tracker.py:75-360)."""

    def __init__(self, project: str, run_id: str):
        import swanlab

        self._run = swanlab.init(project=project, experiment_name=run_id)

    def log(self, metrics, step):
        self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_config(self, config):
        self._run.config.update(redact_config(config))

    def finish(self):
        self._run.finish()


class MultiTracker(Tracker):
    def __init__(self, trackers: List[Tracker]):
        self.trackers = trackers

    def log(self, metrics, step):
        for t in self.trackers:
            t.log(metrics, step)

    def log_config(self, config):
        for t in self.trackers:
            t.log_config(config)

    def finish(self):
        for t in self.trackers:
            t.finish()


def build_tracker(
    backend: str = "none",
    *,
    output_dir: str = ".",
    run_id: str = "run",
    project: Optional[str] = None,
) -> Tracker:
    """'none' | 'stdout' | 'jsonl' | 'tensorboard' | 'wandb' (comma-combinable)."""
    trackers: List[Tracker] = []
    for name in backend.split(","):
        name = name.strip()
        if name in ("", "none"):
            continue
        if name == "stdout":
            trackers.append(StdoutTracker())
        elif name == "jsonl":
            trackers.append(
                JsonlTracker(os.path.join(output_dir, f"{run_id}.metrics.jsonl"))
            )
        elif name == "tensorboard":
            try:
                trackers.append(
                    TensorBoardTracker(os.path.join(output_dir, "tb", run_id))
                )
            except ImportError:
                logger.warning("tensorboard unavailable; skipping tracker")
        elif name == "wandb":
            try:
                trackers.append(WandbTracker(project or "specforge-tpu", run_id))
            except ImportError:
                logger.warning("wandb unavailable; skipping tracker")
        elif name == "mlflow":
            try:
                trackers.append(
                    MlflowTracker(project or "specforge-tpu", run_id)
                )
            except ImportError:
                logger.warning("mlflow unavailable; skipping tracker")
        elif name == "swanlab":
            try:
                trackers.append(
                    SwanlabTracker(project or "specforge-tpu", run_id)
                )
            except ImportError:
                logger.warning("swanlab unavailable; skipping tracker")
        else:
            raise ValueError(f"unknown tracker backend {name!r}")
    if not trackers:
        return NoOpTracker()
    if len(trackers) == 1:
        return trackers[0]
    return MultiTracker(trackers)

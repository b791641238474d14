"""Checkpoint manager: Orbax state + a validated resume contract.

Layout mirrors the reference (training/checkpoint.py:35-, trainer.py:280-412):

    {output_dir}/{run_id}-step{N}/state/        — orbax pytree (params, buffers,
                                                  opt_state, step)
    {output_dir}/{run_id}-step{N}/contract.json — resume contract + progress
    {output_dir}/{run_id}.latest                — step number of newest save
    {output_dir}/{run_id}.best_meta.json        — best eval metric + step

Resume validates a full contract — strategy, world size, batch/accum/total
steps, model fingerprints — and refuses silently-divergent resumes. Rotation
keeps ``max_checkpoints`` newest, never deleting the best.

Multi-host: every process participates in the orbax array save/restore (each
host writes the shards it owns), but all metadata writes — contract.json,
latest marker, best meta, rotation — are gated on the primary process, the
role of the reference's rank0-broadcast checkpoint decisions
(training/controller.py:817-828). ``barrier_fn`` syncs the hosts around the
directory lifecycle on a shared filesystem.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

BEST_METRIC_DEFAULT = "eval/simulated_acc_len"


@dataclass(frozen=True)
class ResumeContract:
    """Everything that must match between the saving and resuming runs."""

    strategy: str
    world_size: int
    train_batch_size: int
    accum_steps: int
    total_steps: int
    run_id: str
    draft_config_fingerprint: str = ""
    model_fingerprints: Dict[str, str] = field(default_factory=dict)
    step_options: Dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, obj: Dict[str, Any]) -> "ResumeContract":
        return cls(**{f.name: obj[f.name] for f in dataclasses.fields(cls)
                      if f.name in obj})

    def validate_against(
        self, saved: "ResumeContract", *, ignore: Tuple[str, ...] = ()
    ) -> None:
        mismatches: List[str] = []
        for f in dataclasses.fields(self):
            if f.name in ignore:
                continue
            mine, theirs = getattr(self, f.name), getattr(saved, f.name)
            if mine != theirs:
                mismatches.append(f"{f.name}: saved={theirs!r} current={mine!r}")
        if mismatches:
            raise ValueError(
                "resume contract mismatch — refusing to resume:\n  "
                + "\n  ".join(mismatches)
            )


@dataclass
class Progress:
    """Mid-epoch position, persisted in SAMPLES so resume is batch-size
    independent (controller contract)."""

    epoch: int = 0
    samples_consumed: int = 0
    global_step: int = 0

    def to_json(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, obj):
        return cls(**obj)


class CheckpointManager:
    def __init__(
        self,
        output_dir: str,
        run_id: str,
        *,
        max_checkpoints: int = 5,
        best_metric: str = BEST_METRIC_DEFAULT,
        best_mode: str = "max",
        primary: bool = True,
        barrier_fn: Optional[Callable[[str], None]] = None,
    ) -> None:
        self.output_dir = os.path.abspath(output_dir)
        self.run_id = run_id
        self.max_checkpoints = max_checkpoints
        self.best_metric = best_metric
        self.best_mode = best_mode
        self.primary = primary
        self._barrier = barrier_fn or (lambda name: None)
        if primary:
            os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # --- paths ----------------------------------------------------------
    def step_dir(self, step: int) -> str:
        return os.path.join(self.output_dir, f"{self.run_id}-step{step}")

    def _latest_marker(self) -> str:
        return os.path.join(self.output_dir, f"{self.run_id}.latest")

    def _best_meta_path(self) -> str:
        return os.path.join(self.output_dir, f"{self.run_id}.best_meta.json")

    # --- save -----------------------------------------------------------
    def save(
        self,
        state,
        step: int,
        contract: ResumeContract,
        progress: Progress,
        metrics: Optional[Dict[str, float]] = None,
    ) -> str:
        step_dir = self.step_dir(step)
        state_dir = os.path.join(step_dir, "state")
        if self.primary:
            if os.path.exists(step_dir):
                shutil.rmtree(step_dir)
            os.makedirs(step_dir, exist_ok=True)
        self._barrier(f"ckpt-pre-{step}")
        # every process participates: orbax writes each host's addressable
        # shards (single-process: plain save of the device arrays)
        self._ckptr.save(state_dir, state)
        self._ckptr.wait_until_finished()
        if self.primary:
            payload = {
                "contract": contract.to_json(),
                "progress": progress.to_json(),
                "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            }
            tmp = os.path.join(step_dir, "contract.json.tmp")
            with open(tmp, "w") as f:
                json.dump(payload, f, indent=2)
            os.replace(tmp, os.path.join(step_dir, "contract.json"))
            with open(self._latest_marker() + ".tmp", "w") as f:
                f.write(str(step))
            os.replace(self._latest_marker() + ".tmp", self._latest_marker())
            self._rotate()
        self._barrier(f"ckpt-post-{step}")
        return step_dir

    def _existing_steps(self) -> List[int]:
        steps = []
        prefix = f"{self.run_id}-step"
        for name in os.listdir(self.output_dir):
            if name.startswith(prefix):
                tail = name[len(prefix):]
                if tail.isdigit():
                    steps.append(int(tail))
        return sorted(steps)

    def _rotate(self) -> None:
        if self.max_checkpoints <= 0:
            return
        steps = self._existing_steps()
        best_step = self.best_step()
        removable = [s for s in steps if s != best_step]
        while len(steps) > self.max_checkpoints and removable:
            victim = removable.pop(0)
            steps.remove(victim)
            shutil.rmtree(self.step_dir(victim), ignore_errors=True)

    # --- best tracking --------------------------------------------------
    def best_step(self) -> Optional[int]:
        try:
            with open(self._best_meta_path()) as f:
                return int(json.load(f)["step"])
        except (FileNotFoundError, KeyError, ValueError):
            return None

    def maybe_update_best(self, step: int, metrics: Dict[str, float]) -> bool:
        """Record ``step`` as best if its metric beats the stored one."""
        if not self.primary or self.best_metric not in metrics:
            return False
        value = float(metrics[self.best_metric])
        current: Optional[float] = None
        try:
            with open(self._best_meta_path()) as f:
                current = float(json.load(f)["value"])
        except (FileNotFoundError, KeyError, ValueError):
            pass
        better = (
            current is None
            or (self.best_mode == "max" and value > current)
            or (self.best_mode == "min" and value < current)
        )
        if better:
            tmp = self._best_meta_path() + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"step": step, "metric": self.best_metric, "value": value},
                    f,
                )
            os.replace(tmp, self._best_meta_path())
        return better

    # --- restore --------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        try:
            with open(self._latest_marker()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            steps = self._existing_steps()
            return steps[-1] if steps else None

    def read_saved_contract(
        self, step: int
    ) -> Tuple[ResumeContract, Progress, Dict[str, float]]:
        with open(os.path.join(self.step_dir(step), "contract.json")) as f:
            payload = json.load(f)
        return (
            ResumeContract.from_json(payload["contract"]),
            Progress.from_json(payload["progress"]),
            payload.get("metrics", {}),
        )

    @staticmethod
    def resolve_step_dir(checkpoint: str) -> str:
        """An explicit checkpoint target → its step dir: accepts a step dir
        (contains ``state/``) or a run root with exactly ONE run's
        ``*.latest`` marker — the reference's resume_from path forms
        (schema.py:568). A root holding several runs is ambiguous and
        refused (point at the step dir instead): picking one by directory
        order would silently restore a different run per filesystem.

        Returns an ABSOLUTE path: orbax's metadata reader silently yields
        ``item_metadata=None`` for relative directories, which would fail
        export/resume with a relative --checkpoint."""
        checkpoint = os.path.abspath(checkpoint)
        if os.path.isdir(os.path.join(checkpoint, "state")):
            return checkpoint
        resolved = []
        for marker in sorted(os.listdir(checkpoint)):
            if not marker.endswith(".latest"):
                continue
            run_id = marker[: -len(".latest")]
            with open(os.path.join(checkpoint, marker)) as f:
                step = int(f.read().strip())
            step_dir = os.path.join(checkpoint, f"{run_id}-step{step}")
            if os.path.isdir(step_dir):
                resolved.append(step_dir)
        if len(resolved) > 1:
            raise ValueError(
                f"{checkpoint} holds {len(resolved)} runs "
                f"({', '.join(os.path.basename(d) for d in resolved)}); "
                "point at one step dir explicitly"
            )
        if resolved:
            return resolved[0]
        raise FileNotFoundError(
            f"no checkpoint under {checkpoint} (expected a step dir with "
            "state/ or a run root with a .latest marker)"
        )

    def restore_path(
        self,
        step_dir: str,
        state_template,
        contract: Optional[ResumeContract] = None,
    ):
        """Restore from an explicit step dir (training.resume_from); same
        contract validation as :meth:`restore`."""
        with open(os.path.join(step_dir, "contract.json")) as f:
            payload = json.load(f)
        saved_contract = ResumeContract.from_json(payload["contract"])
        progress = Progress.from_json(payload["progress"])
        if contract is not None:
            # cross-run resume: the run identity may legitimately differ,
            # everything else (strategy/topology/schedule/provenance) must
            # still match
            contract.validate_against(saved_contract, ignore=("run_id",))
        state = self._ckptr.restore(
            os.path.join(step_dir, "state"), state_template
        )
        return state, progress, payload.get("metrics", {})

    def restore(
        self,
        step: int,
        state_template,
        contract: Optional[ResumeContract] = None,
    ):
        """Restore state (shaped/sharded like ``state_template``); validate the
        resume contract when provided."""
        saved_contract, progress, metrics = self.read_saved_contract(step)
        if contract is not None:
            contract.validate_against(saved_contract)
        state = self._ckptr.restore(
            os.path.join(self.step_dir(step), "state"), state_template
        )
        return state, progress, metrics

"""Trainer: lifecycle orchestration around the jitted train step.

Composes loader → accumulation grouping → device placement (mesh sharding) →
train step → logging/eval/checkpointing, with mid-epoch seek/resume, durable
ack at optimizer boundaries, and perf telemetry — the TrainerController role
(specforge/training/controller.py:482-887) with TrainerCore already compiled
into :func:`specforge_tpu.training.train_step.make_train_step`.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from specforge_tpu.eval.evaluator import Evaluator
from specforge_tpu.parallel.mesh import batch_sharding
from specforge_tpu.runtime.contracts import TrainBatch
from specforge_tpu.training.checkpoint import (
    CheckpointManager,
    Progress,
    ResumeContract,
)
from specforge_tpu.training.optimizer import (
    OptimizerConfig,
    build_lr_schedule,
    build_optimizer,
)
from specforge_tpu.training.profiling import PerfCounters, ProfilingConfig, StepProfiler
from specforge_tpu.training.strategies import DraftTrainStrategy
from specforge_tpu.training.tracking import NoOpTracker, Tracker
from specforge_tpu.training.train_step import TrainState, make_train_step

logger = logging.getLogger("specforge_tpu.trainer")


@dataclass
class TrainerConfig:
    num_epochs: int = 1
    accum_steps: int = 1
    #: gradient storage dtype between bwd and the optimizer ("bfloat16"
    #: halves grad HBM — the reference's bf16 mixed-precision grads)
    grads_dtype: str = "float32"
    #: cast fp32 masters to this dtype once per micro-step (barriered)
    #: instead of per use site — see make_train_step(compute_params_dtype)
    compute_params_dtype: Optional[str] = None
    log_interval: int = 10
    eval_interval: int = 0          # optimizer steps; 0 = end of epoch only
    checkpoint_interval: int = 0    # optimizer steps; 0 = end of epoch only
    max_checkpoints: int = 5
    output_dir: str = "runs"
    run_id: str = "run"
    resume: bool = False
    #: explicit resume target (step dir or run root) — full restore under
    #: the resume contract (reference trainer.py:104,281).
    resume_from: Optional[str] = None
    total_steps: Optional[int] = None  # resolved from data when None
    profiling: ProfilingConfig = field(default_factory=ProfilingConfig)


class Trainer:
    def __init__(
        self,
        strategy: DraftTrainStrategy,
        *,
        variables: Dict[str, Any],
        train_loader,
        config: TrainerConfig,
        optimizer_config: OptimizerConfig,
        eval_loader=None,
        frozen: Optional[Dict[str, Any]] = None,
        mesh=None,
        tracker: Optional[Tracker] = None,
        trainable_mask=None,
        metadata: Optional[Dict[str, Any]] = None,
        ack_fn: Optional[Callable[[List[str], int], None]] = None,
        world_size: int = 1,
        seq_sharded: bool = False,
        contract_fingerprints: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.strategy = strategy
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.config = config
        self.frozen = dict(frozen or {})
        self.mesh = mesh
        self.tracker = tracker or NoOpTracker()
        self.metadata = dict(metadata or {})
        self.ack_fn = ack_fn
        self.world_size = world_size
        self.contract_fingerprints = dict(contract_fingerprints or {})
        self._procs = jax.process_count()
        self._primary = jax.process_index() == 0
        if self._procs > 1 and mesh is None:
            raise ValueError("multi-process training requires a mesh")
        self._row_blocks = None
        if self._procs > 1:
            from specforge_tpu.parallel.multihost import process_batch_blocks

            self._row_blocks = process_batch_blocks(mesh)

        if config.total_steps is None:
            try:
                per_epoch = len(train_loader) // config.accum_steps
            except TypeError as e:
                raise ValueError(
                    "total_steps must be given for streaming loaders"
                ) from e
            config.total_steps = per_epoch * config.num_epochs
        self.total_steps = config.total_steps

        sparse_plan = None
        if optimizer_config.row_sparse_embedding:
            from specforge_tpu.training.train_step import SparseEmbedPlan

            path = getattr(strategy, "sparse_embed_path", None)
            shape_fn = getattr(strategy, "sparse_embed_delta_shape", None)
            if path is None or shape_fn is None:
                raise ValueError(
                    "optimizer.row_sparse_embedding requires a strategy that "
                    "declares sparse_embed_path and sparse_embed_delta_shape "
                    f"(strategy {getattr(strategy, 'name', strategy)!r} does "
                    "not)"
                )
            sparse_plan = SparseEmbedPlan(
                path, shape_fn,
                optimizer_config,
                build_lr_schedule(optimizer_config, self.total_steps),
            )
        self.tx = build_optimizer(
            optimizer_config, self.total_steps,
            include_clip=sparse_plan is None,
        )
        self.lr_schedule = build_lr_schedule(optimizer_config, self.total_steps)
        self.state = TrainState.create(
            variables["params"], variables.get("buffers", {}), self.tx,
            trainable_mask=trainable_mask,
            sparse_embed_path=sparse_plan.path if sparse_plan else None,
        )
        if self.mesh is not None:
            # commit non-fsdp-sharded leaves (buffers, step, frozen tables)
            # to an explicitly replicated mesh sharding: multi-host jit
            # rejects single-device-committed inputs, and resume templates
            # must carry global shardings
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())

            def _commit(x):
                s = getattr(x, "sharding", None)
                if isinstance(s, NamedSharding) and s.mesh.shape == dict(
                    self.mesh.shape
                ):
                    return x  # already mesh-sharded (params / opt moments)
                return jax.device_put(x, rep)

            put_rep = lambda t: jax.tree_util.tree_map(_commit, t)  # noqa: E731
            self.state = jax.tree_util.tree_map(_commit, self.state)
            self.frozen = put_rep(self.frozen)
        self.train_step = make_train_step(
            strategy,
            self.tx,
            accum_steps=config.accum_steps,
            total_steps=self.total_steps,
            metadata=self.metadata,
            lr_schedule=self.lr_schedule,
            trainable_mask=trainable_mask,
            grads_dtype=config.grads_dtype,
            compute_params_dtype=config.compute_params_dtype,
            sparse_embed=sparse_plan,
        )
        from specforge_tpu.parallel.multihost import barrier as mh_barrier

        self.checkpoints = CheckpointManager(
            config.output_dir,
            config.run_id,
            max_checkpoints=config.max_checkpoints,
            primary=self._primary,
            barrier_fn=mh_barrier,
        )
        self.evaluator = Evaluator(
            strategy, self.metadata,
            device_put_fn=(
                self._device_put_eval_batch if self._procs > 1 else None
            ),
        )
        self.profiler = StepProfiler(config.profiling, config.run_id)
        self.progress = Progress()
        self._batch_sharding = (
            batch_sharding(self.mesh, seq_axis_sharded=seq_sharded)
            if self.mesh is not None
            else None
        )
        self._eval_batch_sharding = (
            batch_sharding(
                self.mesh, seq_axis_sharded=seq_sharded, leading_accum=False
            )
            if self.mesh is not None
            else None
        )

    # --- contract --------------------------------------------------------
    def resume_contract(self) -> ResumeContract:
        return ResumeContract(
            strategy=self.strategy.name,
            world_size=self.world_size,
            train_batch_size=getattr(self.train_loader, "batch_size", 0),
            accum_steps=self.config.accum_steps,
            total_steps=self.total_steps,
            run_id=self.config.run_id,
            draft_config_fingerprint=self.contract_fingerprints.get(
                "draft_config_fingerprint", ""
            ),
            model_fingerprints=self.contract_fingerprints.get(
                "model_fingerprints", {}
            ),
        )

    # --- device placement ------------------------------------------------
    def _global_array(self, local: np.ndarray, sharding, batch_dim: int):
        """Assemble a global array from this host's batch-row block.

        Each host holds only its own batch rows (full sequences); the
        callback serves each addressable device shard by translating global
        batch indices to local ones. Sequence-axis shards (USP) slice out of
        the locally-full sequence — the TPU-native process_data_usp."""
        first, mine, total = self._row_blocks
        local = np.asarray(local)
        rows_local = local.shape[batch_dim]
        per_block, rem = divmod(rows_local, mine)
        if rem:
            raise ValueError(
                f"local batch {rows_local} not divisible by {mine} "
                "owned batch blocks"
            )
        offset = first * per_block
        global_shape = (
            local.shape[:batch_dim]
            + (per_block * total,)
            + local.shape[batch_dim + 1:]
        )

        def cb(index):
            idx = list(index)
            sl = idx[batch_dim]
            start = (sl.start or 0) - offset
            stop = (
                sl.stop if sl.stop is not None else global_shape[batch_dim]
            ) - offset
            idx[batch_dim] = slice(start, stop)
            return local[tuple(idx)]

        return jax.make_array_from_callback(global_shape, sharding, cb)

    def _device_put_batch(self, stacked: Dict[str, np.ndarray]):
        if self._procs > 1:
            return {
                k: self._global_array(v, self._batch_sharding, batch_dim=1)
                for k, v in stacked.items()
            }
        if self._batch_sharding is None:
            return {k: jax.device_put(v) for k, v in stacked.items()}
        out = {}
        for k, v in stacked.items():
            try:
                out[k] = jax.device_put(v, self._batch_sharding)
            except ValueError:
                out[k] = jax.device_put(v)  # non-divisible: replicate
        return out

    def _device_put_eval_batch(self, tensors: Dict[str, np.ndarray]):
        return {
            k: self._global_array(v, self._eval_batch_sharding, batch_dim=0)
            for k, v in tensors.items()
        }

    def _accum_groups(self, loader) -> Iterable[tuple]:
        """Group ``accum_steps`` consecutive TrainBatch into one [A, B, ...]
        stacked host batch; a trailing partial window is dropped (validated
        up-front by the schedule)."""
        window: List[TrainBatch] = []
        for batch in loader:
            window.append(batch)
            if len(window) == self.config.accum_steps:
                stacked = {
                    k: np.stack([b.tensors[k] for b in window])
                    for k in window[0].tensors
                }
                sample_ids = [sid for b in window for sid in b.sample_ids]
                metadata = window[0].metadata
                # metadata is trace-static: silently dropping a divergent
                # per-batch value would compile the wrong step (W8)
                for b in window[1:]:
                    if b.metadata != metadata:
                        raise ValueError(
                            "mixed metadata inside one accumulation window: "
                            f"{metadata} vs {b.metadata}"
                        )
                yield stacked, sample_ids, metadata
                window = []

    # --- main loop -------------------------------------------------------
    def fit(self) -> Dict[str, float]:
        cfg = self.config
        batch_size_hint = 0
        start_epoch = 0
        # this run's OWN latest checkpoint (when resume is on) wins over
        # resume_from: on a crash-relaunch of a resume_from config the run
        # must continue from its own progress, not rewind to the original
        # explicit checkpoint and overwrite completed work
        own_latest = self.checkpoints.latest_step() if cfg.resume else None
        if own_latest is not None:
            self._restore(own_latest)
            start_epoch = self.progress.epoch
        elif cfg.resume_from:
            step_dir = self.checkpoints.resolve_step_dir(cfg.resume_from)
            self._restore(step_dir=step_dir)
            start_epoch = self.progress.epoch

        perf = PerfCounters()
        last_metrics: Dict[str, float] = {}
        last_metrics_dev: Dict[str, Any] = {}
        try:
            for epoch in range(start_epoch, cfg.num_epochs):
                self.progress.epoch = epoch
                if getattr(self.train_loader, "supports_seek", False):
                    offset = (
                        self.progress.samples_consumed
                        if epoch == start_epoch
                        else 0
                    )
                    self.train_loader.seek(offset)
                if epoch != start_epoch:
                    self.progress.samples_consumed = 0

                data_t0 = time.monotonic()
                for stacked, sample_ids, metadata in self._accum_groups(
                    self.train_loader
                ):
                    perf.data_wait_s += time.monotonic() - data_t0
                    step = int(self.state.step)
                    self.profiler.on_step_begin(step)

                    t0 = time.monotonic()
                    batch = self._device_put_batch(stacked)
                    self.state, metrics_dev = self.train_step(
                        self.state, batch, self.frozen
                    )
                    perf.compute_s += time.monotonic() - t0

                    n_samples = len(sample_ids)
                    batch_size_hint = max(batch_size_hint, n_samples)
                    self.progress.samples_consumed += n_samples
                    self.progress.global_step = step + 1
                    perf.steps += 1
                    perf.samples += n_samples

                    self.profiler.on_step_end(step)
                    # metric arrays stay on device until a boundary needs
                    # them — no per-step host sync (host/device overlap)
                    last_metrics_dev = metrics_dev

                    new_step = step + 1
                    if cfg.log_interval and new_step % cfg.log_interval == 0:
                        last_metrics = self._pull_metrics(last_metrics_dev)
                        metrics = dict(last_metrics)
                        metrics.update(perf.window_metrics(n_samples))
                        self.tracker.log(metrics, new_step)
                        perf.reset()
                    if cfg.eval_interval and new_step % cfg.eval_interval == 0:
                        last_metrics = self._pull_metrics(last_metrics_dev)
                        last_metrics.update(self._evaluate(new_step))
                        last_metrics_dev = last_metrics
                    if (
                        cfg.checkpoint_interval
                        and new_step % cfg.checkpoint_interval == 0
                    ):
                        last_metrics = self._pull_metrics(last_metrics_dev)
                        self._save(new_step, batch_size_hint, last_metrics)
                    if self.ack_fn is not None:
                        # after the checkpoint block: durable acks must never
                        # run ahead of the restorable state
                        t0 = time.monotonic()
                        self.ack_fn(sample_ids, new_step)
                        perf.ack_s += time.monotonic() - t0
                    data_t0 = time.monotonic()

                # end of epoch: eval + checkpoint (progress records the NEXT
                # position so resume starts at the following epoch)
                last_metrics = self._pull_metrics(last_metrics_dev)
                eval_metrics = self._evaluate(int(self.state.step))
                last_metrics.update(eval_metrics)
                last_metrics_dev = last_metrics
                self.progress.epoch = epoch + 1
                self.progress.samples_consumed = 0
                self._save(int(self.state.step), batch_size_hint, last_metrics)
        finally:
            self.profiler.finalize()
        return last_metrics

    def _pull_metrics(self, metrics_dev: Dict[str, Any]) -> Dict[str, float]:
        if not metrics_dev:
            return {}
        if all(isinstance(v, float) for v in metrics_dev.values()):
            return dict(metrics_dev)
        return {k: float(v) for k, v in jax.device_get(metrics_dev).items()}

    # --- eval / checkpoint ----------------------------------------------
    def _evaluate(self, step: int) -> Dict[str, float]:
        if self.eval_loader is None:
            return {}
        variables = {"params": self.state.params, "buffers": self.state.buffers}
        metrics = self.evaluator.run(variables, self.eval_loader, self.frozen)
        if metrics:
            self.tracker.log(metrics, step)
        return metrics

    def _save(self, step: int, batch_size: int, metrics: Dict[str, float]):
        self.checkpoints.save(
            self.state, step, self.resume_contract(), self.progress, metrics
        )
        self.checkpoints.maybe_update_best(step, metrics)

    def _restore(
        self, step: Optional[int] = None, *, step_dir: Optional[str] = None
    ) -> None:
        # abstract template: orbax restores straight into each leaf's live
        # sharding (multi-host: each host reads only its shards)
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array)
            else np.asarray(x),
            self.state,
        )
        if step_dir is not None:
            state, progress, _metrics = self.checkpoints.restore_path(
                step_dir, template, contract=self.resume_contract()
            )
        else:
            state, progress, _metrics = self.checkpoints.restore(
                step, template, contract=self.resume_contract()
            )
        self.state = state
        self.progress = progress
        logger.info(
            "resumed %s at step %s (epoch %d, samples %d)",
            self.config.run_id,
            step if step_dir is None else step_dir,
            progress.epoch, progress.samples_consumed,
        )

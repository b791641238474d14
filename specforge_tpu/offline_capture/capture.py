"""Offline feature capture: target prefill → per-sample feature files.

The ``prepare_hidden_states`` equivalent (reference
scripts/prepare_hidden_states.py:87-937 + offline_capture/sglang.py:22): runs
the frozen target model's prefill on TPU over the tokenized dataset, captures
the algorithm's feature layout (EAGLE-family: 3-layer aux concat +
``target`` = post-norm last hidden; DFlash-family: N-layer concat as
``hidden_states`` + ``target_last_hidden_states``), and writes one ``.sft``
per sample. Batches are padded to a static ``max_length`` so one compiled
forward serves the whole corpus; features are trimmed back to true length
before writing.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
    stack_moe_expert_params,
    target_capture_forward,
)
from specforge_tpu.runtime.data_plane.feature_file import save_feature_file

logger = logging.getLogger("specforge_tpu.capture")


@dataclass(frozen=True)
class OfflineCaptureConfig:
    target_model_path: str
    output_dir: str
    capture_layers: Tuple[int, ...]
    max_length: int = 2048
    batch_size: int = 4
    #: feature layout: eagle ("hidden_state"/"target") or dflash
    #: ("hidden_states"/"target_last_hidden_states")
    layout: str = "eagle"
    store_dtype: str = "bfloat16"


_LAYOUTS = {
    "eagle": ("hidden_state", "target"),
    "dflash": ("hidden_states", "target_last_hidden_states"),
}


def build_capture_mesh(n_devices: int = 0):
    """fsdp mesh over the first ``n_devices`` local devices (0 = all) —
    the capture-side mesh builder shared by prepare_hidden_states and the
    online capture server (per-server tp_size, ref schema.py:314)."""
    from specforge_tpu.parallel.mesh import MeshConfig, build_mesh

    n = n_devices or jax.device_count()
    if n > jax.device_count():
        raise ValueError(
            f"requested {n} capture devices, have {jax.device_count()}"
        )
    return build_mesh(MeshConfig(fsdp=n), devices=jax.devices()[:n])


class OfflineCaptureRunner:
    def __init__(
        self,
        config: OfflineCaptureConfig,
        *,
        target_config: Optional[TargetConfig] = None,
        target_params=None,
        mesh=None,
        moe_impl: Optional[str] = None,
        moe_capacity_factor: Optional[float] = None,
    ) -> None:
        """``mesh``: optional device mesh for multi-chip capture — target
        params shard over the ``fsdp`` axis (largest divisible dim; XLA
        inserts the all-gathers) so targets larger than one chip's HBM
        capture on a slice. The TPU-native answer to the reference keeping
        TP layers for its offline capture backend (SURVEY §2.8 row TP;
        sglang tp_size per capture server).

        ``moe_impl="ep"`` (requires ``mesh``): expert tables are stacked and
        kept sharded over the fsdp axis — no per-layer expert all-gather —
        and MoE outputs psum over ICI (reference EP knob: sglang_ep_size,
        ref schema.py:863-876). ``moe_capacity_factor`` bounds per-shard
        grouped-matmul rows; the runner aborts if any assignment overflows
        capacity (capture must be exact), so raise it on abort."""
        self.config = config
        if config.layout not in _LAYOUTS:
            raise ValueError(f"unknown layout {config.layout!r}")
        self.target_config = target_config or TargetConfig.from_file(
            config.target_model_path
        )
        self.params = (
            target_params
            if target_params is not None
            else load_target_params(config.target_model_path, self.target_config)
        )
        self.mesh = mesh
        self.moe_impl = moe_impl
        if moe_impl == "ep":
            if mesh is None:
                raise ValueError("moe_impl='ep' requires a device mesh")
            if self.target_config.num_experts <= 0:
                raise ValueError("moe_impl='ep' needs an MoE target")
        if mesh is not None:
            from specforge_tpu.parallel.mesh import shard_pytree_like_params

            if moe_impl == "ep":
                # place the expert tables ONCE (expert-dim sharded stacks);
                # only the non-expert remainder goes through the generic
                # fsdp sharding rule
                expert = {
                    k: v for k, v in self.params.items()
                    if ".mlp.experts." in k
                }
                rest = {
                    k: v for k, v in self.params.items() if k not in expert
                }
                rest = shard_pytree_like_params(rest, mesh)
                expert = stack_moe_expert_params(
                    expert, self.target_config, mesh
                )
                self.params = {**rest, **expert}
            else:
                self.params = shard_pytree_like_params(self.params, mesh)
        target_config = self.target_config
        layers = tuple(config.capture_layers)
        self._forward = jax.jit(
            lambda params, input_ids, attention_mask: target_capture_forward(
                params, target_config, input_ids, attention_mask, layers,
                moe_impl=moe_impl, moe_mesh=mesh,
                moe_capacity_factor=moe_capacity_factor,
            )
        )

    def _run_batch(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        aux, last, overflow = self._forward(
            self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask)
        )
        if self.moe_impl == "ep":
            dropped = int(overflow)
            if dropped:
                raise RuntimeError(
                    f"EP MoE capacity overflow: {dropped} expert assignments "
                    f"were not computed — capture would be inexact. Raise "
                    f"moe_capacity_factor (or use the default full capacity)."
                )
        return np.asarray(aux), np.asarray(last)

    def run(
        self,
        samples: Iterable[Dict[str, np.ndarray]],
        *,
        sample_ids: Optional[Sequence[str]] = None,
    ) -> List[str]:
        """``samples``: dicts with ``input_ids`` [S] and ``loss_mask`` [S].
        Returns written file paths."""
        cfg = self.config
        os.makedirs(cfg.output_dir, exist_ok=True)
        aux_name, last_name = _LAYOUTS[cfg.layout]
        store_dtype = (
            ml_dtypes.bfloat16 if cfg.store_dtype == "bfloat16"
            else np.dtype(cfg.store_dtype)
        )

        written: List[str] = []
        batch: List[Tuple[str, np.ndarray, np.ndarray]] = []
        counter = 0

        def flush():
            nonlocal batch
            if not batch:
                return
            n = len(batch)
            max_len = cfg.max_length
            ids = np.zeros((cfg.batch_size, max_len), np.int32)
            mask = np.zeros((cfg.batch_size, max_len), np.int32)
            for j, (_sid, s_ids, _lm) in enumerate(batch):
                L = min(len(s_ids), max_len)
                ids[j, :L] = s_ids[:L]
                mask[j, :L] = 1
            aux, last = self._run_batch(ids, mask)
            for j, (sid, s_ids, s_lm) in enumerate(batch):
                L = min(len(s_ids), max_len)
                tensors = {
                    "input_ids": np.asarray(s_ids[:L], np.int64),
                    "loss_mask": np.asarray(s_lm[:L], np.int64),
                    aux_name: aux[j, :L].astype(store_dtype),
                    last_name: last[j, :L].astype(store_dtype),
                }
                path = os.path.join(cfg.output_dir, f"{sid}.sft")
                save_feature_file(
                    path, tensors,
                    {
                        "target_repr": "hidden_state",
                        "capture_layers": ",".join(
                            str(i) for i in cfg.capture_layers
                        ),
                        "layout": cfg.layout,
                    },
                )
                written.append(path)
            batch = []

        for i, sample in enumerate(samples):
            sid = (
                sample_ids[i]
                if sample_ids is not None
                else f"sample-{counter:06d}"
            )
            counter += 1
            batch.append(
                (sid, np.asarray(sample["input_ids"]).reshape(-1),
                 np.asarray(sample["loss_mask"]).reshape(-1))
            )
            if len(batch) == cfg.batch_size:
                flush()
        flush()
        logger.info("captured %d samples into %s", len(written),
                    cfg.output_dir)
        return written

"""Typed run configuration.

One strict (``extra='forbid'``) pydantic schema with seven sections (model /
data / training / tracking / profiling / runtime / deployment) + run identity,
dotted-path overrides re-validated through the model — the reference contract
(specforge/config/schema.py:37-970) with the CUDA-specific topology fields
replaced by TPU mesh axes:

- ``training.dp_size`` / ``fsdp_size``      — data-parallel / ZeRO-sharded axes
  (``fsdp_size=0`` = all remaining devices, the common case).
- ``training.sp_ulysses_size`` / ``sp_ring_size`` — sequence-parallel axes for
  USP long-context EAGLE3 (batch size 1, offline).

Cross-field topology validation: online ⇒ disaggregated deployment; USP ⇒
offline + batch 1; P-EAGLE ⇒ batch 1.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Literal, Optional, Tuple

from pydantic import BaseModel, ConfigDict, Field, model_validator


class StrictModel(BaseModel):
    model_config = ConfigDict(extra="forbid")


class ModelConfig(StrictModel):
    #: HF-style target checkpoint dir (for the frozen head/embeddings) or None
    #: for synthetic/test runs supplying frozen arrays directly.
    target_model_path: Optional[str] = None
    #: draft config: path to a JSON file, or inline dict.
    draft_config_path: Optional[str] = None
    draft_config: Optional[Dict[str, Any]] = None
    #: warm-start draft weights (HF dir or specforge checkpoint).
    draft_checkpoint_path: Optional[str] = None
    #: t2d/d2t vocab-mapping file (.npz/.sft); derived for offline eagle3 when
    #: absent.
    vocab_mapping_path: Optional[str] = None
    #: capture-layer override (EAGLE: exactly 3 entries).
    aux_hidden_state_layer_ids: Optional[List[int]] = None
    lm_head_key: str = "lm_head.weight"
    embed_key: str = "model.embed_tokens.weight"
    #: activation/compute dtype for the draft (params stay fp32 masters);
    #: float32 is for parity gates and debugging.
    compute_dtype: Literal["bfloat16", "float32"] = "bfloat16"

    @model_validator(mode="after")
    def _one_draft_source(self):
        if self.draft_config_path and self.draft_config:
            raise ValueError(
                "model.draft_config_path and model.draft_config are exclusive"
            )
        return self


class DataConfig(StrictModel):
    #: offline feature dir (.sft / reference .ckpt files).
    train_data_path: Optional[str] = None
    eval_data_path: Optional[str] = None
    #: prompt file for online runs (JSONL conversations).
    prompt_path: Optional[str] = None
    max_length: int = Field(default=2048, gt=0)
    chat_template: Optional[str] = None
    #: supervise only the final assistant turn when tokenizing raw
    #: conversations (reference schema.py:143).
    train_only_last_turn: bool = False
    num_workers: int = Field(default=2, ge=0)
    prefetch_batches: int = Field(default=2, gt=0)
    #: COD sequence packing: pack ``docs_per_row`` short documents into each
    #: ``max_length`` row with a per-document ``lengths`` vector. Only valid
    #: for strategies that consume document boundaries (P-EAGLE).
    pack_documents: bool = False
    docs_per_row: int = Field(default=4, gt=0)


class TrackingConfig(StrictModel):
    backend: str = "jsonl"  # none|stdout|jsonl|tensorboard|wandb (comma-join)
    project: Optional[str] = None


class ProfilingSection(StrictModel):
    enabled: bool = False
    start_step: int = Field(default=10, ge=0)
    num_steps: int = Field(default=5, gt=0)


class RuntimeConfig(StrictModel):
    #: feature-store backend for disaggregated runs.
    store_backend: Literal["memory", "shared_dir", "network"] = "memory"
    store_dir: Optional[str] = None
    control_dir: Optional[str] = None
    max_resident_bytes: Optional[int] = None
    #: producer flow control watermarks (refs in flight).
    flow_high_watermark: int = Field(default=256, gt=0)
    flow_low_watermark: int = Field(default=128, ge=0)
    #: network store endpoint (host:port) for the DCN feature service.
    store_endpoint: Optional[str] = None
    #: shared-secret auth for the network store (None = or env
    #: SPECFORGE_STORE_SECRET; redacted from rendered plans/logs).
    store_secret: Optional[str] = None
    #: batched capture prefill: prompts per /generate_batch request (1 =
    #: per-request capture) and the token budget per batch
    #: (ref TargetBatchPartition, inference/batch_partition.py:20).
    capture_batch_size: int = Field(default=8, gt=0)
    capture_batch_tokens: int = Field(default=8192, gt=0)
    #: rank-0 HTTP inbox relay for multi-host online consumers WITHOUT a
    #: shared control filesystem: the primary serves its per-rank inboxes +
    #: accepts routed acks on inbox_server_port; remote ranks point
    #: inbox_server_url at it (ref http_inbox relay, launch.py:1432-).
    inbox_server_port: int = Field(default=0, ge=0)
    inbox_server_url: Optional[str] = None


class ManagedLocalStackConfig(StrictModel):
    """Opt-in ownership of a complete single-node online capture stack —
    the reference ManagedLocalStackConfig (schema.py:333) re-shaped for TPU:
    chips replace CUDA device lists, the C++ feature store replaces
    mooncake_master, and the JAX capture server replaces patched SGLang."""

    #: feature-store byte budget (0 = unlimited) and readiness timeout.
    store_max_bytes: int = Field(default=0, ge=0)
    readiness_timeout_s: float = Field(default=120.0, gt=0)
    #: SIGTERM-to-SIGKILL grace for stack teardown; must cover checkpoint
    #: flush + store drain in the workers.
    shutdown_grace_s: float = Field(default=30.0, gt=0)
    #: capture-layer override for the spawned servers (EAGLE: 3 entries).
    capture_layers: Optional[List[int]] = None
    #: max_length for the spawned capture servers.
    capture_max_length: int = Field(default=2048, gt=0)
    #: shard each spawned capture server's target over N local devices
    #: (0 = all local devices, 1 = single-device) — the per-server tp_size
    #: of the reference (ref schema.py:314); targets larger than one
    #: chip's HBM need this online just like offline capture does.
    capture_shard_devices: int = Field(default=1, ge=0)
    #: MoE path for the spawned servers' targets; "ep" keeps expert tables
    #: sharded over the capture mesh (ref sglang_ep_size, schema.py:863).
    capture_moe_impl: Optional[Literal["dense", "gathered", "ep"]] = None
    #: EP per-shard row budget multiplier (None = full capacity).
    capture_moe_capacity_factor: Optional[float] = Field(default=None, gt=0)

    @model_validator(mode="after")
    def _validate_capture_moe(self):
        if self.capture_moe_impl == "ep" and self.capture_shard_devices == 1:
            raise ValueError(
                "capture_moe_impl='ep' needs capture_shard_devices != 1 "
                "(expert tables shard over the capture mesh)"
            )
        return self


class DeploymentConfig(StrictModel):
    mode: Literal["colocated", "disaggregated"] = "colocated"
    #: capture-server URLs for online producers.
    server_urls: List[str] = Field(default_factory=list)
    num_producer_workers: int = Field(default=1, gt=0)
    #: plain-supervisor teardown grace (managed stacks use
    #: managed_local.shutdown_grace_s).
    shutdown_grace_s: float = Field(default=30.0, gt=0)
    managed_local: Optional[ManagedLocalStackConfig] = None

    @model_validator(mode="after")
    def _validate_urls(self):
        from urllib.parse import urlsplit

        seen = set()
        for url in self.server_urls:
            parts = urlsplit(url)
            if parts.scheme not in ("http", "https"):
                raise ValueError(
                    f"deployment.server_urls entries must be http(s) URLs, "
                    f"got {url!r}"
                )
            try:
                port = parts.port
            except ValueError as exc:
                raise ValueError(
                    f"deployment.server_urls entry {url!r}: {exc}"
                ) from exc
            if port is None:
                raise ValueError(
                    f"deployment.server_urls entries must carry an explicit "
                    f"port, got {url!r}"
                )
            if url in seen:
                raise ValueError(f"duplicate capture server URL {url!r}")
            seen.add(url)
        return self


class TrainingConfig(StrictModel):
    strategy: str = "eagle3"
    num_epochs: int = Field(default=1, gt=0)
    total_steps: Optional[int] = Field(default=None, gt=0)
    batch_size: int = Field(default=1, gt=0)
    accumulation_steps: int = Field(default=1, gt=0)
    learning_rate: float = Field(default=1e-4, gt=0.0)
    weight_decay: float = Field(default=0.0, ge=0.0)
    lr_scheduler: Literal["cosine", "constant"] = "cosine"
    warmup_ratio: float = Field(default=0.015, ge=0.0, le=1.0)
    max_grad_norm: float = Field(default=0.5, gt=0.0)
    adam_b1: float = Field(default=0.9, ge=0.0, lt=1.0)
    adam_b2: float = Field(default=0.999, ge=0.0, lt=1.0)
    #: dtype of the Adam moments; "bfloat16" halves optimizer-state HBM.
    moments_dtype: Literal["float32", "bfloat16"] = "float32"
    #: gradient storage/accumulation dtype; "bfloat16" halves gradient HBM
    #: (the reference's FSDP bf16 mixed precision produces bf16 grads and
    #: the BF16Optimizer copies them into fp32 masters).
    grads_dtype: Literal["float32", "bfloat16"] = "float32"
    #: when set, fp32 master params are cast to this dtype once per
    #: micro-step (behind an optimization barrier) instead of per use site,
    #: so matmuls read materialized low-precision weights rather than
    #: stalling the MXU on fused fp32 converts; costs params-sized live
    #: memory in this dtype. Forward numerics unchanged; wgrad precision
    #: becomes the grads_dtype=bfloat16 class.
    compute_params_dtype: Optional[Literal["bfloat16"]] = None
    #: Adafactor-style rank-1 second moments for large matrices (O(r+c)
    #: state instead of O(r*c)); with adam_b1=0 the first moment is dropped
    #: too — lets a 152k-vocab P-EAGLE draft (trainable embeddings) fit a
    #: single chip's HBM.
    factored_second_moments: bool = False
    #: row-sparse embedding update (P-EAGLE trainable embeddings): per-token
    #: row grads + scatter update instead of a dense [V, H] gradient/master
    #: pass. Requires factored_second_moments, adam_b1=0, weight_decay=0;
    #: bit-equivalent to the dense update under that regime.
    row_sparse_embedding: bool = False
    seed: int = 42

    # --- TPU mesh topology ---
    dp_size: int = Field(default=1, gt=0)
    #: 0 = all devices not claimed by other axes (the default ZeRO layout).
    fsdp_size: int = Field(default=0, ge=0)
    sp_ulysses_size: int = Field(default=1, gt=0)
    sp_ring_size: int = Field(default=1, gt=0)

    # --- EAGLE3 ---
    ttt_length: int = Field(default=7, gt=0)
    ploss_decay: float = 0.8
    lk_loss_type: Optional[Literal["lambda", "alpha"]] = None
    kl_scale: float = 1.0
    kl_decay: float = 1.0
    compact_teacher: bool = False
    compact_teacher_chunk_size: int = Field(default=32768, gt=0)
    attention_backend: Literal["dense", "pallas", "usp"] = "dense"

    # --- DFlash family ---
    num_anchors: int = Field(default=512, gt=0)
    loss_decay_gamma: Optional[float] = None
    objective_chunk_blocks: int = Field(default=128, ge=0)
    # fused frozen-head CE with forward-computed input gradients (DFlash
    # family); disable only for debugging against the checkpointed path
    fused_vocab_objective: bool = True
    loss_type: Literal[
        "dflash", "dpace", "dpace-cumulative-confidence-only",
        "dpace-continuation-value-only",
    ] = "dflash"
    dpace_alpha: float = 0.5
    lambda_base_start: float = 1.0
    lambda_base_decay_ratio: float = 0.5
    dspark_ce_loss_alpha: float = 0.1
    dspark_l1_loss_alpha: float = 0.9
    dspark_confidence_head_alpha: float = 1.0
    mask_token_id: Optional[int] = None

    # --- P-EAGLE ---
    num_depths: int = Field(default=8, gt=0)
    down_sample_ratio: float = 0.8
    down_sample_ratio_min: float = 0.2

    # --- intervals / checkpoints ---
    save_interval: int = Field(default=0, ge=0)
    eval_interval: int = Field(default=0, ge=0)
    log_interval: int = Field(default=50, gt=0)
    max_checkpoints: int = Field(default=5, ge=0)
    resume: bool = False
    #: full resume from an EXPLICIT checkpoint (a step dir or a run root
    #: with a .latest marker) — possibly another run's output. Restores
    #: optimizer/progress under the resume contract, unlike
    #: model.draft_checkpoint_path which warm-starts weights only
    #: (reference schema.py:568-569, :43).
    resume_from: Optional[str] = None
    role: Literal["auto", "all", "producer", "consumer"] = "all"

    @model_validator(mode="after")
    def _validate(self):
        if not 0.0 <= self.dpace_alpha <= 1.0:
            raise ValueError("training.dpace_alpha must be in [0, 1]")
        if not 0.0 < self.down_sample_ratio <= 1.0:
            raise ValueError("training.down_sample_ratio must be in (0, 1]")
        if not 0.0 < self.down_sample_ratio_min <= self.down_sample_ratio:
            raise ValueError(
                "training.down_sample_ratio_min must be in "
                "(0, training.down_sample_ratio]"
            )
        sp = self.sp_ulysses_size * self.sp_ring_size
        if self.attention_backend == "usp":
            if self.batch_size != 1:
                raise ValueError("USP requires training.batch_size=1")
            if sp <= 1:
                raise ValueError(
                    "USP requires sp_ulysses_size * sp_ring_size > 1"
                )
        elif sp != 1:
            raise ValueError(
                "sp_ulysses_size/sp_ring_size require attention_backend=usp"
            )
        if self.resume_from is not None and self.role == "producer":
            raise ValueError(
                "training.resume_from is valid only for a trainer role"
            )
        return self


class Config(StrictModel):
    run_id: str = "run"
    output_dir: str = "runs"
    model: ModelConfig = Field(default_factory=ModelConfig)
    data: DataConfig = Field(default_factory=DataConfig)
    training: TrainingConfig = Field(default_factory=TrainingConfig)
    tracking: TrackingConfig = Field(default_factory=TrackingConfig)
    profiling: ProfilingSection = Field(default_factory=ProfilingSection)
    runtime: RuntimeConfig = Field(default_factory=RuntimeConfig)
    deployment: DeploymentConfig = Field(default_factory=DeploymentConfig)

    @model_validator(mode="after")
    def _cross_validate(self):
        online = bool(self.deployment.server_urls) or (
            self.training.role in ("producer", "consumer")
        )
        if online and self.deployment.mode != "disaggregated":
            raise ValueError(
                "online runs (server_urls / producer / consumer roles) "
                "require deployment.mode=disaggregated"
            )
        if (
            self.runtime.store_backend == "shared_dir"
            and not self.runtime.store_dir
        ):
            raise ValueError(
                "runtime.store_backend=shared_dir requires runtime.store_dir"
            )
        if (
            self.runtime.store_backend == "network"
            and not self.runtime.store_endpoint
        ):
            raise ValueError(
                "runtime.store_backend=network requires runtime.store_endpoint"
            )
        if (
            self.training.resume_from is not None
            and self.model.draft_checkpoint_path is not None
        ):
            raise ValueError(
                "model.draft_checkpoint_path (weights-only warm start) and "
                "training.resume_from (full resume) are mutually exclusive"
            )
        return self


def _parse_scalar(raw: str) -> Any:
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return raw


def apply_overrides(config: Config, overrides: List[str]) -> Config:
    """Apply ``a.b.c=value`` dotted overrides; the result re-validates."""
    data = config.model_dump()
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        key, raw = item.split("=", 1)
        parts = key.strip().split(".")
        node = data
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = {}
            node = node[part]
        node[parts[-1]] = _parse_scalar(raw)
    return Config.model_validate(data)


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    """Load YAML or JSON config + dotted overrides."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        data = yaml.safe_load(text) or {}
    else:
        data = json.loads(text)
    config = Config.model_validate(data)
    if overrides:
        config = apply_overrides(config, overrides)
    return config

"""Composition root: Config → runnable training run.

Resolves the algorithm registration, builds draft/training-model/strategy via
the providers, loads frozen target tables + vocab maps, wires loaders, mesh and
Trainer — the role of specforge/application/composition.py:33-149 +
training/assembly.py:568-660.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
from specforge_tpu.algorithms.contracts import FeatureMode
from specforge_tpu.algorithms.registry import AlgorithmRegistration
from specforge_tpu.config.schema import Config
from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
from specforge_tpu.parallel.mesh import MeshConfig, build_mesh, shard_pytree_like_params
from specforge_tpu.runtime.data_plane.feature_dataloader import FeatureDataLoader
from specforge_tpu.runtime.data_plane.feature_store import FileFeatureStore
from specforge_tpu.runtime.data_plane.offline_reader import OfflineManifestReader
from specforge_tpu.training.optimizer import (
    OptimizerConfig,
    cast_frozen_to,
    embedding_freeze_mask,
)
from specforge_tpu.training.profiling import ProfilingConfig
from specforge_tpu.training.trainer import Trainer, TrainerConfig
from specforge_tpu.training.tracking import build_tracker
from specforge_tpu.training.vocab_mapping import (
    derive_from_offline_dir,
    load_vocab_mapping,
    save_vocab_mapping,
)

logger = logging.getLogger("specforge_tpu.application")


@dataclass
class ResolvedRun:
    config: Config
    registration: AlgorithmRegistration
    draft_config_dict: Dict[str, Any]


def resolve_run(config: Config, registry=None) -> ResolvedRun:
    registry = registry or builtin_algorithm_registry()
    registration = registry.resolve(config.training.strategy)
    draft_config_dict = _load_draft_config_dict(config)
    arch = tuple(draft_config_dict.get("architectures") or ())
    if arch and not (
        set(arch) & registration.spec.draft.compatible_architectures
    ):
        logger.warning(
            "draft architectures %s not declared compatible with %s; "
            "building with the algorithm's default architecture",
            arch, registration.name,
        )
    return ResolvedRun(
        config=config,
        registration=registration,
        draft_config_dict=draft_config_dict,
    )


def _load_draft_config_dict(config: Config) -> Dict[str, Any]:
    if config.model.draft_config is not None:
        return dict(config.model.draft_config)
    if config.model.draft_config_path:
        with open(config.model.draft_config_path) as f:
            return json.load(f)
    raise ValueError(
        "model.draft_config or model.draft_config_path is required"
    )


def _strategy_options(config: Config) -> Dict[str, Any]:
    t = config.training
    return {
        # eagle3
        "ttt_length": t.ttt_length,
        "ploss_decay": t.ploss_decay,
        "lk_loss_type": t.lk_loss_type,
        "kl_scale": t.kl_scale,
        "kl_decay": t.kl_decay,
        "compact_teacher": t.compact_teacher,
        "compact_teacher_chunk_size": t.compact_teacher_chunk_size,
        # dflash family
        "num_anchors": t.num_anchors,
        "loss_decay_gamma": t.loss_decay_gamma,
        "objective_chunk_blocks": t.objective_chunk_blocks,
        "fused_vocab_objective": t.fused_vocab_objective,
        "loss_type": t.loss_type,
        "dpace_alpha": t.dpace_alpha,
        "lambda_start": t.lambda_base_start,
        "decay_ratio": t.lambda_base_decay_ratio,
        "dspark_ce_loss_alpha": t.dspark_ce_loss_alpha,
        "dspark_l1_loss_alpha": t.dspark_l1_loss_alpha,
        "dspark_confidence_head_alpha": t.dspark_confidence_head_alpha,
        "mask_token_id": t.mask_token_id,
        # peagle
        "num_depths": t.num_depths,
        "down_sample_ratio": t.down_sample_ratio,
        "down_sample_ratio_min": t.down_sample_ratio_min,
        "seed": t.seed,
    }


def _load_target_tables(config: Config, need_embed: bool):
    """Frozen target lm_head (+ embed) weights as bf16 jax arrays."""
    from specforge_tpu.models.target.head import TargetHead

    path = config.model.target_model_path
    if path is None:
        return {}
    frozen: Dict[str, jnp.ndarray] = {}
    head = TargetHead.from_pretrained(
        path, lm_head_key=config.model.lm_head_key
    )
    frozen["target_head_weight"] = head.weight
    if need_embed:
        embed = TargetHead.from_pretrained(
            path, lm_head_key=config.model.embed_key
        )
        frozen["target_embed_weight"] = embed.weight
    return frozen


def _resolve_vocab_mapping(config: Config, draft_config) -> Optional[tuple]:
    draft_vocab = getattr(draft_config, "draft_vocab_size", None)
    vocab = getattr(draft_config, "vocab_size", None)
    if not draft_vocab or draft_vocab >= (vocab or 0):
        return None
    if config.model.vocab_mapping_path:
        return load_vocab_mapping(config.model.vocab_mapping_path)
    if config.data.train_data_path:
        from specforge_tpu.parallel.multihost import (
            barrier,
            is_primary,
            process_count,
        )

        cache = os.path.join(
            config.output_dir, f"{config.run_id}.vocab_mapping.npz"
        )
        if process_count() <= 1:
            if os.path.exists(cache):
                return load_vocab_mapping(cache)
            logger.info("deriving vocab mapping from %s",
                        config.data.train_data_path)
            t2d, d2t = derive_from_offline_dir(
                config.data.train_data_path, vocab, draft_vocab
            )
            os.makedirs(config.output_dir, exist_ok=True)
            save_vocab_mapping(cache, t2d, d2t)
            return t2d, d2t
        # multi-host: primary derives + writes the shared cache; the barrier
        # is UNCONDITIONAL so every host executes the same collective
        # sequence regardless of cache-file timing (shared-FS assumption,
        # the reference's explicit-shared-file contract for disagg runs)
        if is_primary() and not os.path.exists(cache):
            logger.info("deriving vocab mapping from %s",
                        config.data.train_data_path)
            t2d, d2t = derive_from_offline_dir(
                config.data.train_data_path, vocab, draft_vocab
            )
            os.makedirs(config.output_dir, exist_ok=True)
            save_vocab_mapping(cache, t2d, d2t)
        barrier("vocab-mapping")
        return load_vocab_mapping(cache)
    return None


def _set_buffers(variables, t2d, d2t):
    buffers = variables.get("buffers")
    if not buffers:
        return variables
    # the draft lives under one submodule key carrying t2d/d2t
    for sub, vals in buffers.items():
        if "t2d" in vals:
            vals = dict(vals)
            vals["t2d"] = jnp.asarray(t2d)
            vals["d2t"] = jnp.asarray(d2t)
            buffers = {**buffers, sub: vals}
            return {**variables, "buffers": buffers}
    return variables


def _copy_target_embedding(variables, frozen):
    """EAGLE3 contract: the draft embedding is target-copied and frozen
    (modeling/draft/base.py:128-191)."""
    embed = frozen.get("target_embed_weight")
    if embed is None:
        return variables
    params = variables["params"]
    draft = params.get("draft_model")
    if draft and "embed_tokens" in draft:
        current = draft["embed_tokens"]["embedding"]
        if current.shape == embed.shape:
            draft = {
                **draft,
                "embed_tokens": {"embedding": jnp.asarray(embed, current.dtype)},
            }
            params = {**params, "draft_model": draft}
            return {**variables, "params": params}
    return variables


def build_training_run(config: Config, registry=None, frozen_override=None):
    """Build a fully wired offline/colocated Trainer (returns the Trainer)."""
    from specforge_tpu.parallel.multihost import (
        barrier,
        is_primary,
        maybe_initialize_distributed,
        process_count,
        shard_refs_for_process,
    )

    maybe_initialize_distributed()
    procs = process_count()
    primary = is_primary()
    resolved = resolve_run(config, registry)
    reg = resolved.registration
    providers = reg.providers
    t = config.training
    options = _strategy_options(config)

    # mesh first: the USP attention backend needs the mesh inside the model
    n_devices = jax.device_count()
    fsdp = t.fsdp_size or max(
        n_devices // (t.dp_size * t.sp_ulysses_size * t.sp_ring_size), 1
    )
    mesh_cfg = MeshConfig(
        dp=t.dp_size, fsdp=fsdp,
        sp_ulysses=t.sp_ulysses_size, sp_ring=t.sp_ring_size,
    )
    mesh = build_mesh(mesh_cfg) if mesh_cfg.world_size == n_devices else None
    use_usp = t.attention_backend == "usp"
    if use_usp:
        if mesh is None:
            raise ValueError(
                f"attention_backend=usp needs a full mesh: {mesh_cfg} vs "
                f"{n_devices} devices"
            )
        sp = t.sp_ulysses_size * t.sp_ring_size
        if config.data.max_length % sp != 0:
            raise ValueError(
                f"data.max_length={config.data.max_length} must be divisible "
                f"by sp_ulysses*sp_ring={sp} for USP"
            )

    compute_dtype = (
        jnp.float32
        if config.model.compute_dtype == "float32"
        else jnp.bfloat16
    )
    draft, draft_config = providers.build_draft(
        resolved.draft_config_dict, dtype=compute_dtype
    )
    if t.strategy == "eagle3" and t.attention_backend != "dense":
        draft = draft.clone(
            attention_backend=t.attention_backend,
            mesh=mesh if use_usp else None,
        )
    if options.get("mask_token_id") is None:
        options["mask_token_id"] = getattr(draft_config, "mask_token_id", 0)
    model = providers.build_training_model(draft, options)
    strategy = providers.build_strategy(model, options)

    rng = jax.random.PRNGKey(t.seed)
    variables = providers.init_variables(
        model, draft_config, options, rng, config.data.max_length
    )
    if config.model.draft_checkpoint_path:
        from specforge_tpu.training.model_loading import warm_start_draft

        variables = warm_start_draft(
            variables, config.model.draft_checkpoint_path
        )
        logger.info(
            "warm-started draft weights from %s",
            config.model.draft_checkpoint_path,
        )

    # eagle3/peagle need the target embedding once (the target-copied draft
    # embedding contract), dflash-family needs it every step.
    need_embed = (
        "target_embed_weight" in providers.frozen_requirements
        or t.strategy in ("eagle3", "peagle")
    )
    frozen = (
        frozen_override
        if frozen_override is not None
        else _load_target_tables(config, need_embed)
    )

    mapping = _resolve_vocab_mapping(config, draft_config)
    if mapping is not None:
        variables = _set_buffers(variables, *mapping)
    if t.strategy in ("eagle3", "peagle") and "target_embed_weight" in frozen:
        variables = _copy_target_embedding(variables, frozen)
        if "target_embed_weight" not in providers.frozen_requirements:
            # copied into params: don't carry the table through every step
            frozen = {
                k: v for k, v in frozen.items() if k != "target_embed_weight"
            }

    # frozen-embedding mask: eagle3 only (peagle trains embeddings)
    trainable_mask = None
    if t.strategy == "eagle3":
        trainable_mask = embedding_freeze_mask(variables["params"])
        variables = {
            **variables,
            "params": cast_frozen_to(
                variables["params"], trainable_mask, jnp.bfloat16
            ),
        }

    # shard params over the mesh (built above, before the draft clone)
    if mesh is not None:
        variables = {
            **variables,
            "params": shard_pytree_like_params(variables["params"], mesh),
        }

    # loaders — config batch_size is the GLOBAL per-micro-step batch; each
    # host loads only its own rows (ref launch.py:174-219 per-rank sharding)
    if not config.data.train_data_path:
        raise ValueError("data.train_data_path is required for offline runs")
    if procs > 1 and mesh is not None:
        from specforge_tpu.parallel.multihost import process_batch_blocks

        batch_devices = mesh.shape["dp"] * mesh.shape["fsdp"]
        if t.batch_size % batch_devices != 0:
            raise ValueError(
                f"training.batch_size={t.batch_size} (global) must be "
                f"divisible by dp*fsdp={batch_devices} devices"
            )
        _, my_blocks, total_blocks = process_batch_blocks(mesh)
        local_batch = (t.batch_size // total_blocks) * my_blocks
    elif procs > 1:
        if t.batch_size % procs != 0:
            raise ValueError(
                f"training.batch_size={t.batch_size} must be divisible by "
                f"{procs} processes"
            )
        local_batch = t.batch_size // procs
    else:
        local_batch = t.batch_size
    contract = reg.spec.contract_for(FeatureMode.OFFLINE)
    if config.data.pack_documents:
        if not getattr(strategy, "supports_packed_documents", False):
            raise ValueError(
                "data.pack_documents requires a strategy that consumes "
                f"document boundaries (P-EAGLE); {t.strategy!r} does not"
            )
        from specforge_tpu.data.collator import (
            PackingCollator,
            PackingCollatorConfig,
        )

        collate = PackingCollator(
            PackingCollatorConfig(
                max_length=config.data.max_length, rows=local_batch,
                max_docs_per_row=config.data.docs_per_row,
                cast_float_dtype="float32",
            )
        )
        loader_batch = local_batch * config.data.docs_per_row
    else:
        collate = PaddingCollator(
            CollatorConfig(
                max_length=config.data.max_length, cast_float_dtype="float32"
            )
        )
        loader_batch = local_batch
    metadata = {"target_repr": contract.target_representation}

    def make_loader(root):
        refs = OfflineManifestReader(root).read()
        refs = shard_refs_for_process(refs, t.batch_size, mesh=mesh)
        return FeatureDataLoader(
            FileFeatureStore(), collate, refs=refs,
            batch_size=loader_batch, num_workers=config.data.num_workers,
            prefetch_batches=config.data.prefetch_batches, metadata=metadata,
        )

    train_loader = make_loader(config.data.train_data_path)
    eval_loader = (
        make_loader(config.data.eval_data_path)
        if config.data.eval_data_path
        else None
    )

    # rank0-gated tracking: only the primary host writes metrics/markers
    tracker = (
        build_tracker(
            config.tracking.backend, output_dir=config.output_dir,
            run_id=config.run_id, project=config.tracking.project,
        )
        if primary
        else build_tracker("none")
    )
    trainer_config = TrainerConfig(
        num_epochs=t.num_epochs,
        accum_steps=t.accumulation_steps,
        grads_dtype=t.grads_dtype,
        compute_params_dtype=t.compute_params_dtype,
        log_interval=t.log_interval,
        eval_interval=t.eval_interval,
        checkpoint_interval=t.save_interval,
        max_checkpoints=t.max_checkpoints,
        output_dir=config.output_dir,
        run_id=config.run_id,
        resume=t.resume,
        resume_from=t.resume_from,
        total_steps=t.total_steps,
        profiling=ProfilingConfig(
            enabled=config.profiling.enabled,
            start_step=config.profiling.start_step,
            num_steps=config.profiling.num_steps,
            output_dir=os.path.join(config.output_dir, "profiles"),
        ),
    )
    optimizer_config = OptimizerConfig(
        lr=t.learning_rate,
        weight_decay=t.weight_decay,
        max_grad_norm=t.max_grad_norm,
        warmup_ratio=t.warmup_ratio,
        lr_scheduler=t.lr_scheduler,
        adam_b1=t.adam_b1,
        adam_b2=t.adam_b2,
        moments_dtype=t.moments_dtype,
        factored_second_moments=t.factored_second_moments,
        row_sparse_embedding=t.row_sparse_embedding,
    )
    from specforge_tpu.training.model_loading import (
        draft_config_fingerprint,
        frozen_input_fingerprint,
    )

    fingerprints = {
        "draft_config_fingerprint": draft_config_fingerprint(
            resolved.draft_config_dict
        ),
        "model_fingerprints": {
            "target": frozen_input_fingerprint(
                config.model.target_model_path
            ),
        },
    }
    return Trainer(
        strategy,
        variables=variables,
        train_loader=train_loader,
        eval_loader=eval_loader,
        config=trainer_config,
        optimizer_config=optimizer_config,
        frozen=frozen,
        mesh=mesh,
        tracker=tracker,
        trainable_mask=trainable_mask,
        metadata=metadata,
        world_size=procs,
        seq_sharded=use_usp,
        contract_fingerprints=fingerprints,
    )

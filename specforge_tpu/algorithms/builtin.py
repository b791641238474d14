"""Built-in algorithm registrations: eagle3, dflash, domino, dspark, peagle.

One registration per algorithm wiring spec + providers (reference:
specforge/algorithms/builtin.py + per-algorithm providers modules). The EAGLE3.1
variant is the eagle3 registration with ``fc_norm: true`` in the draft config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.algorithms.contracts import (
    AlgorithmCapabilities,
    AlgorithmSpec,
    DraftRequirement,
    FeatureContract,
    FeatureMode,
    OfflineStorageSchema,
)
from specforge_tpu.algorithms.providers import (
    AlgorithmProviders,
    ServerCaptureLayout,
    dflash_capture_layers,
    eagle_capture_layers,
    make_registration,
)

EAGLE_SERVER_CAPTURE = ServerCaptureLayout(
    name="eagle", aux_feature="hidden_state", last_hidden_feature="target",
)
DFLASH_SERVER_CAPTURE = ServerCaptureLayout(
    name="dflash", aux_feature="hidden_states",
    last_hidden_feature="target_last_hidden_states",
)
from specforge_tpu.algorithms.registry import AlgorithmRegistry


# --- eagle3 ----------------------------------------------------------------

def _eagle3_build_draft(config_dict: Dict[str, Any], dtype=jnp.bfloat16):
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )

    config = Eagle3Config.from_dict(config_dict)
    return LlamaEagle3Draft(config, dtype=dtype), config


def _eagle3_build_training_model(draft, options: Dict[str, Any]):
    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model

    return OnlineEagle3Model(
        draft_model=draft,
        length=int(options.get("ttt_length", 7)),
        lk_loss_type=options.get("lk_loss_type"),
        kl_scale=float(options.get("kl_scale", 1.0)),
        kl_decay=float(options.get("kl_decay", 1.0)),
        metric_reduce_axes=tuple(options.get("metric_reduce_axes", ())),
    )


def _eagle3_build_strategy(model, options: Dict[str, Any]):
    from specforge_tpu.training.strategies import Eagle3TrainStrategy

    return Eagle3TrainStrategy(
        model,
        ploss_decay=float(options.get("ploss_decay", 0.8)),
        compact_teacher=bool(options.get("compact_teacher", False)),
        compact_teacher_chunk_size=int(
            options.get("compact_teacher_chunk_size", 32768)
        ),
        freeze_embedding=bool(options.get("freeze_embedding", True)),
    )


def _eagle3_init(model, config, options, rng, max_length: int):
    dummy = (
        jnp.zeros((1, max_length), jnp.int32),
        jnp.ones((1, max_length), jnp.int32),
        jnp.ones((1, max_length, 1), jnp.int32),
        jnp.zeros(
            (1, max_length, 3 * config.resolved_target_hidden_size),
            jnp.float32,
        ),
        jnp.zeros((1, max_length, config.vocab_size), jnp.float32),
    )
    return model.init(rng, *dummy)


EAGLE3 = make_registration(
    AlgorithmSpec(
        name="eagle3",
        draft=DraftRequirement(
            compatible_architectures=frozenset({"LlamaForCausalLMEagle3",
                                                "LlamaEagle3Draft"}),
            default_architecture="LlamaEagle3Draft",
        ),
        feature_contracts=(
            FeatureContract(
                mode=FeatureMode.OFFLINE,
                required_features=frozenset(
                    {"input_ids", "loss_mask", "hidden_state", "target"}
                ),
                target_representation="hidden_state",
            ),
            FeatureContract(
                mode=FeatureMode.STREAMING,
                required_features=frozenset(
                    {"input_ids", "loss_mask", "hidden_state", "target"}
                ),
                target_representation="logits",
            ),
        ),
        offline_schema=OfflineStorageSchema(
            format="specforge_hidden_states_v1",
            feature_names=("input_ids", "loss_mask", "hidden_state", "target"),
            aux_feature="hidden_state",
            last_hidden_feature="target",
        ),
        capabilities=AlgorithmCapabilities(
            supports_compact_teacher=True,
            supports_vocab_mapping=True,
            supports_sequence_parallel=True,
        ),
    ),
    AlgorithmProviders(
        build_draft=_eagle3_build_draft,
        build_training_model=_eagle3_build_training_model,
        build_strategy=_eagle3_build_strategy,
        init_variables=_eagle3_init,
        resolve_capture_layers=lambda draft_config, n, override=None: (
            eagle_capture_layers(draft_config, n, override)
        ),
        frozen_requirements=frozenset({"target_head_weight"}),
        server_capture=EAGLE_SERVER_CAPTURE,
    ),
)


# --- dflash family ---------------------------------------------------------

def _dflash_build_draft(config_dict, dtype=jnp.bfloat16, cls=None):
    from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel

    config = DFlashConfig.from_dict(config_dict)
    model_cls = cls or DFlashDraftModel
    # "auto" (pallas on TPU for long contexts) | "chunked" (XLA) |
    # "pallas" (in-kernel-mask flash, ops/dflash_pallas.py)
    backend = config_dict.get("attention_backend", "auto")
    kwargs = {}
    if "attn_chunk_blocks" in config_dict:
        kwargs["attn_chunk_blocks"] = int(config_dict["attn_chunk_blocks"])
    return (
        model_cls(config, dtype=dtype, attention_backend=backend, **kwargs),
        config,
    )


def _dflash_family_training_model(wrapper_cls):
    def build(draft, options: Dict[str, Any]):
        kwargs = dict(
            draft_model=draft,
            mask_token_id=int(
                options.get("mask_token_id", draft.config.mask_token_id or 0)
            ),
            block_size=int(
                options.get("block_size", draft.config.block_size)
            ),
            num_anchors=int(options.get("num_anchors", 512)),
            loss_decay_gamma=options.get("loss_decay_gamma"),
            objective_chunk_blocks=int(
                options.get("objective_chunk_blocks", 128)
            ),
            fused_objective=bool(
                options.get("fused_vocab_objective", True)
            ),
        )
        from specforge_tpu.algorithms.common.dflash_family import (
            OnlineDFlashModel,
            OnlineDominoModel,
            OnlineDSparkModel,
        )

        if wrapper_cls is OnlineDFlashModel:
            kwargs["loss_type"] = options.get("loss_type", "dflash")
            kwargs["dpace_alpha"] = float(options.get("dpace_alpha", 0.5))
        if wrapper_cls is OnlineDominoModel:
            kwargs["shift_label"] = bool(
                options.get("shift_label", draft.config.shift_label)
            )
        if wrapper_cls is OnlineDSparkModel:
            kwargs["dspark_ce_loss_alpha"] = float(
                options.get("dspark_ce_loss_alpha", 0.1)
            )
            kwargs["dspark_l1_loss_alpha"] = float(
                options.get("dspark_l1_loss_alpha", 0.9)
            )
            kwargs["dspark_confidence_head_alpha"] = float(
                options.get("dspark_confidence_head_alpha", 1.0)
            )
        return wrapper_cls(**kwargs)

    return build


def _dflash_init(model, config, options, rng, max_length: int):
    n_capture = len(config.resolved_target_layer_ids)
    h = config.hidden_size
    v = config.vocab_size
    args = [
        jnp.zeros((1, max_length), jnp.int32),
        jnp.zeros((1, max_length, n_capture * h), jnp.float32),
        jnp.ones((1, max_length), jnp.int32),
        jnp.zeros((v, h), jnp.float32),
        jnp.zeros((v, h), jnp.float32),
        jax.random.PRNGKey(0),
    ]
    from specforge_tpu.algorithms.common.dflash_family import OnlineDSparkModel

    if isinstance(model, OnlineDSparkModel):
        args.append(jnp.zeros((1, max_length, h), jnp.float32))
    return model.init(rng, *args)


def _dflash_registration(name, draft_arch, wrapper_name, strategy_name,
                         extra_features=()):
    from specforge_tpu.algorithms.common import dflash_family
    from specforge_tpu.models.draft import dflash as dflash_mod
    from specforge_tpu.models.draft import domino as domino_mod
    from specforge_tpu.models.draft import dspark as dspark_mod

    draft_cls = {
        "DFlashDraftModel": dflash_mod.DFlashDraftModel,
        "DominoDraftModel": domino_mod.DominoDraftModel,
        "DSparkDraftModel": dspark_mod.DSparkDraftModel,
    }[draft_arch]
    wrapper_cls = getattr(dflash_family, wrapper_name)

    def build_strategy(model, options):
        from specforge_tpu.training import strategies

        cls = getattr(strategies, strategy_name)
        kwargs = {"seed": int(options.get("seed", 0))}
        if strategy_name == "DominoTrainStrategy":
            kwargs["lambda_start"] = float(options.get("lambda_start", 1.0))
            kwargs["decay_ratio"] = float(options.get("decay_ratio", 0.5))
        return cls(model, **kwargs)

    features = frozenset(
        {"input_ids", "loss_mask", "hidden_states", *extra_features}
    )
    return make_registration(
        AlgorithmSpec(
            name=name,
            draft=DraftRequirement(
                compatible_architectures=frozenset({draft_arch}),
                default_architecture=draft_arch,
            ),
            feature_contracts=(
                FeatureContract(
                    mode=FeatureMode.OFFLINE,
                    required_features=features,
                    target_representation="hidden_state",
                ),
                FeatureContract(
                    mode=FeatureMode.STREAMING,
                    required_features=features,
                    target_representation="hidden_state",
                ),
            ),
            offline_schema=OfflineStorageSchema(
                format="specforge_dflash_states_v1",
                feature_names=tuple(sorted(features)),
                aux_feature="hidden_states",
                last_hidden_feature=(
                    "target_last_hidden_states"
                    if "target_last_hidden_states" in features
                    else None
                ),
            ),
            capabilities=AlgorithmCapabilities(),
        ),
        AlgorithmProviders(
            build_draft=lambda cfg, dtype=jnp.bfloat16: _dflash_build_draft(
                cfg, dtype, cls=draft_cls
            ),
            build_training_model=_dflash_family_training_model(wrapper_cls),
            build_strategy=build_strategy,
            init_variables=_dflash_init,
            resolve_capture_layers=lambda draft_config, n, override=None: (
                dflash_capture_layers(draft_config, n, override)
            ),
            frozen_requirements=frozenset(
                {"target_head_weight", "target_embed_weight"}
            ),
            server_capture=DFLASH_SERVER_CAPTURE,
        ),
    )


# --- peagle ----------------------------------------------------------------

def _peagle_build_draft(config_dict, dtype=jnp.bfloat16):
    from specforge_tpu.models.draft.peagle import PEagleConfig, PEagleDraftModel

    config = PEagleConfig.from_dict(config_dict)
    # "auto" (pallas COD kernel on TPU at T >= 2048) | "dense" | "pallas"
    backend = config_dict.get("attention_backend", "auto")
    return PEagleDraftModel(
        config, dtype=dtype, attention_backend=backend
    ), config


def _peagle_build_training_model(draft, options):
    from specforge_tpu.algorithms.peagle.model import OnlinePEagleModel

    return OnlinePEagleModel(
        draft_model=draft,
        mask_token_id=int(options.get("mask_token_id", 0)),
        num_depths=int(options.get("num_depths", 8)),
        down_sample_ratio=float(options.get("down_sample_ratio", 0.7)),
        down_sample_ratio_min=float(options.get("down_sample_ratio_min", 0.2)),
    )


def _peagle_build_strategy(model, options):
    from specforge_tpu.training.strategies import PEagleTrainStrategy

    return PEagleTrainStrategy(model, seed=int(options.get("seed", 0)))


def _peagle_init(model, config, options, rng, max_length: int):
    args = (
        jnp.zeros((1, max_length), jnp.int32),
        jnp.ones((1, max_length), jnp.int32),
        jnp.zeros((1, max_length, config.vocab_size), jnp.float32),
        jnp.ones((1, max_length), jnp.int32),
        jnp.zeros(
            (1, max_length, 3 * config.resolved_target_hidden_size),
            jnp.float32,
        ),
        jax.random.PRNGKey(0),
    )
    return model.init(rng, *args)


PEAGLE = make_registration(
    AlgorithmSpec(
        name="peagle",
        draft=DraftRequirement(
            compatible_architectures=frozenset({"PEagleDraftModel"}),
            default_architecture="PEagleDraftModel",
        ),
        feature_contracts=(
            FeatureContract(
                mode=FeatureMode.OFFLINE,
                required_features=frozenset(
                    {"input_ids", "loss_mask", "hidden_state", "target"}
                ),
                target_representation="hidden_state",
            ),
            FeatureContract(
                mode=FeatureMode.STREAMING,
                required_features=frozenset(
                    {"input_ids", "loss_mask", "hidden_state", "target"}
                ),
                target_representation="logits",
            ),
        ),
        offline_schema=OfflineStorageSchema(
            format="specforge_hidden_states_v1",
            feature_names=("input_ids", "loss_mask", "hidden_state", "target"),
            aux_feature="hidden_state",
            last_hidden_feature="target",
        ),
        capabilities=AlgorithmCapabilities(
            supports_vocab_mapping=True, max_batch_size=1
        ),
    ),
    AlgorithmProviders(
        server_capture=EAGLE_SERVER_CAPTURE,
        build_draft=_peagle_build_draft,
        build_training_model=_peagle_build_training_model,
        build_strategy=_peagle_build_strategy,
        init_variables=_peagle_init,
        resolve_capture_layers=lambda draft_config, n, override=None: (
            eagle_capture_layers(draft_config, n, override)
        ),
        frozen_requirements=frozenset({"target_head_weight"}),
    ),
)


def builtin_algorithm_registry() -> AlgorithmRegistry:
    return AlgorithmRegistry(
        [
            EAGLE3,
            _dflash_registration(
                "dflash", "DFlashDraftModel", "OnlineDFlashModel",
                "DFlashTrainStrategy",
            ),
            _dflash_registration(
                "domino", "DominoDraftModel", "OnlineDominoModel",
                "DominoTrainStrategy",
            ),
            _dflash_registration(
                "dspark", "DSparkDraftModel", "OnlineDSparkModel",
                "DSparkTrainStrategy",
                extra_features=("target_last_hidden_states",),
            ),
            PEAGLE,
        ]
    )

"""Executable provider ports per algorithm.

Factories behind the pure contracts: draft construction, training-model
wrapping, strategy construction, flax-variable initialization, and capture-layer
resolution. Mirrors the provider/port split of
specforge/algorithms/common/providers.py:282-769 (the reference additionally
splits offline-data/server-streaming providers; here the data plane is
algorithm-agnostic and layout names come from the spec's offline schema).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp

from specforge_tpu.algorithms.contracts import AlgorithmSpec
from specforge_tpu.algorithms.registry import AlgorithmRegistration

BuildDraft = Callable[..., Tuple[Any, Any]]            # (cfg_dict, dtype) -> (module, config)
BuildTrainingModel = Callable[..., Any]                # (draft, options) -> module
BuildStrategy = Callable[..., Any]                     # (model, options) -> strategy
InitVariables = Callable[..., Dict[str, Any]]          # (model, config, options, rng, max_length) -> variables
ResolveCaptureLayers = Callable[..., Tuple[int, ...]]  # (draft_config, target_num_layers) -> layer ids


@dataclass(frozen=True)
class ServerCaptureLayout:
    """Per-algorithm mapping of capture-engine artifacts → feature names
    (the reference ServerStreamingProvider's ServerCaptureLayout,
    common/providers.py:282-655): the server writes the aux-layer concat and
    the post-norm last hidden under the names the algorithm's loader
    expects."""

    name: str                  # engine layout key ("eagle" | "dflash")
    aux_feature: str           # feature name of the aux-layer concat
    last_hidden_feature: str   # feature name of the post-norm last hidden
    extra_features: Tuple[str, ...] = ("input_ids", "loss_mask")

    @property
    def feature_names(self) -> FrozenSet[str]:
        return frozenset(
            (self.aux_feature, self.last_hidden_feature)
            + self.extra_features
        )


@dataclass(frozen=True)
class AlgorithmProviders:
    build_draft: BuildDraft
    build_training_model: BuildTrainingModel
    build_strategy: BuildStrategy
    init_variables: InitVariables
    resolve_capture_layers: ResolveCaptureLayers
    # frozen arrays the strategy reads from the `frozen` dict each step
    frozen_requirements: FrozenSet[str] = frozenset()
    # server-side capture artifact → feature-name mapping (None = offline-only)
    server_capture: Optional[ServerCaptureLayout] = None


def make_registration(
    spec: AlgorithmSpec, providers: AlgorithmProviders
) -> AlgorithmRegistration:
    return AlgorithmRegistration(spec=spec, providers=providers)


def eagle_capture_layers(
    draft_config: Any, target_num_layers: int,
    override: Optional[Tuple[int, ...]] = None,
) -> Tuple[int, ...]:
    """EAGLE-family: run override > draft eagle_config > [1, n//2-1, n-4]
    (reference model_providers.py:188-211)."""
    if override is not None:
        layers = tuple(override)
    else:
        eagle_cfg = getattr(draft_config, "eagle_config", None) or {}
        layers = tuple(
            eagle_cfg.get("eagle_aux_hidden_state_layer_ids") or ()
        )
        if not layers:
            n = int(target_num_layers)
            layers = (1, n // 2 - 1, n - 4)
    if len(layers) != 3 or any(l < 0 for l in layers):
        raise ValueError(
            f"EAGLE capture layers must be 3 non-negative ints, got {layers!r}"
        )
    return layers


def dflash_capture_layers(
    draft_config: Any, target_num_layers: int,
    override: Optional[Tuple[int, ...]] = None,
) -> Tuple[int, ...]:
    if override is not None:
        return tuple(override)
    return tuple(draft_config.resolved_target_layer_ids)

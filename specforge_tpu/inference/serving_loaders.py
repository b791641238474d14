"""Serving loaders: target + exported-draft reload into fused decoders.

The serving surface's composition helpers: load the target (HF safetensors,
no conversion), reload an exported draft through the one torch->flax mapper
(models/model_loading.py), pin/bf16 the trees (decoders device_put at
construction), and build the fused decoder. Shared by the benchmark grids
(benchmarks/accept_length.py re-exports for compatibility), the serving
gates, and the HTTP serving endpoint (serving_server_main.py).
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_spec_models(target_model_path: str, draft_export_dir: str):
    """Load the target + an exported draft ONCE — grid sweeps reuse the
    result across (draft_tokens, topk) cells instead of re-reading
    multi-GB checkpoints per cell."""
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    target_config = TargetConfig.from_file(target_model_path)
    target_params = load_target_params(target_model_path, target_config)
    # SGLang-layout exports drop the frozen target-copied embedding; restore
    # it from the target (the export contract's embedding_source rule).
    module, variables = load_exported_draft(
        draft_export_dir,
        fallback_embedding=np.asarray(
            target_params["model.embed_tokens.weight"], np.float32
        ),
    )
    return target_params, target_config, module, variables


def build_decoder(models, capture_layers=None, num_draft_tokens: int = 4,
                  max_len: int = 2048, mesh=None):
    from specforge_tpu.inference.spec_decode import Eagle3SpecDecoder

    target_params, target_config, module, variables = models
    if capture_layers is None:
        n = target_config.num_hidden_layers
        capture_layers = (1, n // 2 - 1, n - 4)
    return Eagle3SpecDecoder(
        target_params, target_config, module, variables,
        capture_layers=tuple(capture_layers),
        num_draft_tokens=num_draft_tokens, max_len=max_len, mesh=mesh,
    )


def load_exported_draft(export_dir: str, fallback_embedding=None):
    """Load an exported (HF/SGLang-layout) EAGLE3 draft into flax variables.

    ``fallback_embedding``: [V, H] used when the export omits the frozen
    embedding (the SGLang layout)."""
    import os

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )

    with open(os.path.join(export_dir, "config.json")) as f:
        config = Eagle3Config.from_dict(json.load(f))
    tensors = load_file(os.path.join(export_dir, "model.safetensors"))

    module = LlamaEagle3Draft(config, dtype=jnp.bfloat16)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8, 3 * config.resolved_target_hidden_size),
                  jnp.float32),
    )

    # one torch→flax mapper for the whole framework (handles kernel
    # transposes, layers.N naming, and folding split q/k/v (gate/up) back
    # into the merged qkv_proj/gate_up_proj kernels)
    from specforge_tpu.models.model_loading import _load_from_safetensors

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params, _ = _load_from_safetensors(
        os.path.join(export_dir, "model.safetensors"), params, {}
    )

    if "embed_tokens.weight" not in tensors:
        if fallback_embedding is None:
            raise ValueError(
                "export has no embedding and no fallback_embedding was given"
            )
        expected = params["embed_tokens"]["embedding"]
        fallback = np.asarray(fallback_embedding, np.float32)
        if fallback.shape != expected.shape:
            raise ValueError(
                f"fallback embedding shape {fallback.shape} vs model "
                f"{expected.shape}"
            )
        params["embed_tokens"]["embedding"] = fallback.astype(expected.dtype)

    buffers = dict(variables.get("buffers", {}))
    if "t2d" in tensors:
        buffers = {
            "t2d": jnp.asarray(tensors["t2d"].astype(bool)),
            "d2t": jnp.asarray(tensors["d2t"].astype(np.int32)),
        }
    # store float weights in the module's compute dtype (bf16): exports are
    # bf16, the torch->flax mapper upcasts to the fp32 param template, and
    # apply() casts back to bf16 anyway — bf16 storage is bit-identical at
    # compute while halving serving HBM traffic and skipping the per-apply
    # full-table casts (262 MB embed at 32k vocab / 2048h)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        params,
    )
    return module, {"params": params, "buffers": buffers}


def load_exported_dflash_draft(export_dir: str):
    """Load a DFlash-family SGLang export (exporter._export_dflash_to_sglang
    normalization) into (module, variables) for block speculation.

    The export's config keeps ``dflash_config`` nested; projector_type picks
    the draft class (the normalized ``architectures`` carry serving names —
    DFlashDraftModel / Qwen3DSparkModel — not trainer names). Variable init
    routes through every auxiliary head so the reverse torch→flax mapper has
    a complete template tree to fill."""
    import os

    import jax
    import jax.numpy as jnp

    from specforge_tpu.models.draft.dflash import (
        DFlashConfig,
        DFlashDraftModel,
    )
    from specforge_tpu.models.draft.domino import DominoDraftModel
    from specforge_tpu.models.draft.dspark import DSparkDraftModel
    from specforge_tpu.models.model_loading import _load_from_safetensors

    with open(os.path.join(export_dir, "config.json")) as f:
        raw = json.load(f)
    projector = (
        (raw.get("dflash_config") or {}).get("projector_type") or "dflash"
    )
    cls = {
        "dflash": DFlashDraftModel,
        "domino": DominoDraftModel,
        "dspark": DSparkDraftModel,
    }[projector]
    config = DFlashConfig.from_dict(raw)
    module = cls(config, dtype=jnp.bfloat16)

    bs = config.block_size
    h = config.hidden_size
    n_cap = len(config.resolved_target_layer_ids)

    def init_all(mod, noise, ctx, ctx_pos, draft_pos, anchors, keep,
                 prev_emb, prev_ids):
        hidden = mod(noise, ctx, ctx_pos, draft_pos, anchors, keep)
        hs = hidden[:, None]  # [1, 1, bs, h]
        base = jnp.zeros((1, 1, bs, config.vocab_size), jnp.float32)
        mod.apply_logits_head(
            base, prev_token_ids=prev_ids,
            prev_token_embeddings=prev_emb, hidden_states=hs,
        )
        mod.predict_confidence(hs, prev_token_ids=prev_ids)
        return hidden

    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, bs, h), jnp.bfloat16),
        jnp.zeros((1, 8, n_cap * h), jnp.bfloat16),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, bs), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1, 1), bool),
        jnp.zeros((1, 1, bs, h), jnp.bfloat16),
        jnp.zeros((1, 1, bs), jnp.int32),
        method=init_all,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    buffers = dict(variables.get("buffers", {}))
    params, buffers = _load_from_safetensors(
        os.path.join(export_dir, "model.safetensors"), params, buffers
    )
    # bf16 storage for float weights — same rationale as load_exported_draft
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        params,
    )
    return module, {"params": params, "buffers": buffers}


def load_exported_peagle_draft(export_dir: str):
    """Load an HF-layout P-EAGLE export into (module, variables) for COD
    block speculation (PEagleSpecDecoder). P-EAGLE trains its own
    embeddings, so the export is self-contained; variables init routes
    through embed/project/mask_hidden/backbone/logits so the torch→flax
    mapper has the full template tree."""
    import jax
    import jax.numpy as jnp

    from specforge_tpu.models.draft.peagle import (
        PEagleConfig,
        PEagleDraftModel,
    )
    from specforge_tpu.models.model_loading import _load_from_safetensors

    with open(os.path.join(export_dir, "config.json")) as f:
        config = PEagleConfig.from_dict(json.load(f))
    module = PEagleDraftModel(
        config, dtype=jnp.bfloat16, attention_backend="dense"
    )
    t = 8
    fc_in = 3 * config.resolved_target_hidden_size

    def init_all(mod, ids, hidden3h, allow, pos):
        emb = mod.embed_input_ids(ids)
        hid = mod.project_hidden_states(hidden3h)
        mod.get_mask_hidden()
        mod.get_vocab_maps()
        h = mod.backbone(emb, hid, allow, pos)
        return mod.compute_logits(h)

    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t), jnp.int32),
        jnp.zeros((1, t, fc_in), jnp.float32),
        jnp.ones((1, t, t), bool),
        jnp.zeros((1, t), jnp.int32),
        method=init_all,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    buffers = dict(variables.get("buffers", {}))
    params, buffers = _load_from_safetensors(
        os.path.join(export_dir, "model.safetensors"), params, buffers
    )
    import jax.numpy as _jnp

    params = jax.tree_util.tree_map(
        lambda a: a.astype(_jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        params,
    )
    return module, {"params": params, "buffers": buffers}

"""Accept-length benchmark: trained draft × target over a prompt set.

The TPU-native counterpart of the reference serving benchmark
(``specforge benchmark`` + benchmarks/bench_eagle3.py accept-length grid): runs
greedy speculative decoding with the in-repo decoder and reports per-prompt
and aggregate accept lengths — no external serving stack required.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("specforge_tpu.benchmarks")


@dataclass
class AcceptLengthReport:
    per_prompt: List[float]
    accept_lengths: List[int]
    num_draft_tokens: int
    topk: int = 1
    # wall-clock decode seconds (generate() calls only; model loading
    # excluded, first-call compilation included) — the reference benchmark
    # reports accept length AND output_throughput
    # (benchmarks/benchmarker/utils.py:17,55,116)
    wall_seconds: float = 0.0

    @property
    def mean_accept_length(self) -> float:
        return float(np.mean(self.accept_lengths)) if self.accept_lengths else 0.0

    @property
    def output_tokens(self) -> int:
        return int(np.sum(self.accept_lengths)) if self.accept_lengths else 0

    @property
    def output_throughput(self) -> float:
        """Output tokens per wall-clock second across all prompts."""
        if self.wall_seconds <= 0.0:
            return 0.0
        return self.output_tokens / self.wall_seconds

    def to_json(self) -> Dict[str, Any]:
        hist = np.bincount(
            np.asarray(self.accept_lengths, np.int64),
            minlength=self.num_draft_tokens + 2,
        )
        return {
            "mean_accept_length": round(self.mean_accept_length, 4),
            "per_prompt_mean": [round(x, 4) for x in self.per_prompt],
            "accept_length_histogram": hist.tolist(),
            "num_draft_tokens": self.num_draft_tokens,
            "topk": self.topk,
            "rounds": len(self.accept_lengths),
            "output_tokens": self.output_tokens,
            "wall_seconds": round(self.wall_seconds, 4),
            "output_throughput": round(self.output_throughput, 2),
        }


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


def measure_with_decoder(
    decoder,
    prompts: Sequence[Sequence[int]],
    *,
    topk: int = 1,
    max_new_tokens: int = 128,
    fused: bool = True,
    warmup: bool = True,
    tree_style: str = "root",
) -> AcceptLengthReport:
    """``fused=True`` (default) times the single-dispatch whole-generate
    program (the serving-speed path); ``warmup=True`` runs the first prompt
    once untimed so compilation is excluded from throughput — the reference
    benchmark also measures steady-state serving throughput
    (benchmarks/benchmarker/utils.py:17,55,116). ``tree_style="beam"``
    (fused, topk>1) uses the every-depth-branching dynamic tree."""
    import time

    generate = decoder.generate_fused if fused else decoder.generate
    # block decoders (DFlash family) take no topk; only pass it when it
    # deviates from the chain default
    kw = {"topk": topk} if topk != 1 else {}
    if topk != 1 and tree_style != "root":
        kw["tree_style"] = tree_style
    if warmup and prompts:
        generate(list(prompts[0]), max_new_tokens=max_new_tokens, **kw)
    per_prompt: List[float] = []
    all_lengths: List[int] = []
    wall = 0.0
    for i, prompt in enumerate(prompts):
        t0 = time.monotonic()
        result = generate(
            list(prompt), max_new_tokens=max_new_tokens, **kw
        )
        wall += time.monotonic() - t0
        per_prompt.append(result.mean_accept_length)
        all_lengths.extend(result.accept_lengths)
        logger.info(
            "prompt %d/%d: accept_length=%.3f over %d rounds",
            i + 1, len(prompts), result.mean_accept_length, result.steps,
        )
    return AcceptLengthReport(
        per_prompt=per_prompt, accept_lengths=all_lengths,
        num_draft_tokens=getattr(decoder, "k", None)
        or decoder.block_size - 1,
        topk=topk, wall_seconds=wall,
    )


def measure_batched(
    decoder,
    prompts: Sequence[Sequence[int]],
    *,
    batch: int,
    max_new_tokens: int = 128,
    warmup: bool = True,
) -> AcceptLengthReport:
    """Chain speculation over prompt groups of ``batch`` rows through the
    single-program batched loop — serving throughput at bs > 1 (the
    reference grid's batch dimension, benchmarks/README.md:11-67)."""
    import time

    groups = [
        list(prompts[i: i + batch])
        for i in range(0, len(prompts), batch)
    ]
    groups = [g for g in groups if len(g) == batch]  # static batch shape
    if warmup and groups:
        decoder.generate_batch_fused(
            groups[0], max_new_tokens=max_new_tokens
        )
    per_prompt: List[float] = []
    all_lengths: List[int] = []
    wall = 0.0
    for group in groups:
        t0 = time.monotonic()
        results = decoder.generate_batch_fused(
            group, max_new_tokens=max_new_tokens
        )
        wall += time.monotonic() - t0
        for result in results:
            per_prompt.append(result.mean_accept_length)
            all_lengths.extend(result.accept_lengths)
    return AcceptLengthReport(
        per_prompt=per_prompt, accept_lengths=all_lengths,
        num_draft_tokens=decoder.k, topk=1, wall_seconds=wall,
    )


def measure_plain_decode(
    target_params,
    target_config,
    prompts: Sequence[Sequence[int]],
    *,
    max_new_tokens: int = 128,
    max_len: int = 2048,
    warmup: bool = True,
) -> Dict[str, Any]:
    """No-speculation greedy-decode baseline: tokens/s of the fused plain
    decode loop over the same prompts — the denominator of the speedup
    ratio (the reference's headline '4x inference speedup' claim,
    README.md:61, is speculative vs plain decoding throughput)."""
    import time

    from specforge_tpu.inference.spec_decode import fused_plain_decode

    if warmup and prompts:
        fused_plain_decode(
            target_params, target_config, list(prompts[0]),
            max_new_tokens=max_new_tokens, max_len=max_len,
        )
    wall = 0.0
    tokens = 0
    for prompt in prompts:
        t0 = time.monotonic()
        out = fused_plain_decode(
            target_params, target_config, list(prompt),
            max_new_tokens=max_new_tokens, max_len=max_len,
        )
        wall += time.monotonic() - t0
        tokens += len(out) - len(prompt)
    return {
        "output_tokens": tokens,
        "wall_seconds": round(wall, 4),
        "output_throughput": round(tokens / wall, 2) if wall > 0 else 0.0,
    }


def measure_plain_decode_batched(
    target_params,
    target_config,
    prompts: Sequence[Sequence[int]],
    *,
    batch: int,
    max_new_tokens: int = 128,
    max_len: int = 2048,
    warmup: bool = True,
) -> Dict[str, Any]:
    """Batched no-speculation baseline: tokens/s of the batched fused plain
    loop over ``batch``-row groups — the like-for-like denominator for
    bs > 1 speculative cells (a bs1 plain baseline would conflate batching
    with speculation in the ratio)."""
    import time

    from specforge_tpu.inference.spec_decode import (
        fused_plain_decode_batched,
    )

    groups = [
        list(prompts[i: i + batch])
        for i in range(0, len(prompts), batch)
    ]
    groups = [g for g in groups if len(g) == batch]  # static batch shape
    if warmup and groups:
        fused_plain_decode_batched(
            target_params, target_config, groups[0],
            max_new_tokens=max_new_tokens, max_len=max_len,
        )
    wall = 0.0
    tokens = 0
    for group in groups:
        t0 = time.monotonic()
        outs = fused_plain_decode_batched(
            target_params, target_config, group,
            max_new_tokens=max_new_tokens, max_len=max_len,
        )
        wall += time.monotonic() - t0
        tokens += sum(len(o) - len(p) for o, p in zip(outs, group))
    return {
        "output_tokens": tokens,
        "wall_seconds": round(wall, 4),
        "batch": batch,
        "output_throughput": round(tokens / wall, 2) if wall > 0 else 0.0,
    }


def measure_accept_length(
    *,
    target_model_path: str,
    draft_export_dir: str,
    prompts: Sequence[Sequence[int]],
    capture_layers: Optional[Sequence[int]] = None,
    num_draft_tokens: int = 4,
    topk: int = 1,
    max_new_tokens: int = 128,
    max_len: int = 2048,
) -> AcceptLengthReport:
    """One-shot convenience: load models, build the decoder, measure."""
    models = load_spec_models(target_model_path, draft_export_dir)
    decoder = build_decoder(
        models, capture_layers, num_draft_tokens, max_len
    )
    return measure_with_decoder(
        decoder, prompts, topk=topk, max_new_tokens=max_new_tokens
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
    from specforge_tpu.training.model_loading import _load_from_safetensors

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
    from specforge_tpu.training.model_loading import _load_from_safetensors

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

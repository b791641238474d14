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

from specforge_tpu.inference.serving_loaders import (  # noqa: F401
    build_decoder,
    load_exported_dflash_draft,
    load_exported_draft,
    load_spec_models,
)

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
    topk: int = 1,
    tree_style: str = "root",
    adaptive: bool = False,
    stream: bool = False,
) -> AcceptLengthReport:
    """Speculation over prompt groups of ``batch`` rows through the
    single-program batched loop — serving throughput at bs > 1 (the
    reference grid's batch dimension, benchmarks/README.md:11-67).
    ``topk``/``tree_style``/``adaptive`` select the batched mode (eagle3
    decoders); ``stream=True`` runs the whole prompt list through
    continuous batching (``generate_stream_fused``) at width ``batch``
    instead of fixed lockstep groups."""
    import time

    kw = {}
    if topk > 1:
        kw["topk"] = topk
        if tree_style != "root":
            kw["tree_style"] = tree_style
    if adaptive:
        kw["adaptive"] = True

    if stream:
        decoder.generate_stream_fused(
            list(prompts[:batch]), max_new_tokens=max_new_tokens,
            batch=batch,
        )
        t0 = time.monotonic()
        results = decoder.generate_stream_fused(
            [list(p) for p in prompts], max_new_tokens=max_new_tokens,
            batch=batch,
        )
        wall = time.monotonic() - t0
        return AcceptLengthReport(
            per_prompt=[r.mean_accept_length for r in results],
            accept_lengths=[
                a for r in results for a in r.accept_lengths
            ],
            num_draft_tokens=decoder.k, topk=topk, wall_seconds=wall,
        )

    groups = [
        list(prompts[i: i + batch])
        for i in range(0, len(prompts), batch)
    ]
    groups = [g for g in groups if len(g) == batch]  # static batch shape
    if warmup and groups:
        decoder.generate_batch_fused(
            groups[0], max_new_tokens=max_new_tokens, **kw
        )
    per_prompt: List[float] = []
    all_lengths: List[int] = []
    wall = 0.0
    for group in groups:
        t0 = time.monotonic()
        results = decoder.generate_batch_fused(
            group, max_new_tokens=max_new_tokens, **kw
        )
        wall += time.monotonic() - t0
        for result in results:
            per_prompt.append(result.mean_accept_length)
            all_lengths.extend(result.accept_lengths)
    return AcceptLengthReport(
        per_prompt=per_prompt, accept_lengths=all_lengths,
        num_draft_tokens=decoder.k, topk=topk, wall_seconds=wall,
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



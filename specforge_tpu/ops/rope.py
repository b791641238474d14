"""Rotary position embeddings — all variants the reference draft models support.

Functional design: a :class:`RopeSpec` (static config) turns position ids into
``(cos, sin)`` tables on the fly — no cached buffers, since under ``jit`` the
table computation fuses into the surrounding kernels. Variants and their
semantics follow specforge/modeling/draft/llama3_eagle.py:218-537:

- ``default``            — inv_freq = base^(-2i/d).
- ``linear``             — positions divided by ``factor``.
- ``dynamic``            — NTK-aware base rescale when seq_len exceeds
                           max_position_embeddings (seq_len is static under jit).
- ``llama3``             — wavelength-banded frequency scaling.
- ``yarn``               — interpolation/extrapolation ramp + mscale on cos/sin.
- ``mrope``              — multimodal 3-axis rope (temporal/height/width
                           sections with 3D position ids).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RopeSpec:
    head_dim: int
    base: float = 10000.0
    max_position_embeddings: int = 2048
    scaling_type: str = "default"  # default|linear|dynamic|llama3|yarn|mrope
    scaling_factor: Optional[float] = None
    # llama3
    low_freq_factor: Optional[float] = None
    high_freq_factor: Optional[float] = None
    original_max_position_embeddings: Optional[int] = None
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0
    # mrope
    mrope_section: Tuple[int, ...] = ()

    @classmethod
    def from_config(cls, config) -> "RopeSpec":
        """Build from a draft-model config carrying HF-style rope fields."""
        rope_scaling = getattr(config, "rope_scaling", None)
        head_dim = getattr(config, "head_dim", None) or (
            config.hidden_size // config.num_attention_heads
        )
        base = float(getattr(config, "rope_theta", 10000.0))
        max_pos = int(getattr(config, "max_position_embeddings", 2048))
        if not rope_scaling:
            return cls(head_dim=head_dim, base=base, max_position_embeddings=max_pos)

        def get(key, default=None):
            if isinstance(rope_scaling, dict):
                return rope_scaling.get(key, default)
            return getattr(rope_scaling, key, default)

        scaling_type = get("rope_type", get("type", "default"))
        return cls(
            head_dim=head_dim,
            base=base,
            max_position_embeddings=max_pos,
            scaling_type=scaling_type,
            scaling_factor=get("factor"),
            low_freq_factor=get("low_freq_factor"),
            high_freq_factor=get("high_freq_factor"),
            original_max_position_embeddings=get(
                "original_max_position_embeddings"
            ),
            beta_fast=get("beta_fast", 32.0) or 32.0,
            beta_slow=get("beta_slow", 1.0) or 1.0,
            mscale=get("mscale", 1.0) or 1.0,
            mscale_all_dim=get("mscale_all_dim", 0.0) or 0.0,
            mrope_section=tuple(get("mrope_section", ()) or ()),
        )


def _base_inv_freq(head_dim: int, base: float) -> np.ndarray:
    return 1.0 / (
        base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    ).astype(np.float64)


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos) -> float:
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base)
    )


def _yarn_ramp(low: float, high: float, dim: int) -> np.ndarray:
    if low == high:
        high += 0.001
    linear = (np.arange(dim, dtype=np.float32) - low) / (high - low)
    return np.clip(linear, 0.0, 1.0)


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def inv_freq_and_scale(spec: RopeSpec, seq_len: int) -> Tuple[np.ndarray, float]:
    """Static (numpy) inverse frequencies + cos/sin scale for a given seq_len."""
    dim = spec.head_dim
    inv_freq = _base_inv_freq(dim, spec.base)
    attn_scale = 1.0

    if spec.scaling_type in ("default", "linear", "mrope"):
        pass
    elif spec.scaling_type == "dynamic":
        factor = spec.scaling_factor or 1.0
        if seq_len > spec.max_position_embeddings:
            base = spec.base * (
                (factor * seq_len / spec.max_position_embeddings) - (factor - 1)
            ) ** (dim / (dim - 2))
            inv_freq = _base_inv_freq(dim, base)
    elif spec.scaling_type == "llama3":
        factor = spec.scaling_factor or 1.0
        orig_max = spec.original_max_position_embeddings
        low_f = spec.low_freq_factor
        high_f = spec.high_freq_factor
        if None not in (orig_max, low_f, high_f):
            low_freq_wavelen = orig_max / low_f
            high_freq_wavelen = orig_max / high_f
            wave_len = 2 * math.pi / inv_freq
            if low_f != high_f:
                smooth = (orig_max / wave_len - low_f) / (high_f - low_f)
            else:
                smooth = np.zeros_like(wave_len)
            inv_freq = np.where(
                wave_len < high_freq_wavelen,
                inv_freq,
                np.where(
                    wave_len > low_freq_wavelen,
                    inv_freq / factor,
                    (1 - smooth) * inv_freq / factor + smooth * inv_freq,
                ),
            )
    elif spec.scaling_type == "yarn":
        factor = spec.scaling_factor or 1.0
        orig_max = spec.original_max_position_embeddings or 4096
        freq_extra = _base_inv_freq(dim, spec.base)
        freq_inter = freq_extra / factor
        low = max(
            math.floor(
                _yarn_find_correction_dim(spec.beta_fast, dim, spec.base, orig_max)
            ),
            0,
        )
        high = min(
            math.ceil(
                _yarn_find_correction_dim(spec.beta_slow, dim, spec.base, orig_max)
            ),
            dim - 1,
        )
        inv_freq_mask = 1.0 - _yarn_ramp(low, high, dim // 2)
        inv_freq = freq_inter * (1 - inv_freq_mask) + freq_extra * inv_freq_mask
        attn_scale = float(
            _yarn_get_mscale(factor, spec.mscale)
            / _yarn_get_mscale(factor, spec.mscale_all_dim)
        )
    else:
        raise ValueError(f"Unknown RoPE scaling type {spec.scaling_type}")
    return inv_freq.astype(np.float32), attn_scale


def rope_cos_sin(
    spec: RopeSpec,
    position_ids: jnp.ndarray,
    seq_len: int,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions.

    ``position_ids``: [B, S] (or [3, B, S] for mrope). Returns [B, S, head_dim]
    (or [3, B, S, head_dim]) tables; frequencies are computed in fp32 then cast.
    """
    inv_freq, attn_scale = inv_freq_and_scale(spec, seq_len)
    inv = jnp.asarray(inv_freq, jnp.float32)
    pos = position_ids.astype(jnp.float32)
    if spec.scaling_type == "linear" and spec.scaling_factor:
        pos = pos / spec.scaling_factor
    freqs = pos[..., None] * inv  # [..., S, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos = (jnp.cos(emb) * attn_scale).astype(dtype)
    sin = (jnp.sin(emb) * attn_scale).astype(dtype)
    return cos, sin


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding. q/k: [B, H, S, D]; cos/sin: [B, S, D]."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    q_embed = q * cos + rotate_half(q) * sin
    k_embed = k * cos + rotate_half(k) * sin
    return q_embed, k_embed


def apply_multimodal_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mrope_section: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-axis multimodal rope: cos/sin [3, B, S, D], sections over the last axis.

    Each channel chunk i (of the doubled section list) takes its table from
    axis ``i % 3`` — reference: llama3_eagle.py:140-187.
    """
    sections = list(mrope_section) * 2
    splits_cos = jnp.split(cos, np.cumsum(sections)[:-1].tolist(), axis=-1)
    splits_sin = jnp.split(sin, np.cumsum(sections)[:-1].tolist(), axis=-1)
    cos_sel = jnp.concatenate(
        [m[i % 3] for i, m in enumerate(splits_cos)], axis=-1
    )[:, None, :, :]
    sin_sel = jnp.concatenate(
        [m[i % 3] for i, m in enumerate(splits_sin)], axis=-1
    )[:, None, :, :]
    q_embed = q * cos_sel + rotate_half(q) * sin_sel
    k_embed = k * cos_sel + rotate_half(k) * sin_sel
    return q_embed, k_embed

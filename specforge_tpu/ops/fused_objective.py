"""Fused frozen-vocab objectives with forward-computed input gradients.

The DFlash-family training objective ends in ``CE(hidden @ W_frozen^T)`` (plus,
for Domino, a low-rank corrective term). Because the ``lm_head`` is frozen,
the cross-entropy is the terminal op, and every downstream scale (the Domino
``lambda_base`` blend and the loss denominators) is known *numerically* during
the forward pass, the input gradients of the objective are computable forward:

    d loss_num / d logits = w_eff * (softmax(logits) - onehot(target))

so the full-vocab logits never need to be rematerialized in the backward pass.
The reference pays this cost three ways (fwd + activation-checkpoint recompute
+ backward d_hidden, specforge/core/chunking.py:15 +
algorithms/common/dflash_family_model.py:136-461); this op pays exactly two
vocab-sized matmuls per chunk (logits fwd, d_hidden) and stores only the small
per-token input gradients (``[B, N, block, h]`` bf16) as residuals — the
custom-VJP backward is a scalar rescale.

The chunked ``lax.scan`` over the anchor axis bounds the transient
``[tokens, V]`` logits exactly like ``checkpointed_chunk_reduce`` does, but
without ``jax.checkpoint``: there is nothing left to recompute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _float0_zeros(shape) -> np.ndarray:
    return np.zeros(shape, dtype=jax.dtypes.float0)


def _split_chunks(a: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """[B, N, ...] -> [n_chunks, B, cs, ...] along the anchor axis 1."""
    b, n = a.shape[:2]
    cs = n // n_chunks
    return jnp.swapaxes(
        a.reshape(b, n_chunks, cs, *a.shape[2:]), 0, 1
    )


def _join_chunks(a: jnp.ndarray) -> jnp.ndarray:
    """[n_chunks, B, cs, ...] -> [B, n_chunks*cs, ...]."""
    nc, b, cs = a.shape[:3]
    return jnp.swapaxes(a, 0, 1).reshape(b, nc * cs, *a.shape[3:])


def _resolve_chunks(n: int, chunk_blocks: int) -> int:
    if chunk_blocks <= 0 or chunk_blocks >= n:
        return 1
    if n % chunk_blocks != 0:
        raise ValueError(
            f"objective_chunk_blocks {chunk_blocks} must divide anchors {n}"
        )
    return n // chunk_blocks


def _scan_chunks(chunk_fn, arrays, n_chunks: int):
    """Run ``chunk_fn(*chunks) -> (terms_tuple, stacked_tuple)`` over anchor
    chunks, summing ``terms`` and concatenating ``stacked`` along axis 1."""
    if n_chunks == 1:
        terms, stacked = chunk_fn(*arrays)
        return terms, stacked
    split = [_split_chunks(a, n_chunks) for a in arrays]
    first_in = [s[0] for s in split]
    terms0, stacked0 = chunk_fn(*first_in)

    def body(carry, xs):
        t, s = chunk_fn(*xs)
        return jax.tree_util.tree_map(jnp.add, carry, t), s

    rest = tuple(s[1:] for s in split)
    terms, stacked_rest = jax.lax.scan(body, terms0, rest)
    stacked = jax.tree_util.tree_map(
        lambda s0, sr: _join_chunks(jnp.concatenate([s0[None], sr], axis=0)),
        stacked0,
        stacked_rest,
    )
    return terms, stacked


def _ce_stats(logits: jnp.ndarray, targets: jnp.ndarray):
    """fp32 (nlq, softmax): nlq = lse - picked, max-subtracted for
    stability. The single source of the CE math — ``masked_cross_entropy``
    (the unfused paths' per-token loss) is the nlq half of this."""
    l32 = logits.astype(jnp.float32)
    m = jnp.max(l32, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(l32 - m[..., None]), axis=-1))
    picked = jnp.take_along_axis(l32, targets[..., None], axis=-1)[..., 0]
    nlq = lse - picked
    softmax = jnp.exp(l32 - lse[..., None])
    return nlq, softmax


def masked_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray):
    """Per-token -log p[target] in fp32 (no reduction).

    lse - picked form: XLA fuses the fp32 convert into the vocab reductions,
    so no fp32 [.., V] log-softmax array is ever materialized in HBM (the
    unused softmax output of ``_ce_stats`` is dead-code-eliminated)."""
    nlq, _ = _ce_stats(logits, targets)
    return nlq


def compute_accept_len(
    pred_ids: jnp.ndarray, target_ids: jnp.ndarray, valid_mask: jnp.ndarray
) -> jnp.ndarray:
    """Per-block acceptance length [B, N] (reference compute_accept_len):
    length of the prefix of block positions whose prediction matches the
    label, positions outside ``valid_mask`` passing for free."""
    correct = (pred_ids == target_ids) | (~valid_mask)
    accept_prefix = jnp.cumprod(correct.astype(jnp.int32), axis=2) * (
        valid_mask.astype(jnp.int32)
    )
    return jnp.sum(accept_prefix, axis=2).astype(jnp.float32)


def _grad_logits(softmax, targets, w_eff, out_dtype):
    """w_eff[..., None] * (softmax - onehot(targets)) cast to ``out_dtype``."""
    vocab_iota = jax.lax.broadcasted_iota(
        jnp.int32, softmax.shape, softmax.ndim - 1
    )
    onehot = (vocab_iota == targets[..., None]).astype(jnp.float32)
    return (w_eff[..., None] * (softmax - onehot)).astype(out_dtype)


class _DFlashOpts(NamedTuple):
    loss_type: str
    dpace_alpha: float
    chunk_blocks: int


# --- DFlash (single CE over the frozen head) --------------------------------

def dpace_weight(prob, binary_mask, binary_mask_b, loss_type, alpha):
    """D-PACE per-token weights from clean-token probabilities. The single
    source for both the fused path (all-forward) and the unfused path
    (which wraps inputs/outputs in stop_gradient)."""
    smooth = (1.0 - alpha) * prob + alpha
    smooth = jnp.where(binary_mask_b, smooth, 1.0)
    prefix = jnp.cumprod(smooth, axis=-1)
    if loss_type == "dpace-cumulative-confidence-only":
        return prefix
    suffix = jnp.flip(
        jnp.cumsum(jnp.flip(prefix * binary_mask, axis=-1), axis=-1), axis=-1
    )
    if loss_type == "dpace":
        return suffix
    if loss_type == "dpace-continuation-value-only":
        return suffix / jnp.maximum(prefix, jnp.finfo(prefix.dtype).tiny)
    raise ValueError(f"unknown D-PACE loss_type {loss_type!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dflash_objective_fused(
    hidden4d: jnp.ndarray,      # [B, N, K, h]
    target_ids: jnp.ndarray,    # [B, N, K] int
    loss_weights: jnp.ndarray,  # [B, N, K] (decay applied for 'dflash')
    weight_mask: jnp.ndarray,   # [B, N, K] (no decay; eval + dpace mask)
    head_weight: jnp.ndarray,   # frozen [V, h]
    opts: _DFlashOpts,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    out, _ = _dflash_fwd(
        hidden4d, target_ids, loss_weights, weight_mask, head_weight, opts
    )
    return out


def _dflash_fwd(hidden4d, target_ids, loss_weights, weight_mask, head_weight,
                opts: _DFlashOpts):
    n = hidden4d.shape[1]
    n_chunks = _resolve_chunks(n, opts.chunk_blocks)
    w_cast = head_weight.astype(hidden4d.dtype)

    def chunk_fn(h, tgt, lw, wm):
        logits = jnp.einsum("bnkh,vh->bnkv", h, w_cast)
        nlq, softmax = _ce_stats(logits, tgt)

        if opts.loss_type == "dflash":
            w_eff = lw
            loss_den = jnp.sum(lw)
        else:
            prob = jnp.exp(-nlq)
            dpace_w = dpace_weight(
                prob, wm, wm > 0, opts.loss_type, opts.dpace_alpha
            )
            w_eff = wm * dpace_w
            loss_den = jnp.zeros((), jnp.float32)

        loss_num = jnp.sum(nlq * w_eff)
        predicted = jnp.argmax(logits, axis=-1)
        correct_num = jnp.sum(
            ((predicted == tgt) & (wm > 0.5)).astype(jnp.float32)
        )
        accuracy_den = jnp.sum(wm)

        dl = _grad_logits(softmax, tgt, w_eff, hidden4d.dtype)
        dh = jnp.einsum("bnkv,vh->bnkh", dl, w_cast)
        return (loss_num, loss_den, correct_num, accuracy_den), (dh,)

    terms, (d_hidden,) = _scan_chunks(
        chunk_fn, (hidden4d, target_ids, loss_weights, weight_mask), n_chunks
    )
    d_hidden = d_hidden.reshape(hidden4d.shape)
    return terms, (d_hidden, head_weight)


def _dflash_bwd(opts, res, cts):
    d_hidden, head_weight = res
    g = cts[0]
    dh = (d_hidden.astype(jnp.float32) * g).astype(d_hidden.dtype)
    mask_shape = d_hidden.shape[:3]  # == target/loss_weights/weight_mask shape
    return (
        dh,
        _float0_zeros(mask_shape),
        jnp.zeros(mask_shape, jnp.float32),
        jnp.zeros(mask_shape, jnp.float32),
        jnp.zeros_like(head_weight),
    )


dflash_objective_fused.defvjp(_dflash_fwd, _dflash_bwd)


class _DominoOpts(NamedTuple):
    chunk_blocks: int


# --- Domino (base CE + GRU-corrected final CE, lambda blend) ----------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def domino_objective_fused(
    hidden4d: jnp.ndarray,      # [B, N, K, h]
    corr_act: jnp.ndarray,      # [B, N, K, emb] (zeros before suffix_start)
    p1_kernel: jnp.ndarray,     # trainable [emb, V]
    target_ids: jnp.ndarray,    # [B, N, K] int
    weight_mask: jnp.ndarray,   # [B, N, K] loss weights (decay applied)
    eval_weight_mask: jnp.ndarray,  # [B, N, K] no decay
    lambda_base: jnp.ndarray,   # scalar blend in [0, 1]
    head_weight: jnp.ndarray,   # frozen [V, h]
    opts: _DominoOpts,
):
    """Returns (blend_num, final_num, base_num, loss_den, correct_num,
    base_correct, accuracy_den, accept_num, base_accept_num, accept_den).

    Only ``blend_num = (1-lambda)*final_num + lambda*base_num`` carries
    gradient (to hidden4d, corr_act, p1_kernel); all other outputs are
    telemetry (their cotangents are dropped, matching the stop-gradients in
    the unfused path)."""
    out, _ = _domino_fwd(
        hidden4d, corr_act, p1_kernel, target_ids, weight_mask,
        eval_weight_mask, lambda_base, head_weight, opts,
    )
    return out


def _domino_fwd(hidden4d, corr_act, p1_kernel, target_ids, weight_mask,
                eval_weight_mask, lambda_base, head_weight,
                opts: _DominoOpts):
    n = hidden4d.shape[1]
    n_chunks = _resolve_chunks(n, opts.chunk_blocks)
    dtype = hidden4d.dtype
    w_cast = head_weight.astype(dtype)
    p1_cast = p1_kernel.astype(dtype)
    lam = jnp.asarray(lambda_base, jnp.float32)

    def chunk_fn(h, act, tgt, wm, ewm):
        # NOTE: do not barrier the logits to force bf16-only materialization
        # — measured on v5e (b2/s768/a256) it is ~15 ms/step SLOWER than
        # XLA's chosen f32+bf16 dual materialization of the [.., V] arrays.
        base_logits = jnp.einsum("bnkh,vh->bnkv", h, w_cast)
        corr = jnp.einsum("bnke,ev->bnkv", act, p1_cast)
        final_logits = base_logits + corr

        nlq_f, sm_f = _ce_stats(final_logits, tgt)
        nlq_b, sm_b = _ce_stats(base_logits, tgt)
        final_num = jnp.sum(nlq_f * wm)
        base_num = jnp.sum(nlq_b * wm)
        loss_den = jnp.sum(wm)

        predicted = jnp.argmax(final_logits, axis=-1)
        base_pred = jnp.argmax(base_logits, axis=-1)
        bin_mask = ewm > 0.5
        correct_num = jnp.sum(
            ((predicted == tgt) & bin_mask).astype(jnp.float32)
        )
        base_correct = jnp.sum(
            ((base_pred == tgt) & bin_mask).astype(jnp.float32)
        )
        accuracy_den = jnp.sum(ewm)

        valid_mask = ewm > 0
        accepted = compute_accept_len(predicted, tgt, valid_mask)
        base_accepted = compute_accept_len(base_pred, tgt, valid_mask)
        valid_blocks = jnp.any(valid_mask, axis=-1).astype(jnp.float32)
        accept_num = jnp.sum((accepted + 1.0) * valid_blocks)
        base_accept_num = jnp.sum((base_accepted + 1.0) * valid_blocks)
        accept_den = jnp.sum(valid_blocks)

        # forward gradients of blend_num (unit cotangent):
        #   d/d final_logits = (1-lam) * wm * (sm_f - onehot)   [final CE]
        #   d/d base_logits  = that + lam * wm * (sm_b - onehot) [both CEs]
        dl_f = _grad_logits(sm_f, tgt, (1.0 - lam) * wm, dtype)
        dl_b = _grad_logits(sm_b, tgt, lam * wm, dtype)
        dh = jnp.einsum("bnkv,vh->bnkh", dl_f + dl_b, w_cast)
        d_act = jnp.einsum("bnkv,ev->bnke", dl_f, p1_cast)
        dp1 = jnp.einsum(
            "bnke,bnkv->ev", act, dl_f, preferred_element_type=jnp.float32
        )
        terms = (
            final_num, base_num, loss_den, correct_num, base_correct,
            accuracy_den, accept_num, base_accept_num, accept_den, dp1,
        )
        return terms, (dh, d_act)

    terms, (d_hidden, d_act) = _scan_chunks(
        chunk_fn,
        (hidden4d, corr_act, target_ids, weight_mask, eval_weight_mask),
        n_chunks,
    )
    (
        final_num, base_num, loss_den, correct_num, base_correct,
        accuracy_den, accept_num, base_accept_num, accept_den, dp1,
    ) = terms
    blend_num = (1.0 - lam) * final_num + lam * base_num
    out = (
        blend_num, final_num, base_num, loss_den, correct_num, base_correct,
        accuracy_den, accept_num, base_accept_num, accept_den,
    )
    res = (
        d_hidden.reshape(hidden4d.shape),
        d_act.reshape(corr_act.shape),
        dp1,
        jnp.zeros((), p1_kernel.dtype),  # dtype carrier for the P1 cotangent
        head_weight,
    )
    return out, res


def _domino_bwd(opts, res, cts):
    d_hidden, d_act, dp1, p1_dtype_carrier, head_weight = res
    g = cts[0]
    mask_shape = d_hidden.shape[:3]  # == target/weight/eval-mask shape
    return (
        (d_hidden.astype(jnp.float32) * g).astype(d_hidden.dtype),
        (d_act.astype(jnp.float32) * g).astype(d_act.dtype),
        (dp1 * g).astype(p1_dtype_carrier.dtype),
        _float0_zeros(mask_shape),
        jnp.zeros(mask_shape, jnp.float32),
        jnp.zeros(mask_shape, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros_like(head_weight),
    )


domino_objective_fused.defvjp(_domino_fwd, _domino_bwd)


class _DSparkOpts(NamedTuple):
    chunk_blocks: int
    ce_alpha: float
    l1_alpha: float
    has_markov: bool
    has_target: bool


# --- DSpark (Markov-biased CE + L1 to teacher probs) ------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def dspark_objective_fused(
    hidden4d: jnp.ndarray,      # [B, N, K, h]
    latent: jnp.ndarray,        # [B, N, K, r] Markov latent (dummy if absent)
    w2_kernel: jnp.ndarray,     # trainable [r, V] (dummy if absent)
    ath: jnp.ndarray,           # [B, N, K, h] aligned teacher hidden (dummy)
    target_ids: jnp.ndarray,    # [B, N, K] int
    loss_weights: jnp.ndarray,  # [B, N, K] (decay applied)
    eval_mask: jnp.ndarray,     # [B, N, K] bool
    head_weight: jnp.ndarray,   # frozen [V, h]
    opts: _DSparkOpts,
):
    """Returns ``(vocab_num, ce_num, l1_num, correct_num, eval_den, ce_pos,
    correct_pos, pos_den, agree_num, t_top1, d_top1, tau_num, tau_den,
    accept_probability)``.

    ``vocab_num = ce_alpha*ce_num + l1_alpha*l1_num`` is the only output
    carrying gradient (to hidden4d, latent, w2_kernel); the rest is telemetry
    plus the stop-gradient acceptance probability the confidence BCE consumes
    outside. Both full-vocab softmaxes (draft CE/L1 and the frozen teacher
    projection of ``ath``) run exactly once — the unfused checkpointed path
    pays them twice (fwd + remat) plus a d_hidden matmul in backward.

    The L1 input gradient is forward-computed:
    ``d/d logit_u  sum_v |p_v - q_v| = p_u (s_u - <s, p>)`` with
    ``s = sign(p - q)`` (q = teacher probs, constant)."""
    out, _ = _dspark_fwd(
        hidden4d, latent, w2_kernel, ath, target_ids, loss_weights,
        eval_mask, head_weight, opts,
    )
    return out


def _dspark_fwd(hidden4d, latent, w2_kernel, ath, target_ids, loss_weights,
                eval_mask, head_weight, opts: _DSparkOpts):
    n = hidden4d.shape[1]
    n_chunks = _resolve_chunks(n, opts.chunk_blocks)
    dtype = hidden4d.dtype
    w_cast = head_weight.astype(dtype)
    w2_cast = w2_kernel.astype(dtype)
    use_l1 = opts.has_target and opts.l1_alpha > 0

    def chunk_fn(h, lat, a, tgt, lw, em):
        base_logits = jnp.einsum("bnkh,vh->bnkv", h, w_cast)
        if opts.has_markov:
            draft_logits = base_logits + lat @ w2_cast
        else:
            draft_logits = base_logits
        nlq, p = _ce_stats(draft_logits, tgt)
        ce = nlq
        ce_num = jnp.sum(ce * lw)

        zero = jnp.zeros((), jnp.float32)
        l1_num = agree_num = t_top1 = d_top1 = tau_num = tau_den = zero
        emf = em.astype(jnp.float32)
        if opts.has_target:
            target_logits = jnp.einsum("bnkh,vh->bnkv", a, w_cast)
            q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
            teacher_ids = jnp.argmax(target_logits, axis=-1)
            l1_per_token = jnp.sum(jnp.abs(p - q), axis=-1)
            accept_probability = jnp.clip(1.0 - 0.5 * l1_per_token, 0.0, 1.0)
            if opts.l1_alpha > 0:
                l1_num = jnp.sum(l1_per_token * lw)
        else:
            accept_probability = jnp.zeros(tgt.shape, jnp.float32)

        # forward gradient of vocab_num w.r.t. draft logits
        dl32 = (opts.ce_alpha * lw)[..., None] * (
            p - (
                jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
                == tgt[..., None]
            ).astype(jnp.float32)
        )
        if use_l1:
            s = jnp.sign(p - q)
            sdot = jnp.sum(s * p, axis=-1)
            dl32 = dl32 + (opts.l1_alpha * lw)[..., None] * p * (
                s - sdot[..., None]
            )
        dl = dl32.astype(dtype)
        dh = jnp.einsum("bnkv,vh->bnkh", dl, w_cast)
        if opts.has_markov:
            d_lat = jnp.einsum("bnkv,rv->bnkr", dl, w2_cast)
            dw2 = jnp.einsum(
                "bnkr,bnkv->rv", lat, dl, preferred_element_type=jnp.float32
            )
        else:
            d_lat = jnp.zeros_like(lat)
            dw2 = jnp.zeros(w2_kernel.shape, jnp.float32)

        predicted = jnp.argmax(draft_logits, axis=-1)
        correct = ((predicted == tgt) & em).astype(jnp.float32)
        correct_num = jnp.sum(correct)
        eval_den = jnp.sum(emf)
        ce_pos = jnp.sum(ce * emf, axis=(0, 1))
        correct_pos = jnp.sum(correct, axis=(0, 1))
        pos_den = jnp.sum(emf, axis=(0, 1))
        if opts.has_target:
            agree_num = jnp.sum(
                (predicted == teacher_ids).astype(jnp.float32) * emf
            )
            t_top1 = jnp.sum(jnp.max(q, axis=-1) * emf)
            d_top1 = jnp.sum(jnp.max(p, axis=-1) * emf)
            valid_blocks = jnp.any(em, axis=-1).astype(jnp.float32)
            accepted_exp = (
                jnp.sum(
                    jnp.cumprod(accept_probability * emf, axis=-1), axis=-1
                )
                + 1.0
            )
            tau_num = jnp.sum(accepted_exp * valid_blocks)
            tau_den = jnp.sum(valid_blocks)
        terms = (
            ce_num, l1_num, correct_num, eval_den, ce_pos, correct_pos,
            pos_den, agree_num, t_top1, d_top1, tau_num, tau_den, dw2,
        )
        return terms, (dh, d_lat, accept_probability)

    terms, (d_hidden, d_latent, accept_probability) = _scan_chunks(
        chunk_fn,
        (hidden4d, latent, ath, target_ids, loss_weights, eval_mask),
        n_chunks,
    )
    (
        ce_num, l1_num, correct_num, eval_den, ce_pos, correct_pos, pos_den,
        agree_num, t_top1, d_top1, tau_num, tau_den, dw2,
    ) = terms
    vocab_num = opts.ce_alpha * ce_num + opts.l1_alpha * l1_num
    out = (
        vocab_num, ce_num, l1_num, correct_num, eval_den, ce_pos,
        correct_pos, pos_den, agree_num, t_top1, d_top1, tau_num, tau_den,
        accept_probability.reshape(hidden4d.shape[:3]),
    )
    res = (
        d_hidden.reshape(hidden4d.shape),
        d_latent.reshape(latent.shape),
        dw2,
        jnp.zeros((), w2_kernel.dtype),  # dtype carrier for the W2 cotangent
        # shape/dtype carrier for the ath zero cotangent (last-dim size is
        # static residual metadata)
        jnp.zeros((ath.shape[-1],), ath.dtype),
        head_weight,
    )
    return out, res


def _dspark_bwd(opts, res, cts):
    d_hidden, d_latent, dw2, w2_carrier, ath_carrier, head_weight = res
    g = cts[0]
    mask_shape = d_hidden.shape[:3]
    return (
        (d_hidden.astype(jnp.float32) * g).astype(d_hidden.dtype),
        (d_latent.astype(jnp.float32) * g).astype(d_latent.dtype),
        (dw2 * g).astype(w2_carrier.dtype),
        jnp.zeros((*mask_shape, ath_carrier.shape[0]), ath_carrier.dtype),
        _float0_zeros(mask_shape),
        jnp.zeros(mask_shape, jnp.float32),
        _float0_zeros(mask_shape),
        jnp.zeros_like(head_weight),
    )


dspark_objective_fused.defvjp(_dspark_fwd, _dspark_bwd)

"""Benchmark: train-step MFU on one TPU chip.

``BENCH_ALGO=domino`` (default) measures the Domino training step at the
reference's exact anchor config (qwen3-8b-domino.json: 5 layers, h4096,
block 16 × 256 anchors, seq 768, bs 2 — BASELINE.md 43.5% H200 MFU,
bench_domino_mfu.py:8-27). ``BENCH_ALGO=eagle3`` measures the EAGLE3 step
(compact-teacher + 7-step TTT + fused CE) at the Qwen3-8B eagle3 shape.

FLOP accounting is conservative: 3x fwd matmul FLOPs for trainable-weight
paths, 2x for frozen-weight paths (no remat recompute counted) — stricter
than the reference's FlopCounterMode ~45 TFLOP/sample for Domino.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# TPU peak dense bf16 TFLOP/s per chip by generation
PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}
BASELINE_MFU = 0.435  # reference H200 Domino trainer anchor


def detect_peak():
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    for key, peak in PEAK_BF16.items():
        if key in gen:
            return peak, key
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_BF16.items():
        if key.replace("v", "v") in kind.replace(" ", ""):
            return peak, key
    if "v5 lite" in kind or "v5e" in kind:
        return PEAK_BF16["v5e"], "v5e"
    return PEAK_BF16["v5e"], "v5e?"


def analytic_step_flops(b, s, cfg, length, target_vocab):
    """Matmul FLOPs for one optimizer step (fwd + 2x bwd on trainable path;
    teacher projection fwd-only), mirroring the reference's FlopCounterMode
    accounting (bench_domino_mfu.py)."""
    h = cfg.hidden_size
    d = cfg.resolved_head_dim
    heads = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    inter = cfg.intermediate_size
    vd = cfg.draft_vocab_size
    th = cfg.resolved_target_hidden_size

    def mm(m, k, n):
        return 2.0 * m * k * n

    tok = b * s
    per_step = 0.0
    per_step += mm(tok, 2 * h, heads * d)            # q
    per_step += 2 * mm(tok, 2 * h, kvh * d)          # k, v
    per_step += mm(tok, heads * d, h)                # o
    per_step += 2.0 * b * heads * s * s * d * 2      # qk^T and pv
    per_step += 3 * mm(tok, h, inter)                # gate, up, down
    per_step += mm(tok, h, vd)                       # lm_head
    fc = mm(tok, 3 * th, h)
    train_fwd = length * per_step + fc
    # teacher (no grad): draft-vocab head + full-vocab logsumexp stream
    teacher = mm(tok, th, vd) + mm(tok, th, target_vocab)
    return 3.0 * train_fwd + teacher


def domino_step_flops(b, s, cfg, num_anchors, attn_chunk_blocks=8):
    """Matmul FLOPs for one Domino optimizer step (our model's actual
    compute graph; 3x trainable, 2x frozen-weight paths, no remat)."""
    h = cfg.hidden_size
    d = cfg.head_dim or (h // cfg.num_attention_heads)
    heads = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    inter = cfg.intermediate_size
    v = cfg.vocab_size
    n_capture = len(cfg.resolved_target_layer_ids)
    block = cfg.block_size
    q_len = num_anchors * block
    tc = b * s          # context tokens
    tq = b * q_len      # draft (mask-token) tokens
    # mirror dflash_attention's semantics: chunk_blocks <= 0 means all
    # anchors in one chunk (every query block sees every other block's keys)
    cq = (
        min(attn_chunk_blocks, num_anchors)
        if attn_chunk_blocks > 0
        else num_anchors
    ) * block

    def mm(m, k, n):
        return 2.0 * m * k * n

    train = 0.0
    train += mm(tc, n_capture * h, h)                   # hidden projector
    layers = cfg.num_hidden_layers
    train += layers * 2 * mm(tc, h, kvh * d)            # ctx k, v
    train += layers * (mm(tq, h, heads * d) + 2 * mm(tq, h, kvh * d))
    train += layers * mm(tq, heads * d, h)              # o
    train += layers * 2 * (2.0 * b * heads * q_len * (s + cq) * d)  # qk, pv
    train += layers * 3 * mm(tq, h, inter)              # gate, up, down
    if cfg.gru_hidden_dim:                              # domino GRU + MLP
        gh = cfg.gru_hidden_dim
        train += 2.0 * tq * (h * 3 * gh + gh * 3 * gh)
        train += mm(tq, gh + h, cfg.emb_dim)
        train += mm(tq, cfg.emb_dim, v)
    teacher = 0.0
    if cfg.markov_rank:                                 # dspark markov bias
        r = cfg.markov_rank
        train += mm(tq, r, v)       # latent @ W2 (fwd + d_lat + dW2 = 3x)
        if cfg.markov_head_type == "gated":
            train += mm(tq, h + r, r)
        elif cfg.markov_head_type == "rnn":
            # joint_proj consumes concat(state[r], prev_emb[r], hidden[h])
            train += mm(tq, 2 * r + h, 3 * r)
    if cfg.projector_type == "dspark":
        if cfg.enable_confidence_head:
            train += mm(tq, h, 1)
        # teacher projection of aligned target hidden (stop-grad, fwd-only;
        # the bench always feeds target_last_hidden_states for dspark)
        teacher = mm(tq, h, v)
    frozen = mm(tq, h, v)                               # base logits (lm_head)
    return 3.0 * train + 2.0 * frozen + teacher


def bench_domino(batch, seq, steps, algo="domino"):
    import jax
    import jax.numpy as jnp

    from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
    from specforge_tpu.training.optimizer import OptimizerConfig, build_optimizer
    from specforge_tpu.training.train_step import TrainState, make_train_step

    num_anchors = int(os.environ.get("BENCH_ANCHORS", "256"))
    attn_backend = os.environ.get("BENCH_DFLASH_ATTN", "auto")
    attn_chunk_blocks = int(os.environ.get("BENCH_ATTN_CHUNK_BLOCKS", "8"))
    # swept on v5e with the fused objective + factored moments:
    # 64 → 63.4% MFU, 32 → 62.6%, 16 → 57.2%; 128+ OOMs 15.75G HBM.
    # obj_chunk=64 only fits because the factored optimizer frees the
    # Adam state (bf16-moment Adam OOMs by 246M at 64).
    obj_chunk = int(os.environ.get("BENCH_OBJ_CHUNK", "64"))
    moments_dtype = os.environ.get("BENCH_MOMENTS_DTYPE", "bfloat16")
    vocab = int(os.environ.get("BENCH_TARGET_VOCAB", "151936"))
    # the reference anchor config: configs/qwen3-8b-domino.json
    # (qwen3-8b-dflash.json = same backbone without the domino head)
    dflash_cfg = {
        "mask_token_id": 151669,
        "target_layer_ids": [1, 9, 17, 25, 33],
    }
    if algo == "domino":
        dflash_cfg.update({
            "projector_type": "domino",
            "pure_draft_prefix_len": 1,
            "emb_dim": 256,
            "gru_hidden_dim": 1024,
            "shift_label": True,
        })
    elif algo == "dspark":
        # configs/qwen3-8b-dspark.json heads
        dflash_cfg.update({
            "projector_type": "dspark",
            "markov_rank": 64,
            "markov_head_type": "gated",
            "enable_confidence_head": True,
        })
    arch = {
        "domino": "DominoDraftModel",
        "dspark": "DSparkDraftModel",
    }.get(algo, "DFlashDraftModel")
    draft_config = {
        "architectures": [arch],
        "attention_backend": attn_backend,
        "attn_chunk_blocks": attn_chunk_blocks,
        "vocab_size": vocab,
        "hidden_size": 4096,
        "intermediate_size": 12288,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "head_dim": 128,
        "num_hidden_layers": 5,
        "num_target_layers": 36,
        "max_position_embeddings": 40960,
        "rope_theta": 1e6,
        "block_size": 16,
        "dflash_config": dflash_cfg,
    }
    reg = builtin_algorithm_registry().resolve(algo)
    providers = reg.providers
    options = {
        "num_anchors": num_anchors,
        "objective_chunk_blocks": obj_chunk,
        "mask_token_id": 151669,
        "seed": 0,
        "lambda_start": 1.0,
        "decay_ratio": 0.5,
    }
    draft, cfg = providers.build_draft(draft_config, dtype=jnp.bfloat16)
    model = providers.build_training_model(draft, options)
    strategy = providers.build_strategy(model, options)

    rng = jax.random.PRNGKey(0)
    print("initializing domino params...", file=sys.stderr)
    variables = providers.init_variables(model, cfg, options, rng, seq)
    # 1.07B-param draft + fp32 Adam state exceeds one v5e chip's 15.75G HBM.
    # The reference fits by CPU-offloading the Adam masters
    # (specforge/optimizer.py:12); the single-chip TPU answer is factored
    # second moments (~0 state), which also frees HBM for the faster
    # obj_chunk=64 objective. Multi-chip runs shard full Adam over fsdp.
    factored = os.environ.get("BENCH_FACTORED_MOMENTS", "1") == "1"
    tx = build_optimizer(
        OptimizerConfig(
            lr=1e-4,
            moments_dtype=moments_dtype,
            factored_second_moments=factored,
            adam_b1=0.0 if factored else 0.9,
        ),
        1000,
    )
    state = TrainState.create(variables["params"], variables.get("buffers", {}), tx)
    variables = None
    step_fn = make_train_step(
        strategy, tx, accum_steps=1, total_steps=1000,
        metadata={"target_repr": "hidden_state"},
        grads_dtype=os.environ.get("BENCH_GRADS_DTYPE", "float32"),
        compute_params_dtype=os.environ.get("BENCH_COMPUTE_PARAMS_DTYPE")
        or None,
    )

    np_rng = np.random.default_rng(0)
    n_capture = len(cfg.resolved_target_layer_ids)
    batch_tensors = {
        "input_ids": jnp.asarray(
            np_rng.integers(0, vocab, size=(1, batch, seq))
        ),
        "loss_mask": jnp.asarray(
            (np_rng.random((1, batch, seq, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_states": jnp.asarray(
            np_rng.normal(size=(1, batch, seq, n_capture * cfg.hidden_size))
        ).astype(jnp.bfloat16),
    }
    if algo == "dspark":
        batch_tensors["target_last_hidden_states"] = jnp.asarray(
            np_rng.normal(size=(1, batch, seq, cfg.hidden_size))
        ).astype(jnp.bfloat16)
    import jax as _jax

    head_w = _jax.random.normal(
        _jax.random.PRNGKey(1), (vocab, cfg.hidden_size), jnp.bfloat16
    ) * 0.02
    embed_w = _jax.random.normal(
        _jax.random.PRNGKey(2), (vocab, cfg.hidden_size), jnp.bfloat16
    ) * 0.02
    frozen = {"target_head_weight": head_w, "target_embed_weight": embed_w}

    print("compiling domino train step...", file=sys.stderr)
    t0 = time.monotonic()
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])
    print(f"compile+first step: {time.monotonic()-t0:.1f}s", file=sys.stderr)
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])
    t0 = time.monotonic()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_tensors, frozen)
    final_loss = float(metrics["train/loss"])
    dt = (time.monotonic() - t0) / steps

    # the Pallas backend ignores attn_chunk_blocks (it tiles by block and
    # skips masked context tiles); when it is the active backend, account
    # MFU against the NOMINAL chunked graph at the default chunk_blocks=8 so
    # the env knob cannot shift reported MFU without changing actual compute.
    from specforge_tpu.models.draft.dflash import DFLASH_PALLAS_MIN_CTX

    pallas_active = attn_backend == "pallas" or (
        attn_backend == "auto" and seq >= DFLASH_PALLAS_MIN_CTX
    )
    flops = domino_step_flops(
        batch, seq, cfg, num_anchors,
        attn_chunk_blocks=8 if pallas_active else attn_chunk_blocks,
    )
    peak, gen = detect_peak()
    mfu = flops / dt / peak
    print(
        f"{algo} step={dt*1000:.1f}ms flops={flops/1e12:.2f}T achieved="
        f"{flops/dt/1e12:.1f}TF/s peak[{gen}]={peak/1e12:.0f}TF/s "
        f"loss={final_loss:.3f}",
        file=sys.stderr,
    )
    return mfu, f"{algo}_train_step_mfu"


def peagle_step_flops(s, cfg, num_depths, dsr, dsr_min, num_docs=1):
    """Matmul FLOPs for one P-EAGLE optimizer step (bs 1): COD queries
    through the 4-layer draft + draft-vocab head (3x trainable), teacher
    head fwd-only. ``num_docs`` > 1 = packed row of equal-length documents:
    attention is same-document-only, so qk/pv count per-document dense
    blocks ([T,T]/num_docs) — crediting cross-document tiles the Pallas
    kernel never computes would inflate MFU."""
    import math as _math

    h = cfg.hidden_size
    d = cfg.resolved_head_dim
    heads = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    inter = cfg.intermediate_size
    vd = cfg.draft_vocab_size
    v = cfg.vocab_size
    caps = [s] + [
        int(_math.ceil(s * max(dsr ** depth, dsr_min)))
        for depth in range(1, num_depths)
    ]
    q = sum(caps)

    def mm(m, k, n):
        return 2.0 * m * k * n

    layers = cfg.num_hidden_layers
    train = 0.0
    train += mm(s, 3 * h, h)                            # fc projector
    train += layers * (
        mm(q, 2 * h, heads * d) + 2 * mm(q, 2 * h, kvh * d)
        + mm(q, heads * d, h) + 3 * mm(q, h, inter)
    )
    train += layers * 2 * (2.0 * heads * q * q * d) / num_docs  # qk, pv
    train += mm(q, h, vd)                               # draft-vocab head
    teacher = mm(s, h, v)                               # frozen head, fwd-only
    return 3.0 * train + teacher


def bench_peagle(seq, steps):
    import jax
    import jax.numpy as jnp

    from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
    from specforge_tpu.training.optimizer import OptimizerConfig, build_optimizer
    from specforge_tpu.training.train_step import TrainState, make_train_step

    vocab = int(os.environ.get("BENCH_TARGET_VOCAB", "151936"))
    moments_dtype = os.environ.get("BENCH_MOMENTS_DTYPE", "bfloat16")
    # P-EAGLE trains its 152k-vocab embedding: dense Adam state alone is
    # ~12 GB fp32 — past one v5e chip's 15.75 GB. Factored second moments
    # + no first moment (adam_b1=0) make the single-chip config feasible.
    factored = os.environ.get("BENCH_FACTORED_MOMENTS", "1") == "1"
    # batched COD (round-3): bs>1 amortizes the 1.5B draft's HBM-bound
    # master-param traffic that made bs1 the MFU floor
    batch = int(os.environ.get("BENCH_PEAGLE_BATCH", "1"))
    # COD sequence packing (round-5): N equal docs of BENCH_SEQ tokens per
    # row — the bs1 answer to the same HBM amortization (PackingCollator)
    pack = int(os.environ.get("BENCH_PEAGLE_PACK", "1"))
    row_len = seq * pack
    num_depths, dsr, dsr_min = 8, 0.7, 0.2
    draft_config = {
        "architectures": ["PEagleDraftModel"],
        "vocab_size": vocab,
        "draft_vocab_size": 32000,
        "hidden_size": 4096,
        "intermediate_size": 12288,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "head_dim": 128,
        "num_hidden_layers": 4,
        "max_position_embeddings": 40960,
        "rope_theta": 1e6,
    }
    reg = builtin_algorithm_registry().resolve("peagle")
    providers = reg.providers
    options = {
        "num_depths": num_depths,
        "down_sample_ratio": dsr,
        "down_sample_ratio_min": dsr_min,
        "seed": 0,
    }
    draft, cfg = providers.build_draft(draft_config, dtype=jnp.bfloat16)
    model = providers.build_training_model(draft, options)
    strategy = providers.build_strategy(model, options)
    rng = jax.random.PRNGKey(0)
    print("initializing peagle params...", file=sys.stderr)
    variables = providers.init_variables(model, cfg, options, rng, row_len)
    # row-sparse embedding update (exact under the factored b1=0 regime):
    # the 152k-row table's dense grad/master traffic disappears
    sparse = factored and os.environ.get("BENCH_SPARSE_EMBED", "1") == "1"
    opt_cfg = OptimizerConfig(
        lr=1e-4,
        moments_dtype=moments_dtype,
        factored_second_moments=factored,
        adam_b1=0.0 if factored else 0.9,
        row_sparse_embedding=sparse,
    )
    tx = build_optimizer(opt_cfg, 1000, include_clip=not sparse)
    plan = None
    if sparse:
        from specforge_tpu.training.optimizer import build_lr_schedule
        from specforge_tpu.training.train_step import SparseEmbedPlan

        plan = SparseEmbedPlan(
            strategy.sparse_embed_path, strategy.sparse_embed_delta_shape,
            opt_cfg, build_lr_schedule(opt_cfg, 1000),
        )
    state = TrainState.create(
        variables["params"], variables.get("buffers", {}), tx,
        sparse_embed_path=plan.path if plan else None,
    )
    variables = None
    step_fn = make_train_step(
        strategy, tx, accum_steps=1, total_steps=1000,
        metadata={"target_repr": "hidden_state"},
        grads_dtype=os.environ.get("BENCH_GRADS_DTYPE", "float32"),
        sparse_embed=plan,
    )
    np_rng = np.random.default_rng(0)
    loss_mask = (np_rng.random((1, batch, row_len, 1)) > 0.2).astype(np.int32)
    if pack > 1:
        # document boundaries: the teacher shift's label at each doc's last
        # position belongs to the next document (PackingCollator contract)
        loss_mask[:, :, seq - 1 :: seq] = 0
    batch_tensors = {
        "input_ids": jnp.asarray(
            np_rng.integers(0, vocab, size=(1, batch, row_len))
        ),
        "attention_mask": jnp.ones((1, batch, row_len), jnp.int32),
        "loss_mask": jnp.asarray(loss_mask),
        "hidden_state": jnp.asarray(
            np_rng.normal(size=(1, batch, row_len, 3 * cfg.hidden_size))
        ).astype(jnp.bfloat16),
        "target": jnp.asarray(
            np_rng.normal(size=(1, batch, row_len, cfg.hidden_size))
        ).astype(jnp.bfloat16),
    }
    if pack > 1:
        batch_tensors["lengths"] = jnp.full(
            (1, batch, pack), seq, jnp.int32
        )
    head_w = jax.random.normal(
        jax.random.PRNGKey(1), (vocab, cfg.hidden_size), jnp.bfloat16
    ) * 0.02
    frozen = {"target_head_weight": head_w}
    print("compiling peagle train step...", file=sys.stderr)
    t0 = time.monotonic()
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])
    print(f"compile+first step: {time.monotonic()-t0:.1f}s", file=sys.stderr)
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])
    t0 = time.monotonic()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_tensors, frozen)
    final_loss = float(metrics["train/loss"])
    dt = (time.monotonic() - t0) / steps
    flops = batch * peagle_step_flops(
        row_len, cfg, num_depths, dsr, dsr_min, num_docs=pack
    )
    peak, gen = detect_peak()
    mfu = flops / dt / peak
    print(
        f"peagle b{batch} pack{pack} step={dt*1000:.1f}ms flops={flops/1e12:.2f}T achieved="
        f"{flops/dt/1e12:.1f}TF/s peak[{gen}]={peak/1e12:.0f}TF/s "
        f"loss={final_loss:.3f}",
        file=sys.stderr,
    )
    return mfu, "peagle_train_step_mfu"


def main():
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    seq = int(os.environ.get("BENCH_SEQ", "768"))
    length = int(os.environ.get("BENCH_TTT_LENGTH", "7"))
    steps = int(os.environ.get("BENCH_STEPS", "5"))

    algo = os.environ.get("BENCH_ALGO", "domino")
    if algo == "peagle":
        mfu, metric = bench_peagle(seq, steps)
        print(json.dumps({
            "metric": metric,
            "value": round(mfu, 4),
            "unit": "fraction_of_peak_bf16",
            "vs_baseline": round(mfu / BASELINE_MFU, 4),
        }))
        return
    if algo in ("domino", "dflash", "dspark"):
        mfu, metric = bench_domino(batch, seq, steps, algo=algo)
        print(json.dumps({
            "metric": metric,
            "value": round(mfu, 4),
            "unit": "fraction_of_peak_bf16",
            "vs_baseline": round(mfu / BASELINE_MFU, 4),
        }))
        return

    import jax
    import jax.numpy as jnp

    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )
    from specforge_tpu.training.optimizer import (
        OptimizerConfig,
        build_optimizer,
        cast_frozen_to,
        embedding_freeze_mask,
    )
    from specforge_tpu.training.strategies import Eagle3TrainStrategy
    from specforge_tpu.training.train_step import TrainState, make_train_step

    target_vocab = int(os.environ.get("BENCH_TARGET_VOCAB", "151936"))
    cfg = Eagle3Config(
        vocab_size=target_vocab,
        draft_vocab_size=int(os.environ.get("BENCH_DRAFT_VOCAB", "32000")),
        hidden_size=4096,
        intermediate_size=12288,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        max_position_embeddings=40960,
        rope_theta=1e6,
    )

    attn_backend = os.environ.get("BENCH_ATTN", "pallas")
    draft = LlamaEagle3Draft(
        cfg, dtype=jnp.bfloat16, attention_backend=attn_backend
    )
    model = OnlineEagle3Model(
        draft_model=draft, length=length,
        teacher_dtype=jnp.bfloat16,
    )
    strategy = Eagle3TrainStrategy(model, compact_teacher=True)

    rng = jax.random.PRNGKey(0)
    print("initializing params...", file=sys.stderr)
    # init on tiny shapes (shapes don't matter for param shapes), then batch
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8, 1), jnp.int32),
        jnp.zeros((1, 8, 3 * cfg.hidden_size), jnp.bfloat16),
        jnp.zeros((1, 8, cfg.vocab_size), jnp.bfloat16),
    )

    mask = embedding_freeze_mask(variables["params"])
    # frozen embedding lives in bf16 (reference keeps frozen tables in model
    # dtype; fp32 masters exist only for trainable params)
    params = cast_frozen_to(variables["params"], mask, jnp.bfloat16)
    buffers = variables["buffers"]
    variables = None  # free the fp32 originals before allocating opt state
    tx = build_optimizer(OptimizerConfig(lr=1e-4), 1000)
    state = TrainState.create(params, buffers, tx, trainable_mask=mask)
    params = None
    step_fn = make_train_step(
        strategy, tx, accum_steps=1, total_steps=1000,
        metadata={"target_repr": "hidden_state"},
        trainable_mask=mask,
    )

    np_rng = np.random.default_rng(0)
    batch_tensors = {
        "input_ids": jnp.asarray(
            np_rng.integers(0, cfg.vocab_size, size=(1, batch, seq))
        ),
        "attention_mask": jnp.ones((1, batch, seq), jnp.int32),
        "loss_mask": jnp.asarray(
            (np_rng.random((1, batch, seq, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_state": jnp.asarray(
            np_rng.normal(size=(1, batch, seq, 3 * cfg.hidden_size))
        ).astype(jnp.bfloat16),
        "target": jnp.asarray(
            np_rng.normal(size=(1, batch, seq, cfg.hidden_size))
        ).astype(jnp.bfloat16),
    }
    head_w = (
        jax.random.normal(
            jax.random.PRNGKey(1), (cfg.vocab_size, cfg.hidden_size),
            jnp.bfloat16,
        )
        * 0.02
    )
    frozen = {"target_head_weight": head_w}

    print("compiling train step...", file=sys.stderr)
    t0 = time.monotonic()
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])  # forces execution (tunnel-safe sync)
    print(f"compile+first step: {time.monotonic()-t0:.1f}s", file=sys.stderr)

    # warmup one more, then timed steps
    state, metrics = step_fn(state, batch_tensors, frozen)
    _ = float(metrics["train/loss"])
    t0 = time.monotonic()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_tensors, frozen)
    final_loss = float(metrics["train/loss"])  # chains through all steps
    dt = (time.monotonic() - t0) / steps

    flops = analytic_step_flops(batch, seq, cfg, length, cfg.vocab_size)
    peak, gen = detect_peak()
    mfu = flops / dt / peak
    print(
        f"step={dt*1000:.1f}ms flops={flops/1e12:.2f}T achieved="
        f"{flops/dt/1e12:.1f}TF/s peak[{gen}]={peak/1e12:.0f}TF/s "
        f"loss={final_loss:.3f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "eagle3_train_step_mfu",
        "value": round(mfu, 4),
        "unit": "fraction_of_peak_bf16",
        "vs_baseline": round(mfu / BASELINE_MFU, 4),
    }))


if __name__ == "__main__":
    main()

"""DFlash-family: chunked attention vs dense oracle, GRU parity vs torch,
chunked objective vs unchunked, and end-to-end training for all three
strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.algorithms.common.dflash_family import (
    OnlineDFlashModel,
    OnlineDominoModel,
    OnlineDSparkModel,
)
from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel
from specforge_tpu.models.draft.domino import GRU, DominoDraftModel
from specforge_tpu.models.draft.dspark import DSparkDraftModel
from specforge_tpu.ops.attention import dflash_attention, NEG_INF
from specforge_tpu.ops.chunking import checkpointed_chunk_reduce
from specforge_tpu.ops.masks import dflash_dense_mask
from specforge_tpu.training.optimizer import OptimizerConfig, build_optimizer
from specforge_tpu.training.strategies import (
    DFlashTrainStrategy,
    DominoTrainStrategy,
    DSparkTrainStrategy,
    StepContext,
)
from specforge_tpu.training.train_step import TrainState, make_train_step

V, H, S, BS, N_ANCHORS, LAYERS = 64, 32, 24, 4, 4, 2
MASK_TOKEN = V - 1

BASE_CFG = dict(
    vocab_size=V, hidden_size=H, intermediate_size=64,
    num_attention_heads=4, num_key_value_heads=2, num_hidden_layers=LAYERS,
    num_target_layers=8, block_size=BS, mask_token_id=MASK_TOKEN,
    max_position_embeddings=128,
)


def dense_oracle_attention(q, k_ctx, v_ctx, k_drf, v_drf, anchors, keep,
                           block_size, sliding=None):
    """Dense-mask attention oracle for dflash_attention."""
    b, h, q_len, d = q.shape
    kvh = k_ctx.shape[1]
    g = h // kvh
    k_all = jnp.concatenate([k_ctx, k_drf], axis=2)
    v_all = jnp.concatenate([v_ctx, v_drf], axis=2)
    allow = dflash_dense_mask(anchors, keep, k_ctx.shape[2], block_size,
                              sliding)  # [B,1,Q,KV]
    qg = q.reshape(b, kvh, g, q_len, d)
    w = jnp.einsum("bkgsd,bktd->bkgst", qg, k_all,
                   preferred_element_type=jnp.float32) / (d ** 0.5)
    w = jnp.where(allow[:, :, None], w, NEG_INF)
    p = jax.nn.softmax(w, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgst,bktd->bkgsd", p, v_all)
    keep_q = jnp.repeat(keep, block_size, axis=1)
    out = out * keep_q[:, None, None, :, None].astype(out.dtype)
    return out.reshape(b, h, q_len, d).transpose(0, 2, 1, 3).reshape(
        b, q_len, h * d
    )


@pytest.mark.parametrize("sliding", [None, 5])
def test_chunked_attention_matches_dense(sliding):
    rng = np.random.default_rng(0)
    b, h, kvh, d, n = 2, 4, 2, 8, 4
    q_len = n * BS
    q = jnp.asarray(rng.normal(size=(b, h, q_len, d)).astype(np.float32))
    k_ctx = jnp.asarray(rng.normal(size=(b, kvh, S, d)).astype(np.float32))
    v_ctx = jnp.asarray(rng.normal(size=(b, kvh, S, d)).astype(np.float32))
    k_drf = jnp.asarray(rng.normal(size=(b, kvh, q_len, d)).astype(np.float32))
    v_drf = jnp.asarray(rng.normal(size=(b, kvh, q_len, d)).astype(np.float32))
    anchors = jnp.asarray(
        np.sort(rng.integers(1, S - 1, size=(b, n)), axis=1).astype(np.int32)
    )
    keep = np.ones((b, n), bool)
    keep[1, 3] = False
    keep = jnp.asarray(keep)

    ours = dflash_attention(q, k_ctx, v_ctx, k_drf, v_drf, anchors, keep, BS,
                            chunk_blocks=2, sliding_window=sliding)
    oracle = dense_oracle_attention(q, k_ctx, v_ctx, k_drf, v_drf, anchors,
                                    keep, BS, sliding)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("sliding,s", [
    (None, 24), (5, 24),
    (None, 21),  # ctx not a tk multiple: exercises the zero-pad path
])
def test_pallas_dflash_attention_matches_dense(sliding, s):
    """Pallas in-kernel-mask DFlash attention (interpret mode) == dense
    oracle: forward and gradients w.r.t. every tensor input."""
    from specforge_tpu.ops.dflash_pallas import dflash_flash_attention

    rng = np.random.default_rng(2)
    b, h, kvh, d, n, bs = 2, 4, 2, 8, 4, 4
    q_len = n * bs
    q = jnp.asarray(rng.normal(size=(b, h, q_len, d)).astype(np.float32))
    k_ctx = jnp.asarray(rng.normal(size=(b, kvh, s, d)).astype(np.float32))
    v_ctx = jnp.asarray(rng.normal(size=(b, kvh, s, d)).astype(np.float32))
    k_drf = jnp.asarray(rng.normal(size=(b, kvh, q_len, d)).astype(np.float32))
    v_drf = jnp.asarray(rng.normal(size=(b, kvh, q_len, d)).astype(np.float32))
    anchors = jnp.asarray(
        np.sort(rng.integers(1, s - 1, size=(b, n)), axis=1).astype(np.int32)
    )
    keep = np.ones((b, n), bool)
    keep[1, 3] = False
    keep = jnp.asarray(keep)

    def run_pallas(q, kc, vc, kd, vd):
        return dflash_flash_attention(
            q, kc, vc, kd, vd, anchors, keep, bs,
            sliding_window=sliding, tq=8, tk=8, interpret=True,
        )

    def run_oracle(q, kc, vc, kd, vd):
        return dense_oracle_attention(q, kc, vc, kd, vd, anchors, keep, bs,
                                      sliding)

    out_p = run_pallas(q, k_ctx, v_ctx, k_drf, v_drf)
    out_o = run_oracle(q, k_ctx, v_ctx, k_drf, v_drf)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                               rtol=2e-5, atol=2e-6)

    cotangent = jnp.asarray(
        rng.normal(size=out_o.shape).astype(np.float32)
    )

    def loss(fn):
        return lambda *args: jnp.sum(fn(*args) * cotangent)

    grads_p = jax.grad(loss(run_pallas), argnums=(0, 1, 2, 3, 4))(
        q, k_ctx, v_ctx, k_drf, v_drf
    )
    grads_o = jax.grad(loss(run_oracle), argnums=(0, 1, 2, 3, 4))(
        q, k_ctx, v_ctx, k_drf, v_drf
    )
    for name, gp, go in zip("q kc vc kd vd".split(), grads_p, grads_o):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(go), rtol=3e-5, atol=3e-6,
            err_msg=name,
        )


def test_pallas_backend_through_dflash_model():
    """OnlineDFlashModel with attention_backend='pallas_interpret' == the
    chunked XLA backend (loss + grads)."""
    cfg = DFlashConfig.from_dict(BASE_CFG)
    kwargs = dict(
        mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2,
    )
    model_x = OnlineDFlashModel(
        draft_model=DFlashDraftModel(cfg, dtype=jnp.float32,
                                     attn_chunk_blocks=2),
        **kwargs,
    )
    model_p = OnlineDFlashModel(
        draft_model=DFlashDraftModel(cfg, dtype=jnp.float32,
                                     attn_chunk_blocks=2,
                                     attention_backend="pallas_interpret"),
        **kwargs,
    )
    _, variables, _, _, call_args = _build("dflash")

    def run(model, params):
        return model.apply({"params": params}, *call_args)[0]

    lx, gx = jax.value_and_grad(lambda p: run(model_x, p))(
        variables["params"]
    )
    lp, gp = jax.value_and_grad(lambda p: run(model_p, p))(
        variables["params"]
    )
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    _tree_allclose(gp, gx, rtol=5e-4, atol=1e-5)


def test_gru_matches_torch():
    rng = np.random.default_rng(0)
    hidden_dim, in_dim, b, t = 8, 6, 3, 5
    gru = GRU(hidden_dim, dtype=jnp.float32)
    xs = jnp.asarray(rng.normal(size=(b, t, in_dim)).astype(np.float32))
    params = gru.init(jax.random.PRNGKey(0), xs)
    out = gru.apply(params, xs)

    ref = torch.nn.GRU(in_dim, hidden_dim, num_layers=1, batch_first=True,
                       bias=False)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(
            torch.tensor(np.asarray(params["params"]["weight_ih"]))
        )
        ref.weight_hh_l0.copy_(
            torch.tensor(np.asarray(params["params"]["weight_hh"]))
        )
        expected, _ = ref(torch.tensor(np.asarray(xs)))
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_chunked_reduce_matches_unchunked():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.random((2, 8, 4)).astype(np.float32))

    def fn(xc, wc):
        return jnp.sum(xc * wc), jnp.sum(wc), jnp.sum(xc * xc * wc, axis=(0, 1))

    full = fn(x, w)
    chunked = checkpointed_chunk_reduce(fn, x, w, chunk_size=2, axis=1)
    for f, c in zip(full, chunked):
        np.testing.assert_allclose(np.asarray(f), np.asarray(c), rtol=1e-5)
    # gradient flows through the chunked path identically
    g_full = jax.grad(lambda a: fn(a, w)[0])(x)
    g_chunk = jax.grad(
        lambda a: checkpointed_chunk_reduce(fn, a, w, chunk_size=2, axis=1)[0]
    )(x)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               rtol=1e-5)


def _build(kind="dflash", **extra_cfg):
    cfg = DFlashConfig.from_dict({**BASE_CFG, **extra_cfg})
    draft_cls = {
        "dflash": DFlashDraftModel,
        "domino": DominoDraftModel,
        "dspark": DSparkDraftModel,
    }[kind]
    draft = draft_cls(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
    wrapper_cls = {
        "dflash": OnlineDFlashModel,
        "domino": OnlineDominoModel,
        "dspark": OnlineDSparkModel,
    }[kind]
    kwargs = dict(
        draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2,
    )
    if kind == "domino":
        kwargs["shift_label"] = bool(extra_cfg.get("shift_label", False))
    model = wrapper_cls(**kwargs)

    rng = np.random.default_rng(0)
    n_capture = len(cfg.resolved_target_layer_ids)
    tensors = {
        "input_ids": jnp.asarray(rng.integers(0, V - 1, size=(2, S))),
        "hidden_states": jnp.asarray(
            rng.normal(size=(2, S, n_capture * H)).astype(np.float32)
        ),
        "loss_mask": jnp.asarray(
            (rng.random((2, S)) > 0.2).astype(np.int32)
        ),
        "target_last_hidden_states": jnp.asarray(
            rng.normal(size=(2, S, H)).astype(np.float32)
        ),
    }
    frozen = {
        "target_head_weight": jnp.asarray(
            rng.normal(size=(V, H)).astype(np.float32) * 0.3
        ),
        "target_embed_weight": jnp.asarray(
            rng.normal(size=(V, H)).astype(np.float32) * 0.3
        ),
    }
    call_args = [
        tensors["input_ids"], tensors["hidden_states"], tensors["loss_mask"],
        frozen["target_head_weight"], frozen["target_embed_weight"],
        jax.random.PRNGKey(0),
    ]
    if kind == "dspark":
        call_args.append(tensors["target_last_hidden_states"])
    variables = model.init(jax.random.PRNGKey(1), *call_args)
    return model, variables, tensors, frozen, call_args


def test_dflash_forward_and_grads():
    model, variables, _, _, call_args = _build("dflash")
    loss, accuracy, metrics = model.apply(variables, *call_args)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(accuracy) <= 1.0
    num, den = metrics["loss_terms"]
    np.testing.assert_allclose(float(loss), float(num) / float(den), rtol=1e-6)

    grads = jax.grad(
        lambda p: model.apply({"params": p}, *call_args)[0]
    )(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dpace_variants_run():
    for loss_type in ("dpace", "dpace-cumulative-confidence-only",
                      "dpace-continuation-value-only"):
        cfg = DFlashConfig.from_dict(BASE_CFG)
        draft = DFlashDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
        model = OnlineDFlashModel(
            draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
            num_anchors=N_ANCHORS, objective_chunk_blocks=2,
            loss_type=loss_type,
        )
        _, variables, _, _, call_args = _build("dflash")
        loss, _, metrics = model.apply(variables, *call_args)
        assert np.isfinite(float(loss))
        # dpace normalizes by batch size
        assert float(metrics["loss_terms"][1]) == 2.0


@pytest.mark.parametrize("shift_label", [False, True])
def test_domino_forward(shift_label):
    model, variables, _, _, call_args = _build(
        "domino", projector_type="domino", emb_dim=16, gru_hidden_dim=16,
        shift_label=shift_label, pure_draft_prefix_len=1,
    )
    loss, accuracy, metrics = model.apply(variables, *call_args, 0.3)
    assert np.isfinite(float(loss))
    for key in ("final_loss", "base_loss", "accept_len", "base_accept_len"):
        assert np.isfinite(float(metrics[key]))
    assert float(metrics["lambda_base"]) == pytest.approx(0.3)


@pytest.mark.parametrize("markov_type", ["vanilla", "gated", "rnn"])
def test_dspark_forward(markov_type):
    model, variables, _, _, call_args = _build(
        "dspark", projector_type="dspark", markov_rank=8,
        markov_head_type=markov_type, enable_confidence_head=True,
    )
    loss, accuracy, metrics = model.apply(variables, *call_args)
    assert np.isfinite(float(loss))
    rm = metrics["ratio_metrics"]
    for key in ("acc", "ce_loss", "l1_loss", "confidence_loss",
                "teacher_agreement", "tau_probabilistic"):
        assert key in rm


def _tree_allclose(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for key, va in flat_a:
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(flat_b[jax.tree_util.keystr(key)]),
            rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(key),
        )


@pytest.mark.parametrize("loss_type", [
    "dflash", "dpace", "dpace-cumulative-confidence-only",
    "dpace-continuation-value-only",
])
def test_fused_dflash_objective_matches_checkpointed(loss_type):
    """Fused forward-gradient objective == checkpointed-remat objective:
    loss, metrics, and parameter gradients."""
    cfg = DFlashConfig.from_dict(BASE_CFG)
    draft = DFlashDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
    kwargs = dict(
        draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2, loss_type=loss_type,
        loss_decay_gamma=3.0 if loss_type == "dflash" else None,
    )
    fused = OnlineDFlashModel(**kwargs, fused_objective=True)
    plain = OnlineDFlashModel(**kwargs, fused_objective=False)
    _, variables, _, _, call_args = _build("dflash")

    def run(model, params):
        loss, acc, metrics = model.apply({"params": params}, *call_args)
        return loss, (acc, metrics)

    (lf, (af, mf)), gf = jax.value_and_grad(
        lambda p: run(fused, p), has_aux=True
    )(variables["params"])
    (lp, (ap, mp)), gp = jax.value_and_grad(
        lambda p: run(plain, p), has_aux=True
    )(variables["params"])
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    np.testing.assert_allclose(float(af), float(ap), rtol=1e-6)
    np.testing.assert_allclose(
        float(mf["loss_terms"][0]), float(mp["loss_terms"][0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(mf["loss_terms"][1]), float(mp["loss_terms"][1]), rtol=1e-6
    )
    _tree_allclose(gf, gp, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("shift_label", [False, True])
@pytest.mark.parametrize("lambda_base", [0.0, 0.37, 1.0])
def test_fused_domino_objective_matches_checkpointed(shift_label, lambda_base):
    extra = dict(
        projector_type="domino", emb_dim=16, gru_hidden_dim=16,
        shift_label=shift_label, pure_draft_prefix_len=1,
    )
    cfg = DFlashConfig.from_dict({**BASE_CFG, **extra})
    draft = DominoDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
    kwargs = dict(
        draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2,
        shift_label=shift_label, loss_decay_gamma=4.0,
    )
    fused = OnlineDominoModel(**kwargs, fused_objective=True)
    plain = OnlineDominoModel(**kwargs, fused_objective=False)
    _, variables, _, _, call_args = _build("domino", **extra)

    lam = jnp.asarray(lambda_base, jnp.float32)

    def run(model, params):
        loss, acc, metrics = model.apply({"params": params}, *call_args, lam)
        return loss, (acc, metrics)

    (lf, (af, mf)), gf = jax.jit(jax.value_and_grad(
        lambda p: run(fused, p), has_aux=True
    ))(variables["params"])
    (lp, (ap, mp)), gp = jax.jit(jax.value_and_grad(
        lambda p: run(plain, p), has_aux=True
    ))(variables["params"])
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(af), float(ap), rtol=1e-6)
    for key in ("final_loss", "base_loss", "base_accuracy", "accept_len",
                "base_accept_len"):
        np.testing.assert_allclose(
            float(mf[key]), float(mp[key]), rtol=1e-5, atol=1e-7,
            err_msg=key,
        )
    _tree_allclose(gf, gp, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("markov_type", ["vanilla", "gated", "rnn"])
def test_fused_dspark_objective_matches_checkpointed(markov_type):
    """Fused DSpark objective (CE + L1 + external confidence BCE) ==
    checkpointed path: loss, every ratio metric, and parameter gradients."""
    extra = dict(
        projector_type="dspark", markov_rank=8, markov_head_type=markov_type,
        enable_confidence_head=True,
    )
    cfg = DFlashConfig.from_dict({**BASE_CFG, **extra})
    draft = DSparkDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
    kwargs = dict(
        draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2,
        loss_decay_gamma=3.0,
    )
    fused = OnlineDSparkModel(**kwargs, fused_objective=True)
    plain = OnlineDSparkModel(**kwargs, fused_objective=False)
    _, variables, _, _, call_args = _build("dspark", **extra)

    def run(model, params):
        loss, acc, metrics = model.apply({"params": params}, *call_args)
        return loss, (acc, metrics)

    (lf, (af, mf)), gf = jax.jit(jax.value_and_grad(
        lambda p: run(fused, p), has_aux=True
    ))(variables["params"])
    (lp, (ap, mp)), gp = jax.jit(jax.value_and_grad(
        lambda p: run(plain, p), has_aux=True
    ))(variables["params"])
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(af), float(ap), rtol=1e-6)
    for key, (num_f, den_f) in mf["ratio_metrics"].items():
        num_p, den_p = mp["ratio_metrics"][key]
        np.testing.assert_allclose(
            float(num_f), float(num_p), rtol=1e-4, atol=1e-6, err_msg=key
        )
        np.testing.assert_allclose(
            float(den_f), float(den_p), rtol=1e-6, err_msg=key
        )
    _tree_allclose(gf, gp, rtol=5e-4, atol=1e-5)


def test_fused_dspark_no_markov_no_target():
    """fused == checkpointed when the Markov head is disabled and no teacher
    hidden states are provided (CE-only objective)."""
    extra = dict(projector_type="dspark", markov_rank=0)
    cfg = DFlashConfig.from_dict({**BASE_CFG, **extra})
    draft = DSparkDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=2)
    kwargs = dict(
        draft_model=draft, mask_token_id=MASK_TOKEN, block_size=BS,
        num_anchors=N_ANCHORS, objective_chunk_blocks=2,
        dspark_l1_loss_alpha=0.0, dspark_confidence_head_alpha=0.0,
    )
    fused = OnlineDSparkModel(**kwargs, fused_objective=True)
    plain = OnlineDSparkModel(**kwargs, fused_objective=False)
    _, variables, _, _, call_args = _build("dspark", **extra)
    call_args = call_args[:-1]  # drop target_last_hidden_states

    def run(model, params):
        return model.apply({"params": params}, *call_args)[0]

    lf, gf = jax.value_and_grad(lambda p: run(fused, p))(variables["params"])
    lp, gp = jax.value_and_grad(lambda p: run(plain, p))(variables["params"])
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    _tree_allclose(gf, gp, rtol=2e-4, atol=5e-6)


def test_fsdp_sharding_parity_domino_fused():
    """The fused custom-VJP objective (scan over anchor chunks + forward
    residuals) under 8-device fsdp param sharding == single-device."""
    from specforge_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_pytree_like_params,
    )

    extra = dict(projector_type="domino", emb_dim=16, gru_hidden_dim=16)

    def build_state():
        model, variables, tensors, frozen, _ = _build("domino", **extra)
        strategy = DominoTrainStrategy(model)
        tx = build_optimizer(OptimizerConfig(lr=1e-3), 20)
        state = TrainState.create(variables["params"], {}, tx)
        step_fn = make_train_step(strategy, tx, accum_steps=1, total_steps=20)
        batch = {k: v[None] for k, v in tensors.items()
                 if k != "target_last_hidden_states"}
        return state, step_fn, batch, frozen

    state1, step_fn, batch, frozen = build_state()
    state1, metrics1 = step_fn(state1, batch, frozen)

    mesh = build_mesh(MeshConfig(fsdp=8))
    state8, step_fn8, _, _ = build_state()
    with mesh:
        state8 = state8.replace(
            params=shard_pytree_like_params(state8.params, mesh)
        )
        state8, metrics8 = step_fn8(state8, batch, frozen)

    np.testing.assert_allclose(
        float(metrics1["train/loss"]), float(metrics8["train/loss"]),
        rtol=1e-5,
    )
    k1 = np.asarray(
        state1.params["draft_model"]["embed_proj_1"]["kernel"]
    )
    k8 = np.asarray(jax.device_get(
        state8.params["draft_model"]["embed_proj_1"]["kernel"]
    ))
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("kind", ["dflash", "domino", "dspark"])
def test_strategies_through_train_step(kind):
    extra = {}
    if kind == "domino":
        extra = dict(projector_type="domino", emb_dim=16, gru_hidden_dim=16)
    elif kind == "dspark":
        extra = dict(projector_type="dspark", markov_rank=8,
                     enable_confidence_head=True)
    model, variables, tensors, frozen, _ = _build(kind, **extra)
    strategy = {
        "dflash": DFlashTrainStrategy,
        "domino": DominoTrainStrategy,
        "dspark": DSparkTrainStrategy,
    }[kind](model)

    tx = build_optimizer(OptimizerConfig(lr=1e-3), 20)
    state = TrainState.create(variables["params"], {}, tx)
    step_fn = make_train_step(strategy, tx, accum_steps=1, total_steps=20)
    batch = {k: v[None] for k, v in tensors.items()
             if k != "target_last_hidden_states" or kind == "dspark"}
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, batch, frozen)
        losses.append(float(metrics["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

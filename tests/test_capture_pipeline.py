"""Full offline pipeline: tokenize → target capture on the production
transformer → feature files → composition-root training with the real frozen
target head. Plus parser/template/prompt-builder units."""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from specforge_tpu.data.parse import GeneralParser, build_dataset, normalize_conversation
from specforge_tpu.data.prompt_builder import prepare_prompt_tasks
from specforge_tpu.data.template import get_template, template_names


class StubTokenizer:
    """Whitespace tokenizer with a tiny stable vocab (hash-bucketed)."""

    bos_token_id = 1

    def __init__(self, vocab_size=128):
        self.vocab_size = vocab_size

    def encode(self, text, add_special_tokens=False):
        return [2 + (hash(tok) % (self.vocab_size - 2))
                for tok in text.replace("\n", " \\n ").split()]


CONVERSATION = [
    {"role": "user", "content": "What is two plus two?"},
    {"role": "assistant", "content": "Two plus two equals four."},
    {"role": "user", "content": "And times three?"},
    {"role": "assistant", "content": "Twelve."},
]


def test_templates_registered():
    assert {"llama3", "qwen", "chatml", "deepseek", "raw"} <= set(
        template_names()
    )


def test_parser_masks_assistant_spans_only():
    parser = GeneralParser(StubTokenizer(), get_template("qwen"))
    sample = parser.parse(CONVERSATION, max_length=256)
    ids, mask = sample.input_ids, sample.loss_mask
    assert len(ids) == len(mask)
    assert mask.sum() > 0
    assert mask[0] == 0  # bos unsupervised
    # both assistant bodies supervised, both user turns not:
    # count supervised segments (runs of 1s)
    runs = np.diff(np.concatenate([[0], mask, [0]]))
    assert (runs == 1).sum() == 2


def test_normalize_conversation_shapes():
    sharegpt = {"conversations": [
        {"from": "human", "value": "hi"}, {"from": "gpt", "value": "hello"},
    ]}
    out = normalize_conversation(sharegpt)
    assert out == [{"role": "user", "content": "hi"},
                   {"role": "assistant", "content": "hello"}]
    pair = normalize_conversation({"prompt": "a", "response": "b"})
    assert pair[1]["role"] == "assistant"
    with pytest.raises(ValueError):
        normalize_conversation({"bogus": 1})


def test_prompt_tasks_deterministic():
    records = [{"messages": [], "idx": i} for i in range(6)]
    a = prepare_prompt_tasks(records, epoch=1, prompt_seed=7)
    b = prepare_prompt_tasks(records, epoch=1, prompt_seed=7)
    c = prepare_prompt_tasks(records, epoch=2, prompt_seed=7)
    assert [t.prompt_id for t in a] == [t.prompt_id for t in b]
    assert [t.prompt_id for t in a] != [t.prompt_id for t in c]


@pytest.fixture(scope="module")
def tiny_target(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("target")
    config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(config).save_pretrained(path, safe_serialization=True)
    return str(path)


def test_capture_then_train_end_to_end(tiny_target, tmp_path):
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )
    from specforge_tpu.runtime.data_plane.feature_file import load_feature_file

    tokenizer = StubTokenizer()
    records = [{"messages": CONVERSATION} for _ in range(6)]
    samples = build_dataset(records, tokenizer, "qwen", max_length=48)
    assert len(samples) == 6

    features_dir = str(tmp_path / "features")
    runner = OfflineCaptureRunner(
        OfflineCaptureConfig(
            target_model_path=tiny_target,
            output_dir=features_dir,
            capture_layers=(1, 2, 2),  # [1, n//2-1, n-4] for n=6
            max_length=48,
            batch_size=4,
        )
    )
    written = runner.run(
        [{"input_ids": s.input_ids, "loss_mask": s.loss_mask} for s in samples]
    )
    assert len(written) == 6
    tensors, meta = load_feature_file(written[0])
    seq = len(samples[0].input_ids)
    assert tensors["hidden_state"].shape == (seq, 3 * 32)
    assert tensors["target"].shape == (seq, 32)
    assert meta["target_repr"] == "hidden_state"

    # --- train eagle3 on the captured features with the REAL frozen head ---
    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config

    config = Config.model_validate({
        "run_id": "cap0",
        "output_dir": str(tmp_path / "runs"),
        "model": {
            "target_model_path": tiny_target,
            "draft_config": {
                "architectures": ["LlamaEagle3Draft"],
                "vocab_size": 128, "draft_vocab_size": 48,
                "hidden_size": 32, "intermediate_size": 64,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "max_position_embeddings": 256,
            },
        },
        "data": {"train_data_path": features_dir, "max_length": 48,
                 "num_workers": 0},
        "training": {"strategy": "eagle3", "batch_size": 2, "num_epochs": 1,
                     "ttt_length": 2, "log_interval": 1},
        "tracking": {"backend": "none"},
    })
    trainer = build_training_run(config)
    trainer.fit()
    assert int(trainer.state.step) == 3
    # the draft embedding is the target's (copied + frozen)
    from safetensors import safe_open

    with safe_open(
        os.path.join(tiny_target, "model.safetensors"), framework="numpy"
    ) as f:
        target_embed = f.get_tensor("model.embed_tokens.weight")
    draft_embed = np.asarray(
        trainer.state.params["draft_model"]["embed_tokens"]["embedding"],
        np.float32,
    )
    np.testing.assert_allclose(
        draft_embed, target_embed.astype(np.float32), rtol=1e-2, atol=1e-2
    )


def test_thinking_parser_masks_think_spans():
    from specforge_tpu.data.parse import ThinkingParser
    from specforge_tpu.data.template import get_template

    tok = StubTokenizer()
    parser = ThinkingParser(tok, get_template("qwen"))
    sample = parser.parse([
        {"role": "user", "content": "solve it"},
        {"role": "assistant",
         "content": "<think> step one step two </think> the answer is four"},
    ], max_length=256)
    # supervised tokens exist, but fewer than the full assistant span
    full = ThinkingParser(tok, get_template("qwen"),
                          supervise_thinking=True).parse([
        {"role": "user", "content": "solve it"},
        {"role": "assistant",
         "content": "<think> step one step two </think> the answer is four"},
    ], max_length=256)
    assert 0 < sample.loss_mask.sum() < full.loss_mask.sum()
    assert len(sample.input_ids) == len(full.input_ids)


def test_harmony_parser_supervises_final_channel():
    from specforge_tpu.data.parse import HarmonyParser
    from specforge_tpu.data.template import get_template

    parser = HarmonyParser(StubTokenizer(), get_template("raw"))
    sample = parser.parse([
        {"role": "user", "content": "hi there"},
        {"role": "assistant", "content": "hello world",
         "analysis": "user greets; respond warmly"},
    ], max_length=256)
    assert sample.loss_mask.sum() > 0
    # the analysis channel adds context tokens but no supervised tokens
    without = parser.parse([
        {"role": "user", "content": "hi there"},
        {"role": "assistant", "content": "hello world"},
    ], max_length=256)
    assert len(sample.input_ids) > len(without.input_ids)
    assert sample.loss_mask.sum() == without.loss_mask.sum()


def test_sharded_capture_matches_single_device(tiny_target, tmp_path):
    """Multi-chip capture: target params sharded over an 8-device fsdp mesh
    (XLA all-gathers) produce the same features as the single-device forward
    — targets bigger than one chip's HBM capture on a slice (the reference
    keeps TP layers for its offline capture backend, SURVEY §2.8)."""
    import jax
    import jax.numpy as jnp

    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )
    from specforge_tpu.parallel.mesh import MeshConfig, build_mesh

    tc = TargetConfig.from_file(tiny_target)
    params32 = load_target_params(tiny_target, tc, dtype=jnp.float32)
    cfg = OfflineCaptureConfig(
        target_model_path=tiny_target,
        output_dir=str(tmp_path / "unused"),
        capture_layers=(1, 2, 2),
        max_length=24,
        batch_size=2,
    )
    single = OfflineCaptureRunner(cfg, target_config=tc,
                                  target_params=params32)
    mesh = build_mesh(MeshConfig(fsdp=jax.device_count()))
    sharded = OfflineCaptureRunner(cfg, target_config=tc,
                                   target_params=params32, mesh=mesh)

    rng = np.random.default_rng(0)
    ids = np.zeros((2, 24), np.int32)
    mask = np.zeros((2, 24), np.int32)
    for i, n in enumerate((14, 24)):
        ids[i, :n] = rng.integers(0, 128, size=n)
        mask[i, :n] = 1
    aux_s, last_s = single._run_batch(ids, mask)
    aux_m, last_m = sharded._run_batch(ids, mask)
    np.testing.assert_allclose(aux_m, aux_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(last_m, last_s, rtol=2e-5, atol=2e-5)

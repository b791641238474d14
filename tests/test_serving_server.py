"""HTTP serving endpoint over the fused decoders (serving_server.py):
/generate must emit exactly the decoder's tokens, /generate_batch the
batched rows, /health the perf counters; plain mode serves the baseline."""

import http.client
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.inference.spec_decode import Eagle3SpecDecoder
from specforge_tpu.models.draft.llama_eagle3 import (
    Eagle3Config,
    LlamaEagle3Draft,
)
from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
)

V, H = 128, 32


@pytest.fixture(scope="module")
def server():
    from transformers import LlamaConfig, LlamaForCausalLM

    from specforge_tpu.inference.serving_server import SpecServingServer

    import tempfile

    with tempfile.TemporaryDirectory() as path:
        torch.manual_seed(0)
        LlamaForCausalLM(LlamaConfig(
            vocab_size=V, hidden_size=H, intermediate_size=64,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
        )).save_pretrained(path, safe_serialization=True)
        config = TargetConfig.from_file(path)
        params = load_target_params(path, config, dtype=jnp.float32)

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
    decoder = Eagle3SpecDecoder(
        params, config, module, variables, capture_layers=(1, 2, 3),
        num_draft_tokens=2, max_len=128,
    )
    srv = SpecServingServer(decoder, port=0)
    srv.start()
    yield srv, decoder
    srv.stop()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_generate_matches_decoder(server):
    srv, decoder = server
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, V, size=10).tolist()
    want = decoder.generate_fused(prompt, max_new_tokens=12)
    status, got = _post(srv.port, "/generate",
                        {"input_ids": prompt, "max_new_tokens": 12})
    assert status == 200
    np.testing.assert_array_equal(got["output_ids"], want.output_ids)
    assert got["accept_lengths"] == [int(a) for a in want.accept_lengths]
    assert got["rounds"] == want.steps
    assert got["new_tokens"] == len(want.output_ids) - len(prompt)


def test_generate_plain_and_tree_modes(server):
    srv, decoder = server
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, V, size=8).tolist()
    # plain greedy must equal spec output (greedy-equivalence invariant)
    _, spec = _post(srv.port, "/generate",
                    {"input_ids": prompt, "max_new_tokens": 10})
    _, plain = _post(srv.port, "/generate",
                     {"input_ids": prompt, "max_new_tokens": 10,
                      "plain": True})
    np.testing.assert_array_equal(plain["output_ids"], spec["output_ids"])
    assert "accept_lengths" not in plain
    # tree mode serves too
    status, tree = _post(srv.port, "/generate",
                         {"input_ids": prompt, "max_new_tokens": 10,
                          "topk": 2, "tree_style": "beam"})
    assert status == 200
    np.testing.assert_array_equal(tree["output_ids"], spec["output_ids"])


def test_generate_batch_and_health(server):
    srv, decoder = server
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, V, size=9).tolist() for _ in range(2)]
    want = decoder.generate_batch_fused(prompts, max_new_tokens=8)
    status, got = _post(srv.port, "/generate_batch",
                        {"prompts": prompts, "max_new_tokens": 8})
    assert status == 200
    for w, g in zip(want, got["results"]):
        np.testing.assert_array_equal(g["output_ids"], w.output_ids)

    # counters are cumulative per server instance; under xdist each worker
    # may build its own fixture, so assert only this test's contribution
    status, health = _get(srv.port, "/health")
    assert status == 200
    assert health["status"] == "ok"
    assert health["num_draft_tokens"] == 2
    assert health["counters"]["requests"] >= 1
    assert health["counters"]["output_tokens"] > 0
    assert health["counters"]["output_throughput"] > 0


def test_error_reporting(server):
    srv, _ = server
    # malformed client input (missing input_ids) is a 4xx, not a 500
    status, out = _post(srv.port, "/generate", {"max_new_tokens": 4})
    assert status == 400
    assert "error" in out
    status, _ = _post(srv.port, "/nope", {})
    assert status == 404

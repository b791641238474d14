"""Online capture-server target sharding (round-3 verdict item 3).

The managed supervisor's capture-server entrypoint
(``capture_server_main``) must be able to shard its target over a device
mesh — the online counterpart of ``prepare_hidden_states.py
--shard-over-devices`` and of the reference's per-server ``tp_size``
(ref specforge/config/schema.py:314): a 16GB v5e chip cannot hold a bf16
8B target, so the online stack needs multi-chip capture exactly like the
offline one.

These tests spawn the REAL entrypoint as a subprocess on the 8-virtual-CPU
mesh, check its captures against a single-device engine, and run a trainer
consuming its features.
"""

import base64
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import ml_dtypes
import numpy as np
import pytest
import torch

from tests._fixtures import MAXLEN, V, H  # noqa: F401  (V/H for the draft)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def tiny_target(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("target")
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )).save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def sharded_server(tiny_target):
    """capture_server_main subprocess sharding over all 8 virtual devices."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.Popen(
        [sys.executable, "-m", "specforge_tpu.inference.capture_server_main",
         "--target-model", tiny_target, "--port", str(port),
         "--capture-layers", "1", "2", "2", "--max-length", "32",
         "--shard-over-devices", "0"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    url = f"http://127.0.0.1:{port}"
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"server died:\n{out}")
        try:
            with urllib.request.urlopen(f"{url}/health", timeout=1) as r:
                if json.loads(r.read())["status"] == "ok":
                    break
        except OSError:
            time.sleep(0.2)
    else:
        proc.kill()
        raise TimeoutError("sharded capture server never became healthy")
    yield url
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=5)


def _generate(url, input_ids, loss_mask):
    body = json.dumps({
        "input_ids": [int(t) for t in input_ids],
        "loss_mask": [int(t) for t in loss_mask],
        "sample_id": "s0",
        "spec_capture": {"sink": "inline"},
    }).encode()
    req = urllib.request.Request(
        f"{url}/generate", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        spec = json.loads(r.read())["meta_info"]["spec_capture"]
    out = {}
    for name, meta in spec["features"].items():
        arr = np.frombuffer(
            base64.b64decode(spec["data"][name]),
            dtype=ml_dtypes.bfloat16 if meta["dtype"] == "bfloat16"
            else meta["dtype"],
        ).reshape(meta["shape"])
        out[name] = arr
    return out


def test_sharded_server_matches_single_device(sharded_server, tiny_target):
    """The 8-device-sharded subprocess and an in-process single-device
    engine must produce the same features (collective reduction order is
    the only allowed noise)."""
    from specforge_tpu.inference.capture_server import CaptureEngine

    rng = np.random.default_rng(3)
    ids = rng.integers(0, V, size=24)
    mask = (rng.random(24) > 0.3).astype(int)

    remote = _generate(sharded_server, ids, mask)
    local = CaptureEngine(
        tiny_target, capture_layers=(1, 2, 2), max_length=32
    ).capture(ids, mask)

    assert set(remote) == set(local)
    np.testing.assert_array_equal(remote["input_ids"], local["input_ids"])
    for name in ("hidden_state", "target"):
        a = remote[name].astype(np.float32)
        b = local[name].astype(np.float32)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)


def test_trainer_consumes_sharded_server(sharded_server, tiny_target):
    """A consumer trains on features streamed from the SHARDED server —
    the managed-stack wiring end-to-end minus the C++ store (inline sink
    through the production adapter/loader/train-step path)."""
    import queue

    import jax
    import jax.numpy as jnp

    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
    from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
    from specforge_tpu.inference.server_capture_adapter import (
        HTTPCaptureAdapter,
    )
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )
    from specforge_tpu.runtime.control_plane.controller import (
        DataFlowController,
    )
    from specforge_tpu.runtime.contracts import PromptTask
    from specforge_tpu.runtime.data_plane.feature_store import (
        InMemoryFeatureStore,
    )
    from specforge_tpu.runtime.data_plane.feature_dataloader import (
        FeatureDataLoader,
    )
    from specforge_tpu.inference.rollout_worker import RolloutWorker
    from specforge_tpu.training.optimizer import (
        OptimizerConfig,
        build_optimizer,
    )
    from specforge_tpu.training.strategies import Eagle3TrainStrategy
    from specforge_tpu.training.train_step import TrainState, make_train_step

    rng = np.random.default_rng(4)
    tasks = [
        PromptTask(prompt_id=f"p{i}", payload={
            "input_ids": rng.integers(0, V, size=int(
                rng.integers(10, 32)
            )).tolist(),
            "loss_mask": [1] * 10,
        })
        for i in range(4)
    ]
    store = InMemoryFeatureStore()
    adapter = HTTPCaptureAdapter(sharded_server, store=store)
    controller = DataFlowController()
    controller.ingest_prompts(tasks)
    refs = []
    worker = RolloutWorker(
        "producer-0", controller=controller,
        ref_source=adapter.produce_refs,
        publish_fn=lambda rs: refs.extend(rs),
    )
    assert worker.drain() == 4

    q = queue.Queue()
    for r in refs:
        q.put(r)
    q.put(None)
    loader = FeatureDataLoader(
        store,
        PaddingCollator(CollatorConfig(max_length=32,
                                       cast_float_dtype="float32")),
        ref_queue=q, batch_size=2, num_workers=0,
        metadata={"target_repr": "hidden_state"},
    )
    cfg = Eagle3Config(
        vocab_size=V, draft_vocab_size=48, hidden_size=H,
        intermediate_size=64, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    model = OnlineEagle3Model(
        draft_model=LlamaEagle3Draft(cfg, dtype=jnp.float32), length=2
    )
    strategy = Eagle3TrainStrategy(model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32),
        jnp.ones((1, 32, 1), jnp.int32),
        jnp.zeros((1, 32, 3 * H), jnp.float32),
        jnp.zeros((1, 32, V), jnp.float32),
    )
    from specforge_tpu.models.target.head import TargetHead

    head = TargetHead.from_pretrained(tiny_target)
    frozen = {"target_head_weight": head.weight.astype(jnp.float32)}
    tx = build_optimizer(OptimizerConfig(lr=1e-3), 4)
    state = TrainState.create(variables["params"], variables["buffers"], tx)
    step = make_train_step(strategy, tx, accum_steps=1, total_steps=4,
                           metadata={"target_repr": "hidden_state"})
    n_steps = 0
    for batch in loader:
        state, metrics = step(
            state, {k: v[None] for k, v in batch.tensors.items()}, frozen
        )
        assert np.isfinite(float(metrics["train/loss"]))
        n_steps += 1
    assert n_steps == 2

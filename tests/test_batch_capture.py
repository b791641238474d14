"""Batched capture prefill: TargetBatchPartition + /generate_batch.

Batched captures must be bit-identical to per-request captures (same padded
prefill math at bucketed shapes would drift if masks leaked across rows), and
the partition must respect token/size budgets deterministically
(reference inference/batch_partition.py:20)."""

import json
import urllib.request

import numpy as np
import pytest
import torch

from specforge_tpu.inference.batch_partition import TargetBatchPartition
from specforge_tpu.runtime.contracts import PromptTask

V, H = 128, 32


def _task(pid, n):
    rng = np.random.default_rng(hash(pid) % (2**31))
    return PromptTask(
        prompt_id=pid,
        payload={
            "input_ids": rng.integers(0, V, size=n).tolist(),
            "loss_mask": [1] * n,
        },
    )


def test_partition_budgets():
    tasks = [_task(f"p{i}", n) for i, n in enumerate(
        [10, 20, 30, 100, 5, 5, 5, 5, 5]
    )]
    part = TargetBatchPartition(max_batch_tokens=120, max_batch_size=4)
    batches = part.partition(tasks)
    # arrival order preserved, flattened
    flat = [t.prompt_id for b in batches for t in b]
    assert flat == [t.prompt_id for t in tasks]
    for batch in batches:
        assert len(batch) <= 4
        if len(batch) > 1:
            longest = max(len(t.payload["input_ids"]) for t in batch)
            assert longest * len(batch) <= 120
    # oversized task still gets a batch
    big = TargetBatchPartition(max_batch_tokens=8, max_batch_size=4)
    assert [len(b) for b in big.partition(tasks[:2])] == [1, 1]


@pytest.fixture(scope="module")
def capture_server(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        CaptureServer,
    )

    path = tmp_path_factory.mktemp("target")
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )).save_pretrained(path, safe_serialization=True)
    server = CaptureServer(CaptureEngine(
        str(path), capture_layers=(1, 2, 2), max_length=32
    )).start()
    yield server
    server.stop()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_generate_batch_matches_single(capture_server):
    rng = np.random.default_rng(0)
    samples = [
        {
            "input_ids": rng.integers(0, V, size=n).tolist(),
            "loss_mask": [1] * n,
            "sample_id": f"s{i}",
        }
        for i, n in enumerate([12, 30, 19])
    ]
    batch = _post(capture_server, "/generate_batch", {
        "samples": samples, "spec_capture": {"sink": "inline"},
    })
    assert len(batch["results"]) == 3
    for sample, result in zip(samples, batch["results"]):
        single = _post(capture_server, "/generate", {
            **sample, "spec_capture": {"sink": "inline"},
        })
        spec_b = result["meta_info"]["spec_capture"]
        spec_s = single["meta_info"]["spec_capture"]
        assert spec_b["features"] == spec_s["features"]
        for name in spec_s["data"]:
            assert spec_b["data"][name] == spec_s["data"][name], name


def test_worker_batch_mode_commits_all(capture_server):
    from specforge_tpu.inference.rollout_worker import RolloutWorker
    from specforge_tpu.inference.server_capture_adapter import (
        HTTPCaptureAdapter,
    )
    from specforge_tpu.runtime.control_plane.controller import (
        DataFlowController,
    )
    from specforge_tpu.runtime.data_plane.feature_store import (
        InMemoryFeatureStore,
    )

    tasks = [_task(f"b{i}", 10 + i) for i in range(6)]
    controller = DataFlowController()
    controller.ingest_prompts(tasks)
    store = InMemoryFeatureStore()
    adapter = HTTPCaptureAdapter(
        f"http://127.0.0.1:{capture_server.port}", store=store
    )
    published = []
    worker = RolloutWorker(
        "w0",
        controller=controller,
        batch_ref_source=adapter.produce_refs_batch,
        batch_partition=TargetBatchPartition(max_batch_tokens=64,
                                             max_batch_size=4),
        publish_fn=published.extend,
        lease_limit=6,
    )
    produced = worker.drain()
    assert produced == 6
    assert sorted(r.sample_id for r in published) == sorted(
        t.prompt_id for t in tasks
    )
    assert controller.status()["prompts_pending"] == 0


def test_resolve_batch_shape_edges():
    """Bucket shapes always COVER the request on both axes (review finding:
    undersized terminal buckets overflowed the padded buffer)."""
    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        resolve_batch_shape,
    )

    sb, bb = CaptureEngine.SEQ_BUCKETS, CaptureEngine.BATCH_BUCKETS
    # non-power-of-two max_length is the terminal seq bucket
    assert resolve_batch_shape(1, 1400, 1500, sb, bb) == (1, 1500)
    assert resolve_batch_shape(1, 100, 1500, sb, bb) == (1, 128)
    # batch beyond the largest preset bucket rounds up, never truncates
    bsz, _ = resolve_batch_shape(32, 10, 2048, sb, bb)
    assert bsz >= 32
    bsz, _ = resolve_batch_shape(17, 10, 2048, sb, bb)
    assert bsz >= 17
    # prompts longer than max_length clamp to it
    assert resolve_batch_shape(2, 9999, 2048, sb, bb) == (2, 2048)

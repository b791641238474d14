"""Kill-and-restart recovery for the online disaggregated topology.

The consumer is SIGKILLed mid-run and restarted: the SQLite ledger dedups
replayed channel refs, the committed-but-unacked tail is requeued into a
fresh inbox generation, acks never run ahead of checkpoints, and training
completes with exactly the produced sample count — no lost or duplicated
optimizer window (reference tests/test_recovery.py +
control_plane/controller.py:228 reconcile_on_restart).

The producer is also killed mid-production and restarted: the channel file is
the durable publication record, so the restart skips already-published
prompts (exactly-once publication).
"""

import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import torch

CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROMPTS = 16
TOTAL_STEPS = 8  # 16 samples / batch 2


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
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )).save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture()
def online_stack(tiny_target, tmp_path):
    """C++ store + capture server + prompts + config payload."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    store_port = _free_port()
    store_proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"),
         "--port", str(store_port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", store_port), 0.2).close()
            break
        except OSError:
            time.sleep(0.05)

    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        CaptureServer,
    )

    server = CaptureServer(CaptureEngine(
        tiny_target, capture_layers=(1, 2, 2), max_length=32
    )).start()

    rng = np.random.default_rng(0)
    prompt_path = tmp_path / "prompts.jsonl"
    with open(prompt_path, "w") as f:
        for _ in range(N_PROMPTS):
            length = int(rng.integers(12, 32))
            f.write(json.dumps({
                "input_ids": rng.integers(0, 128, size=length).tolist(),
                "loss_mask": (rng.random(length) > 0.3).astype(int).tolist(),
            }) + "\n")

    payload = {
        "run_id": "rec0",
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
        "data": {"prompt_path": str(prompt_path), "max_length": 32,
                 "num_workers": 0},
        "training": {
            "strategy": "eagle3", "batch_size": 2,
            "accumulation_steps": 1, "total_steps": TOTAL_STEPS,
            "ttt_length": 2, "log_interval": 1, "save_interval": 1,
            "resume": True,
        },
        "tracking": {"backend": "none"},
        "runtime": {"store_backend": "network",
                    "store_endpoint": f"127.0.0.1:{store_port}",
                    "control_dir": str(tmp_path / "control")},
        "deployment": {"mode": "disaggregated",
                       "server_urls": [f"http://127.0.0.1:{server.port}"]},
    }
    try:
        yield payload, store_port, tmp_path
    finally:
        server.stop()
        store_proc.terminate()
        store_proc.wait(timeout=10)


def _spawn_consumer(tmp_path, payload):
    config_path = tmp_path / "consumer.json"
    with open(config_path, "w") as f:
        json.dump(payload, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO_ROOT, "tests",
                                      "_consumer_worker.py"),
         str(config_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _wait_for_checkpoint(tmp_path, step, timeout=300):
    marker = tmp_path / "runs" / f"rec0-step{step}" / "contract.json"
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if marker.exists():
            return
        time.sleep(0.2)
    raise TimeoutError(f"checkpoint step {step} never appeared")


def _ledger_state(tmp_path):
    from specforge_tpu.runtime.control_plane.metadata_store import (
        SQLiteMetadataStore,
    )

    ledger = SQLiteMetadataStore(
        str(tmp_path / "runs" / "rec0" / "consumer_state" / "consumer.sqlite")
    )
    acked = ledger.acked_ids()
    committed = [r.sample_id for r in ledger.committed_refs()]
    durable = ledger.durable_step()
    ledger.close()
    return acked, committed, durable


@pytest.mark.slow
def test_consumer_kill_and_restart(online_stack):
    payload, store_port, tmp_path = online_stack
    from specforge_tpu.application.disaggregated import run_producer
    from specforge_tpu.config.schema import Config
    from specforge_tpu.runtime.data_plane.network_store import (
        NetworkFeatureStore,
    )

    config = Config.model_validate(payload)
    produced = run_producer(config)
    assert produced == N_PROMPTS

    # phase 1: kill the consumer after it durably acked ~3 steps
    proc = _spawn_consumer(tmp_path, payload)
    try:
        _wait_for_checkpoint(tmp_path, 3)
    finally:
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)
    assert proc.returncode != 0  # it was killed, not finished

    acked_mid, committed_mid, durable_mid = _ledger_state(tmp_path)
    assert durable_mid >= 1
    assert len(acked_mid) < N_PROMPTS

    # phase 2: restart — ledger dedup + unacked requeue + checkpoint resume
    proc2 = _spawn_consumer(tmp_path, payload)
    out, _ = proc2.communicate(timeout=600)
    assert proc2.returncode == 0, out.decode()[-3000:]
    metrics = json.loads(out.decode().strip().splitlines()[-1])
    assert np.isfinite(metrics["train/loss"])

    # exactly TOTAL_STEPS optimizer steps — no lost or duplicated window
    with open(tmp_path / "runs" / f"rec0-step{TOTAL_STEPS}"
              / "contract.json") as f:
        contract = json.load(f)
    assert contract["progress"]["global_step"] == TOTAL_STEPS

    acked, committed, durable = _ledger_state(tmp_path)
    assert durable == TOTAL_STEPS
    assert len(acked) == N_PROMPTS                      # every sample acked
    assert len(set(committed)) == N_PROMPTS             # ledger dedup held
    # every trained sample released from the store
    assert NetworkFeatureStore(
        f"127.0.0.1:{store_port}"
    ).health()["objects"] == 0


@pytest.mark.slow
def test_producer_kill_and_restart(online_stack):
    payload, store_port, tmp_path = online_stack
    from specforge_tpu.config.schema import Config
    from specforge_tpu.runtime.data_plane.streaming_ref_channel import (
        StreamingRefChannel,
    )

    # phase 1: producer subprocess with a tiny flow-control watermark — it
    # publishes one batch then pauses (no consumer drains the channel), so
    # the SIGKILL point is deterministic
    phase1 = json.loads(json.dumps(payload))
    phase1["runtime"]["flow_high_watermark"] = 4
    phase1["runtime"]["flow_low_watermark"] = 2
    config_path = tmp_path / "producer.json"
    with open(config_path, "w") as f:
        json.dump(phase1, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    script = (
        "import json, sys; "
        "from specforge_tpu.config.schema import Config; "
        "from specforge_tpu.application.disaggregated import run_producer; "
        f"cfg = Config.model_validate(json.load(open(r'{config_path}'))); "
        "run_producer(cfg)"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    channel_dir = payload["runtime"]["control_dir"]
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        refs, closed, _ = StreamingRefChannel(channel_dir).poll()
        if len(refs) >= 4:
            break
        if proc.poll() is not None:
            break
        time.sleep(0.1)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)
    refs_mid, closed_mid, _ = StreamingRefChannel(channel_dir).poll()
    assert not closed_mid

    # phase 2: restart in-process — skips already-published prompts
    from specforge_tpu.application.disaggregated import run_producer

    config = Config.model_validate(payload)
    produced_again = run_producer(config)
    assert produced_again == N_PROMPTS - len(refs_mid)

    refs_all, closed, _ = StreamingRefChannel(channel_dir).poll()
    assert closed
    ids = [r.sample_id for r in refs_all]
    assert len(ids) == N_PROMPTS
    assert len(set(ids)) == N_PROMPTS  # exactly-once publication


@pytest.mark.slow
def test_two_process_online_consumer(online_stack):
    """Multi-host DP online consumption: the primary host is the sole
    channel reader (RefDistributor, per-rank inboxes), both hosts train one
    logical model over the global mesh, acks union in the shared ledger
    (reference launch.py:1432-1539)."""
    payload, store_port, tmp_path = online_stack
    from specforge_tpu.application.disaggregated import run_producer
    from specforge_tpu.config.schema import Config
    from specforge_tpu.runtime.data_plane.network_store import (
        NetworkFeatureStore,
    )

    payload = json.loads(json.dumps(payload))
    payload["run_id"] = "mh-online"
    payload["training"]["save_interval"] = 0
    payload["training"]["resume"] = False

    config = Config.model_validate(payload)
    assert run_producer(config) == N_PROMPTS

    config_path = tmp_path / "mh_consumer.json"
    with open(config_path, "w") as f:
        json.dump(payload, f)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["SPECFORGE_COORDINATOR"] = f"localhost:{port}"
        env["SPECFORGE_NUM_PROCESSES"] = "2"
        env["SPECFORGE_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO_ROOT, "tests", "_consumer_worker.py"),
             str(config_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    metrics = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    # same jitted step over the global mesh: identical replicated metrics
    assert abs(metrics[0]["train/loss"] - metrics[1]["train/loss"]) < 1e-6
    assert np.isfinite(metrics[0]["train/loss"])

    # all samples consumed + released; ledger acked everything exactly once
    assert NetworkFeatureStore(
        f"127.0.0.1:{store_port}"
    ).health()["objects"] == 0
    from specforge_tpu.runtime.control_plane.metadata_store import (
        SQLiteMetadataStore,
    )

    ledger = SQLiteMetadataStore(str(
        tmp_path / "runs" / "mh-online" / "consumer_state" / "consumer.sqlite"
    ))
    assert len(ledger.acked_ids()) == N_PROMPTS
    ledger.close()


@pytest.mark.slow
def test_two_process_online_consumer_http_relay(online_stack):
    """Shared-FS-free multi-host online: the non-primary rank reads its
    inbox and routes durable acks over the primary's HTTP relay — no SQLite
    or inbox files touched outside rank 0 (reference rank-0 relay topology,
    http_inbox.py:78-324)."""
    payload, store_port, tmp_path = online_stack
    from specforge_tpu.application.disaggregated import run_producer
    from specforge_tpu.config.schema import Config
    from specforge_tpu.runtime.data_plane.network_store import (
        NetworkFeatureStore,
    )

    relay_port = _free_port()
    payload = json.loads(json.dumps(payload))
    payload["run_id"] = "mh-relay"
    payload["training"]["save_interval"] = 0
    payload["training"]["resume"] = False
    payload["runtime"]["inbox_server_port"] = relay_port
    payload["runtime"]["inbox_server_url"] = f"http://127.0.0.1:{relay_port}"

    config = Config.model_validate(payload)
    assert run_producer(config) == N_PROMPTS

    config_path = tmp_path / "relay_consumer.json"
    with open(config_path, "w") as f:
        json.dump(payload, f)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["SPECFORGE_COORDINATOR"] = f"localhost:{port}"
        env["SPECFORGE_NUM_PROCESSES"] = "2"
        env["SPECFORGE_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO_ROOT, "tests", "_consumer_worker.py"),
             str(config_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    metrics = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    assert abs(metrics[0]["train/loss"] - metrics[1]["train/loss"]) < 1e-6

    # every object released — remote acks reached the authority's ledger
    assert NetworkFeatureStore(
        f"127.0.0.1:{store_port}"
    ).health()["objects"] == 0
    from specforge_tpu.runtime.control_plane.metadata_store import (
        SQLiteMetadataStore,
    )

    ledger = SQLiteMetadataStore(str(
        tmp_path / "runs" / "mh-relay" / "consumer_state" / "consumer.sqlite"
    ))
    assert len(ledger.acked_ids()) == N_PROMPTS
    ledger.close()


@pytest.mark.slow
def test_consumer_kill_before_first_ack(online_stack):
    """Crash BEFORE any durable ack: the restart clears the unchanged inbox
    generation (same durable step key) so pre-crash fan-out is never
    delivered alongside the requeued refs — no double-trained samples
    (review finding: stale generation reuse)."""
    payload, store_port, tmp_path = online_stack
    from specforge_tpu.application.disaggregated import run_producer
    from specforge_tpu.config.schema import Config

    config = Config.model_validate(payload)
    assert run_producer(config) == N_PROMPTS

    proc = _spawn_consumer(tmp_path, payload)
    ledger_path = (
        tmp_path / "runs" / "rec0" / "consumer_state" / "consumer.sqlite"
    )
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline and not ledger_path.exists():
        time.sleep(0.05)
    # kill as early as possible — often before the first optimizer step acks
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)

    proc2 = _spawn_consumer(tmp_path, payload)
    out, _ = proc2.communicate(timeout=600)
    assert proc2.returncode == 0, out.decode()[-3000:]

    with open(tmp_path / "runs" / f"rec0-step{TOTAL_STEPS}"
              / "contract.json") as f:
        contract = json.load(f)
    # exactly TOTAL_STEPS — a stale inbox generation would deliver
    # duplicates and overshoot; lost samples would undershoot
    assert contract["progress"]["global_step"] == TOTAL_STEPS
    acked, committed, durable = _ledger_state(tmp_path)
    assert len(acked) == N_PROMPTS
    assert durable == TOTAL_STEPS

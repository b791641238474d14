"""Launch planning + supervision, and the producer/consumer role runtimes
end-to-end in one process (capture server + C++ store + both roles)."""

import json
import os
import shutil
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import torch

from specforge_tpu.config.schema import Config
from specforge_tpu.launch_plan import (
    LaunchPlan,
    PlannedCommand,
    Readiness,
    build_launch_plan,
    run_commands,
)

CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")


def _cfg(**overrides):
    base = {
        "run_id": "launch0",
        "model": {"draft_config": {
            "architectures": ["LlamaEagle3Draft"],
            "vocab_size": 64, "draft_vocab_size": 24, "hidden_size": 32,
            "intermediate_size": 64, "num_attention_heads": 4,
            "num_key_value_heads": 2,
        }},
        **overrides,
    }
    return Config.model_validate(base)


def test_plan_worker_for_colocated():
    plan = build_launch_plan(_cfg(), "cfg.json")
    assert plan.kind == "worker" and not plan.commands


def test_plan_supervisor_for_online_auto():
    config = _cfg(
        deployment={"mode": "disaggregated",
                    "server_urls": ["http://127.0.0.1:38200"]},
        training={"role": "auto"},
    )
    plan = build_launch_plan(config, "cfg.json")
    assert plan.kind == "supervisor"
    names = [c.name for c in plan.commands]
    assert names == ["producer", "consumer"]
    producer_argv = " ".join(plan.commands[0].argv)
    assert "training.role=producer" in producer_argv


def test_plan_managed_local_includes_services():
    config = _cfg(
        deployment={"mode": "disaggregated",
                    "server_urls": ["http://127.0.0.1:38201"]},
        training={"role": "auto"},
        runtime={"store_backend": "network",
                 "store_endpoint": "127.0.0.1:38150"},
    )
    plan = build_launch_plan(config, "cfg.json", managed_local=True)
    assert plan.kind == "managed_supervisor"
    names = [c.name for c in plan.commands]
    assert names == ["feature_store", "capture_server_0", "producer",
                     "consumer"]
    assert plan.commands[0].readiness.kind == "tcp"
    assert plan.commands[1].readiness.kind == "http"
    rendered = json.loads(plan.render())
    assert rendered["kind"] == "managed_supervisor"


def test_plan_managed_local_capture_sharding_flags():
    """capture_shard_devices / capture_moe_* plumb through to the spawned
    server's argv (online per-server tp_size, ref schema.py:314)."""
    config = _cfg(
        deployment={
            "mode": "disaggregated",
            "server_urls": ["http://127.0.0.1:38202"],
            "managed_local": {
                "capture_shard_devices": 0,
                "capture_moe_impl": "ep",
                "capture_moe_capacity_factor": 1.5,
            },
        },
        training={"role": "auto"},
        runtime={"store_backend": "network",
                 "store_endpoint": "127.0.0.1:38151"},
    )
    plan = build_launch_plan(config, "cfg.json", managed_local=True)
    argv = " ".join(
        next(c for c in plan.commands if c.name == "capture_server_0").argv
    )
    assert "--shard-over-devices 0" in argv
    assert "--moe-impl ep" in argv
    assert "--moe-capacity-factor 1.5" in argv


def test_managed_local_ep_needs_sharding():
    from specforge_tpu.config.schema import ManagedLocalStackConfig

    with pytest.raises(ValueError, match="capture_shard_devices"):
        ManagedLocalStackConfig(capture_moe_impl="ep")


def test_run_commands_supervises_and_tears_down(tmp_path):
    marker = tmp_path / "service_alive"
    plan = LaunchPlan(kind="supervisor", commands=(
        PlannedCommand(
            name="service",
            argv=(sys.executable, "-c",
                  f"import time,os; open({str(marker)!r},'w').write('x'); "
                  "time.sleep(600)"),
        ),
        PlannedCommand(
            name="worker",
            argv=(sys.executable, "-c",
                  "import os,time\n"
                  f"deadline=time.time()+20\n"
                  f"while not os.path.exists({str(marker)!r}):\n"
                  "    assert time.time()<deadline; time.sleep(0.05)"),
            expected_to_exit=True,
        ),
    ))
    t0 = time.monotonic()
    rc = run_commands(plan, poll_interval=0.1)
    assert rc == 0
    assert time.monotonic() - t0 < 30
    assert marker.exists()  # service ran and was torn down after worker exit


def test_run_commands_propagates_worker_failure():
    plan = LaunchPlan(kind="supervisor", commands=(
        PlannedCommand(
            name="bad",
            argv=(sys.executable, "-c", "raise SystemExit(3)"),
            expected_to_exit=True,
        ),
    ))
    assert run_commands(plan, poll_interval=0.1) == 3


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


def test_producer_consumer_roles_end_to_end(tiny_target, tmp_path):
    """run_producer + run_consumer against a live capture server and the C++
    store — the whole online topology through the role entry points."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    store_port = s.getsockname()[1]; s.close()
    store_proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"),
         "--port", str(store_port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        CaptureServer,
    )

    server = CaptureServer(CaptureEngine(
        tiny_target, capture_layers=(1, 2, 2), max_length=32
    )).start()
    try:
        rng = np.random.default_rng(0)
        prompt_path = tmp_path / "prompts.jsonl"
        with open(prompt_path, "w") as f:
            for _ in range(8):
                length = int(rng.integers(12, 32))
                f.write(json.dumps({
                    "input_ids": rng.integers(0, 128, size=length).tolist(),
                    "loss_mask": (rng.random(length) > 0.3).astype(int)
                    .tolist(),
                }) + "\n")

        config = Config.model_validate({
            "run_id": "roles0",
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
                "accumulation_steps": 1, "total_steps": 4, "ttt_length": 2,
                "log_interval": 1, "role": "producer",
            },
            "tracking": {"backend": "none"},
            "runtime": {"store_backend": "network",
                        "store_endpoint": f"127.0.0.1:{store_port}",
                        "control_dir": str(tmp_path / "control")},
            "deployment": {"mode": "disaggregated",
                           "server_urls":
                               [f"http://127.0.0.1:{server.port}"]},
        })

        from specforge_tpu.application.disaggregated import (
            run_consumer,
            run_producer,
        )

        produced = run_producer(config)
        assert produced == 8

        metrics = run_consumer(config)
        assert "train/loss" in metrics and np.isfinite(metrics["train/loss"])

        # all trained-on samples released from the store after durable acks
        from specforge_tpu.runtime.data_plane.network_store import (
            NetworkFeatureStore,
        )

        remaining = NetworkFeatureStore(
            f"127.0.0.1:{store_port}"
        ).health()["objects"]
        assert remaining == 0
    finally:
        server.stop()
        store_proc.terminate()
        store_proc.wait(timeout=5)

#!/usr/bin/env python
"""Measure the online disaggregated stack's steady-state rate and the
trainer's data-wait fraction (round-3 verdict item 8; reference anchor:
14% data wait, BASELINE.md).

Topology: C++ feature store + capture server (own process; CPU by default
so a single-TPU host can give the chip to the trainer — pass
--capture-on-tpu when a second chip exists) + producer (CPU, HTTP driver)
+ consumer/trainer (default backend = the real chip when attached).

Prints one JSON line:
  {"samples_per_s": ..., "data_wait_share": ..., "compute_s_per_step": ...}

Usage:
    python scripts/measure_online_stack.py --workdir /tmp/stack \
        [--prompts 64] [--seq 256] [--hidden 256] [--layers 4]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--prompts", type=int, default=64)
    parser.add_argument("--seq", type=int, default=256)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--vocab", type=int, default=1024)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--capture-on-tpu", action="store_true")
    parser.add_argument("--producers", type=int, default=2)
    args = parser.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    v, h, s = args.vocab, args.hidden, args.seq

    # --- tiny target on disk ---
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    target_dir = os.path.join(args.workdir, "target")
    if not os.path.exists(os.path.join(target_dir, "config.json")):
        torch.manual_seed(0)
        LlamaForCausalLM(LlamaConfig(
            vocab_size=v, hidden_size=h, intermediate_size=2 * h,
            num_hidden_layers=args.layers, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=4 * s,
        )).save_pretrained(target_dir, safe_serialization=True)

    rng = np.random.default_rng(0)
    prompt_path = os.path.join(args.workdir, "prompts.jsonl")
    with open(prompt_path, "w") as f:
        for _ in range(args.prompts):
            length = int(rng.integers(s // 2, s))
            f.write(json.dumps({
                "input_ids": rng.integers(0, v, size=length).tolist(),
                "loss_mask": [1] * length,
            }) + "\n")

    store_port = _free_port()
    server_port = _free_port()
    total_steps = args.prompts // args.batch_size
    payload = {
        "run_id": "stack0",
        "output_dir": os.path.join(args.workdir, "runs"),
        "model": {
            "target_model_path": target_dir,
            "draft_config": {
                "architectures": ["LlamaEagle3Draft"],
                "vocab_size": v, "draft_vocab_size": v,
                "hidden_size": h, "intermediate_size": 2 * h,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "max_position_embeddings": 4 * s,
            },
        },
        "data": {"prompt_path": prompt_path, "max_length": s,
                 "num_workers": 0},
        "training": {
            "strategy": "eagle3", "batch_size": args.batch_size,
            "accumulation_steps": 1, "total_steps": total_steps,
            "ttt_length": 2, "log_interval": 1,
            "save_interval": max(total_steps, 1),
        },
        "tracking": {"backend": "jsonl"},
        "runtime": {"store_backend": "network",
                    "store_endpoint": f"127.0.0.1:{store_port}",
                    "control_dir": os.path.join(args.workdir, "control")},
        "deployment": {
            "mode": "disaggregated",
            "server_urls": [f"http://127.0.0.1:{server_port}"],
            "num_producer_workers": args.producers,
        },
    }
    config_path = os.path.join(args.workdir, "stack.json")
    with open(config_path, "w") as f:
        json.dump(payload, f)

    procs = []

    def spawn(argv, name, env_extra=None):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update(env_extra or {})
        p = subprocess.Popen(
            argv, env=env,
            stdout=open(os.path.join(args.workdir, f"{name}.log"), "w"),
            stderr=subprocess.STDOUT,
        )
        procs.append(p)
        return p

    try:
        subprocess.run(["make", "-C", os.path.join(REPO, "cpp")],
                       check=True, capture_output=True)
        spawn([os.path.join(REPO, "cpp", "feature_store_server"),
               "--port", str(store_port)], "store")
        cap_env = {} if args.capture_on_tpu else {"JAX_PLATFORMS": "cpu"}
        spawn([sys.executable, "-m",
               "specforge_tpu.inference.capture_server_main",
               "--target-model", target_dir, "--port", str(server_port),
               "--capture-layers", "1",
               str(max(args.layers // 2 - 1, 1)),
               str(max(args.layers - 2, 2)),
               "--max-length", str(s)], "capture", cap_env)
        # wait for readiness
        import urllib.request
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{server_port}/health", timeout=1
                )
                break
            except OSError:
                time.sleep(0.5)
        else:
            raise TimeoutError("capture server never became healthy")

        producer = spawn(
            [sys.executable, "-m", "specforge_tpu.cli", "train",
             "-c", config_path, "--set", "training.role=producer"],
            "producer", {"JAX_PLATFORMS": "cpu"},
        )
        consumer = spawn(
            [sys.executable, "-m", "specforge_tpu.cli", "train",
             "-c", config_path, "--set", "training.role=consumer"],
            "consumer",
        )
        rc_c = consumer.wait(timeout=3600)
        rc_p = producer.wait(timeout=600)
        if rc_c != 0 or rc_p != 0:
            raise SystemExit(
                f"stack failed: consumer rc={rc_c} producer rc={rc_p} "
                f"(see {args.workdir}/consumer.log)"
            )
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()

    # --- read the trainer's perf telemetry: steady state = the last half
    # of the run (warmup/compile excluded) ---
    metrics_path = os.path.join(
        args.workdir, "runs", "stack0.metrics.jsonl"
    )
    rows = [json.loads(line) for line in open(metrics_path) if line.strip()]
    perf = [r for r in rows if "perf/data_wait_s_per_step" in r]
    steady = perf[len(perf) // 2:]
    data_wait = float(np.mean(
        [r["perf/data_wait_s_per_step"] for r in steady]
    ))
    compute = float(np.mean(
        [r["perf/compute_s_per_step"] for r in steady]
    ))
    samples_per_s = float(np.mean(
        [r["perf/global_samples_per_s"] for r in steady]
    ))
    out = {
        "metric": "online_stack",
        "samples_per_s": round(samples_per_s, 3),
        "data_wait_s_per_step": round(data_wait, 4),
        "compute_s_per_step": round(compute, 4),
        "data_wait_share": round(data_wait / max(data_wait + compute, 1e-9), 4),
        "steps_measured": len(steady),
        "capture_backend": "tpu" if args.capture_on_tpu else "cpu",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Capture-server throughput benchmark: single-request vs batched prefill.

Measures samples/s of the HTTP capture server at ~550-token prompts (the
reference capture-supply workload: ~52-57 samples/s, ~27k prefill tok/s on
one H200 patched SGLang — docs/benchmarks/domino-disaggregated-performance.md:
152-166). The batched path is the TargetBatchPartition + /generate_batch
pairing (VERDICT item 5: >=2x single-request throughput).

Run: python -m specforge_tpu.benchmarks.capture_throughput
Env: CAPB_LAYERS, CAPB_HIDDEN, CAPB_PROMPTS, CAPB_TOKENS, CAPB_BATCH
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def random_target_params(cfg, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d = cfg.resolved_head_dim
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def w(*shape, scale=0.02):
        return jnp.asarray(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        ).astype(jnp.bfloat16)

    params = {
        "model.embed_tokens.weight": w(v, h),
        "model.norm.weight": jnp.ones((h,), jnp.bfloat16),
        "lm_head.weight": w(v, h),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        params[p + "self_attn.q_proj.weight"] = w(cfg.num_attention_heads * d, h)
        params[p + "self_attn.k_proj.weight"] = w(cfg.num_key_value_heads * d, h)
        params[p + "self_attn.v_proj.weight"] = w(cfg.num_key_value_heads * d, h)
        params[p + "self_attn.o_proj.weight"] = w(h, cfg.num_attention_heads * d)
        params[p + "mlp.gate_proj.weight"] = w(inter, h)
        params[p + "mlp.up_proj.weight"] = w(inter, h)
        params[p + "mlp.down_proj.weight"] = w(h, inter)
        params[p + "input_layernorm.weight"] = jnp.ones((h,), jnp.bfloat16)
        params[p + "post_attention_layernorm.weight"] = jnp.ones(
            (h,), jnp.bfloat16
        )
    return params


def main():
    import urllib.request

    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        CaptureServer,
    )
    from specforge_tpu.models.target.transformer import TargetConfig

    layers = int(os.environ.get("CAPB_LAYERS", "24"))
    hidden = int(os.environ.get("CAPB_HIDDEN", "2048"))
    n_prompts = int(os.environ.get("CAPB_PROMPTS", "32"))
    tokens = int(os.environ.get("CAPB_TOKENS", "550"))
    batch = int(os.environ.get("CAPB_BATCH", "8"))
    cfg = TargetConfig(
        vocab_size=32000,
        hidden_size=hidden,
        intermediate_size=4 * hidden,
        num_hidden_layers=layers,
        num_attention_heads=hidden // 128,
        num_key_value_heads=max(hidden // 512, 1),
        rope_theta=1e6,
    )
    print(
        f"building random {layers}L/{hidden}h target...", file=sys.stderr
    )
    params = random_target_params(cfg)
    engine = CaptureEngine(
        "unused", capture_layers=(1, layers // 2, layers - 4),
        max_length=1024, target_config=cfg, target_params=params,
    )
    server = CaptureServer(engine).start()
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=tokens).tolist()
        for _ in range(n_prompts)
    ]

    def post(path, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            return json.loads(resp.read())

    try:
        # warm both compiled shapes
        post("/generate", {"input_ids": prompts[0], "sample_id": "warm"})
        post("/generate_batch", {
            "samples": [
                {"input_ids": p, "sample_id": f"warm{i}"}
                for i, p in enumerate(prompts[:batch])
            ],
        })

        t0 = time.monotonic()
        for i, p in enumerate(prompts):
            post("/generate", {"input_ids": p, "sample_id": f"s{i}"})
        dt_single = time.monotonic() - t0

        t0 = time.monotonic()
        for start in range(0, n_prompts, batch):
            chunk = prompts[start:start + batch]
            post("/generate_batch", {
                "samples": [
                    {"input_ids": p, "sample_id": f"b{start + i}"}
                    for i, p in enumerate(chunk)
                ],
            })
        dt_batch = time.monotonic() - t0

        # concurrent single requests: the server-side coalescer shares
        # bucketed forwards across threads (round-3 W6 fix) — this is what
        # N independent producers see without /generate_batch
        import threading

        batches_before = server.coalescer.batches_run
        threads = []
        t0 = time.monotonic()
        for i, p in enumerate(prompts):
            t = threading.Thread(
                target=post,
                args=("/generate",
                      {"input_ids": p, "sample_id": f"c{i}"}),
            )
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
        dt_conc = time.monotonic() - t0
        conc_batches = server.coalescer.batches_run - batches_before
    finally:
        server.stop()

    single_sps = n_prompts / dt_single
    batch_sps = n_prompts / dt_batch
    conc_sps = n_prompts / dt_conc
    print(json.dumps({
        "metric": "capture_concurrent_coalesced_samples_per_s",
        "value": round(conc_sps, 2), "unit": "samples/s",
        "device_forwards": conc_batches,
        "speedup_vs_serialized": round(conc_sps * dt_single / n_prompts, 2),
    }))
    print(json.dumps({
        "metric": "capture_single_samples_per_s",
        "value": round(single_sps, 2), "unit": "samples/s",
    }))
    print(json.dumps({
        "metric": "capture_batched_samples_per_s",
        "value": round(batch_sps, 2), "unit": "samples/s",
        "speedup_vs_single": round(batch_sps / single_sps, 2),
        "prefill_tok_per_s": round(batch_sps * tokens, 0),
    }))

    # device-compute timing (scalar fetch only): isolates the prefill math
    # from host<->device transfer — on this environment the axon debug tunnel
    # caps D2H at ~30 MB/s, which the HTTP numbers above are bound by; real
    # TPU VMs move capture tensors over PCIe and track these numbers instead.
    import jax
    import jax.numpy as jnp

    from specforge_tpu.inference.capture_server import _bucket

    runner = engine._runner
    seq_bucket = _bucket(
        tokens,
        [b for b in CaptureEngine.SEQ_BUCKETS if b <= engine.max_length]
        or [engine.max_length],
    )
    ids1 = np.zeros((1, seq_bucket), np.int32)
    ids1[0, :tokens] = prompts[0][:tokens]
    mask1 = (ids1 != 0).astype(np.int32)
    idsb = np.tile(ids1, (batch, 1))
    maskb = np.tile(mask1, (batch, 1))

    def device_time(ids, mask, reps=8):
        aux, last = runner._forward(
            runner.params, jnp.asarray(ids), jnp.asarray(mask)
        )
        _ = float(jnp.sum(last))  # warm + sync
        t0 = time.monotonic()
        for _i in range(reps):
            aux, last = runner._forward(
                runner.params, jnp.asarray(ids), jnp.asarray(mask)
            )
        _ = float(jnp.sum(last))
        return (time.monotonic() - t0) / reps

    dt1 = device_time(ids1, mask1)
    dtb = device_time(idsb, maskb)
    dev_single = 1.0 / dt1
    dev_batch = batch / dtb
    print(json.dumps({
        "metric": "capture_device_single_samples_per_s",
        "value": round(dev_single, 2), "unit": "samples/s",
    }))
    print(json.dumps({
        "metric": "capture_device_batched_samples_per_s",
        "value": round(dev_batch, 2), "unit": "samples/s",
        "speedup_vs_single": round(dev_batch / dev_single, 2),
        "prefill_tok_per_s": round(dev_batch * tokens, 0),
    }))


if __name__ == "__main__":
    main()

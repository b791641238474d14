#!/usr/bin/env python
"""Serving-speedup measurement at REALISTIC target scale, self-contained.

The product claim of a speculative-decoding framework is wall-clock serving
gain (reference README.md:61 "up to 4x inference speedup";
benchmarks/benchmarker/utils.py reports throughput per run). This script
measures it end-to-end on one chip with no downloads:

1. build the low-entropy Markov corpus (same construction as
   scripts/gates/convergence_gate.py, scaled to the full vocab);
2. train a REALISTIC-SIZE target (default 24L/2048h/32k vocab, ~1.5B params
   — the capture-bench target shape) ON-CHIP with a small JAX+optax trainer
   until its next-token loss approaches the corpus entropy;
3. capture hidden states through the production OfflineCaptureRunner
   (eagle + dflash layouts share the device-resident target params);
4. train drafts through build_training_run — an EAGLE3 draft
   (``--draft-ttt`` sets the TTT unroll: the training horizon bounds the
   serving accept plateau) and/or a Domino block-speculation draft
   (``--algorithms eagle3,domino``);
5. export to the SGLang layout, reload through the serving path, and
   measure tokens/s: plain greedy decode (fused baseline; batched plain
   baselines for ``--batch-sizes`` > 1) vs speculative decode (fused
   chain + root/beam tree + block), all single-dispatch whole-generate
   programs — the speedup ratio is the headline.

All stages keep completion markers in --workdir, so re-invocations with
different measurement flags (draft-tokens/topk/batch-sizes/ttt) reuse the
trained target, captures, and exports.

Usage:
    python scripts/measure_speedup.py --workdir /tmp/speedup \
        [--layers 24 --hidden 2048 --vocab 32000]
Prints one JSON line per stage and a final {"bench": "serving_speedup", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

SEQ = 96


def build_corpus(seed: int, n_sequences: int, chain_vocab: int):
    """Order-1 Markov chain over a ``chain_vocab``-token subset of the full
    vocab: next token follows a fixed permutation with p=0.9, else uniform.

    The chain is deliberately NARROWER than the model vocab: the model
    still pays the full-vocab softmax/head cost (the serving-cost-realistic
    part), while the corpus gives each permutation entry
    ~n_sequences*SEQ/chain_vocab training samples so the target GENERALIZES
    the chain instead of memorizing sequences — a full-vocab chain at this
    corpus size shows each transition ~once and the target's held-out
    behavior becomes unpredictable, which caps any draft's acceptance."""
    rng = np.random.default_rng(seed)
    perm = np.random.default_rng(12345).permutation(chain_vocab)
    seqs = []
    for _ in range(n_sequences):
        cur = int(rng.integers(0, chain_vocab))
        seq = [cur]
        for _ in range(SEQ - 1):
            cur = (
                int(perm[cur]) if rng.random() < 0.9
                else int(rng.integers(0, chain_vocab))
            )
            seq.append(cur)
        seqs.append(np.asarray(seq, np.int64))
    return seqs


def _target_config_dict(layers: int, hidden: int, vocab: int) -> dict:
    return {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": vocab,
        "hidden_size": hidden,
        "intermediate_size": 4 * hidden,
        "num_hidden_layers": layers,
        "num_attention_heads": hidden // 128,
        "num_key_value_heads": max(hidden // 512, 1),
        "max_position_embeddings": 4096,
        "rms_norm_eps": 1e-6,
        "rope_theta": 1e6,
        "tie_word_embeddings": False,
    }


def train_target_onchip(target_dir: str, corpus, *, layers: int,
                        hidden: int, vocab: int, steps: int, batch: int,
                        lr: float, seed: int = 0):
    """Train the big target from scratch on-chip: fp32 params, Adafactor
    (factored second moments — full Adam state would not fit HBM next to
    the fp32 params at 1.5B scale), global-norm clipping."""
    import jax
    import jax.numpy as jnp
    import optax

    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        target_capture_forward,
    )

    cfg_dict = _target_config_dict(layers, hidden, vocab)
    config = TargetConfig(
        vocab_size=vocab, hidden_size=hidden,
        intermediate_size=4 * hidden, num_hidden_layers=layers,
        num_attention_heads=hidden // 128,
        num_key_value_heads=max(hidden // 512, 1),
        rope_theta=1e6, max_position_embeddings=4096,
    )
    rng = np.random.default_rng(seed)
    d = config.resolved_head_dim

    def w(*shape, scale=0.02):
        return jnp.asarray(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        )

    params = {
        "model.embed_tokens.weight": w(vocab, hidden),
        "model.norm.weight": jnp.ones((hidden,), jnp.float32),
        "lm_head.weight": w(vocab, hidden),
    }
    h_heads = config.num_attention_heads
    kvh = config.num_key_value_heads
    inter = config.intermediate_size
    for i in range(layers):
        p = f"model.layers.{i}."
        params[p + "self_attn.q_proj.weight"] = w(h_heads * d, hidden)
        params[p + "self_attn.k_proj.weight"] = w(kvh * d, hidden)
        params[p + "self_attn.v_proj.weight"] = w(kvh * d, hidden)
        params[p + "self_attn.o_proj.weight"] = w(hidden, h_heads * d)
        params[p + "mlp.gate_proj.weight"] = w(inter, hidden)
        params[p + "mlp.up_proj.weight"] = w(inter, hidden)
        params[p + "mlp.down_proj.weight"] = w(hidden, inter)
        params[p + "input_layernorm.weight"] = jnp.ones(
            (hidden,), jnp.float32)
        params[p + "post_attention_layernorm.weight"] = jnp.ones(
            (hidden,), jnp.float32)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adafactor(learning_rate=lr, min_dim_size_to_factor=32),
    )
    opt_state = tx.init(params)

    def loss_fn(params, ids):
        _aux, last, _ = target_capture_forward(
            params, config, ids, jnp.ones_like(ids), (1,),
        )
        logits = last[:, :-1] @ params["lm_head.weight"].T  # [B, S-1, V]
        labels = ids[:, 1:]
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(
            logits, labels[..., None], axis=-1
        )[..., 0]
        return jnp.mean(logz - gold)

    @jax.jit
    def step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data = np.stack(corpus)
    srng = np.random.default_rng(seed)
    first = last_loss = None
    t0 = time.monotonic()
    for it in range(steps):
        idx = srng.integers(0, len(data), size=batch)
        ids = jnp.asarray(data[idx], jnp.int32)
        params, opt_state, loss = step(params, opt_state, ids)
        if it % 25 == 0 or it == steps - 1:
            loss = float(loss)
            first = loss if first is None else first
            last_loss = loss
            print(f"  target step {it}: loss={loss:.3f} "
                  f"({time.monotonic() - t0:.0f}s)", file=sys.stderr)

    # persist through the standard HF-layout path (sharded: safetensors has
    # a 2^31-ish practical single-buffer comfort zone; shard per ~2GB)
    os.makedirs(target_dir, exist_ok=True)
    from safetensors.numpy import save_file

    import ml_dtypes

    items = [
        (k, np.asarray(v).astype(ml_dtypes.bfloat16))
        for k, v in params.items()
    ]
    shards, cur, cur_bytes = [], [], 0
    for k, v in items:
        if cur_bytes + v.nbytes > 2 << 30 and cur:
            shards.append(cur)
            cur, cur_bytes = [], 0
        cur.append((k, v))
        cur_bytes += v.nbytes
    if cur:
        shards.append(cur)
    weight_map = {}
    for si, shard in enumerate(shards):
        name = f"model-{si + 1:05d}-of-{len(shards):05d}.safetensors"
        save_file(dict(shard), os.path.join(target_dir, name))
        for k, _ in shard:
            weight_map[k] = name
    with open(os.path.join(target_dir,
                           "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(os.path.join(target_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
    return first, last_loss


def capture_splits(target_dir: str, splits):
    """Capture several (out_dir, seqs, layout, capture_layers) splits with
    device-resident target params shared across runners — the params upload
    once (multi-GB over a debug tunnel makes a second per-split upload the
    dominant cost). ``capture_layers`` is baked into each runner's jitted
    forward, so distinct (layout, layers) combos get their own runner built
    on the already-uploaded params."""
    import dataclasses

    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )

    runners = {}
    shared_params = None
    for out_dir, seqs, layout, capture_layers in splits:
        marker = os.path.join(out_dir, ".split_done")
        if os.path.exists(marker):
            continue
        key = (layout, tuple(capture_layers))
        if key not in runners:
            config = OfflineCaptureConfig(
                target_model_path=target_dir,
                output_dir=out_dir,
                capture_layers=tuple(capture_layers),
                max_length=SEQ,
                batch_size=16,
                layout=layout,
                store_dtype="bfloat16",
            )
            runners[key] = OfflineCaptureRunner(
                config, target_params=shared_params,
            )
            shared_params = runners[key].params
        runner = runners[key]
        runner.config = dataclasses.replace(
            runner.config, output_dir=out_dir)
        runner.run([
            {"input_ids": s, "loss_mask": np.ones_like(s)} for s in seqs
        ])
        open(marker, "w").close()


def train_draft(workdir: str, *, target_dir: str, train_dir: str,
                eval_dir: str, hidden: int, vocab: int, epochs: int,
                lr: float, ttt_length: int = 3):
    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config

    draft_config = {
        "architectures": ["LlamaEagle3Draft"],
        "vocab_size": vocab, "draft_vocab_size": vocab,
        "hidden_size": hidden, "intermediate_size": 4 * hidden,
        "num_attention_heads": hidden // 128,
        "num_key_value_heads": max(hidden // 512, 1),
        "max_position_embeddings": 4096,
        "rope_theta": 1e6,
    }
    tag = "" if ttt_length == 3 else f"-ttt{ttt_length}"
    out_dir = os.path.join(workdir, f"runs-speedup{tag}")
    config = Config.model_validate({
        "run_id": f"speedup{tag}",
        "output_dir": out_dir,
        "model": {
            "target_model_path": target_dir,
            "draft_config": draft_config,
        },
        "data": {
            "train_data_path": train_dir,
            "eval_data_path": eval_dir,
            "max_length": SEQ, "num_workers": 0,
        },
        "training": {
            "strategy": "eagle3", "batch_size": 8,
            "num_epochs": epochs, "learning_rate": lr,
            "ttt_length": ttt_length, "eval_interval": 40,
            "log_interval": 10,
            "seed": 7,
        },
        "tracking": {"backend": "jsonl"},
    })
    build_training_run(config).fit()
    return out_dir, draft_config


def train_domino_draft(workdir: str, *, target_dir: str, train_dir: str,
                       layers: int, hidden: int, vocab: int, epochs: int,
                       lr: float, dflash_layers):
    """Train a realistic-scale Domino block-speculation draft on the SAME
    trained target (strategy/draft contract as the convergence gate,
    scaled: 2-layer DFlash backbone + GRU correction head, block_size 4)."""
    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config

    draft_config = {
        "architectures": ["DominoDraftModel"],
        "vocab_size": vocab, "hidden_size": hidden,
        "intermediate_size": 4 * hidden,
        "num_attention_heads": hidden // 128,
        "num_key_value_heads": max(hidden // 512, 1),
        "head_dim": 128,
        "num_hidden_layers": 2, "num_target_layers": layers,
        "block_size": 4,
        "max_position_embeddings": 4096,
        "rope_theta": 1e6,
        "dflash_config": {
            "mask_token_id": vocab - 1,
            "target_layer_ids": list(dflash_layers),
            "projector_type": "domino",
            "pure_draft_prefix_len": 1,
            "emb_dim": 32,
            "gru_hidden_dim": 64,
            "shift_label": True,
        },
    }
    out_dir = os.path.join(workdir, "runs-speedup-domino")
    config = Config.model_validate({
        "run_id": "speedup-domino",
        "output_dir": out_dir,
        "model": {
            "target_model_path": target_dir,
            "draft_config": draft_config,
        },
        "data": {
            "train_data_path": train_dir,
            "max_length": SEQ, "num_workers": 0,
        },
        "training": {
            "strategy": "domino", "batch_size": 8,
            "num_epochs": epochs, "learning_rate": lr,
            "num_anchors": 16, "mask_token_id": vocab - 1,
            "objective_chunk_blocks": 8,
            "log_interval": 10, "seed": 7,
        },
        "tracking": {"backend": "jsonl"},
    })
    build_training_run(config).fit()
    return out_dir, draft_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--layers", type=int, default=24)
    parser.add_argument("--hidden", type=int, default=2048)
    parser.add_argument("--vocab", type=int, default=32000)
    parser.add_argument("--chain-vocab", type=int, default=2000,
                        help="token subset the Markov chain runs over "
                             "(model vocab stays --vocab; see build_corpus)")
    parser.add_argument("--seq", type=int, default=96,
                        help="corpus sequence length — the draft's training "
                             "context bounds its serving accept horizon "
                             "(docs/benchmarks.md accept-decay note)")
    parser.add_argument("--target-steps", type=int, default=400)
    parser.add_argument("--target-batch", type=int, default=8)
    parser.add_argument("--target-lr", type=float, default=1e-2)
    parser.add_argument("--train-sequences", type=int, default=320)
    parser.add_argument("--eval-sequences", type=int, default=32)
    parser.add_argument("--draft-epochs", type=int, default=6)
    parser.add_argument("--draft-ttt", type=int, default=3,
                        help="eagle3 TTT unroll length — the training "
                             "horizon bounds the serving accept plateau")
    parser.add_argument("--draft-lr", type=float, default=1e-3)
    parser.add_argument("--draft-tokens", default="3")
    parser.add_argument("--topk", default="1,2")
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument("--max-len", type=int, default=256)
    parser.add_argument("--prompts", type=int, default=8)
    parser.add_argument("--batch-sizes", default="1",
                        help="comma list; >1 adds batched eagle-chain "
                             "serving cells (plain baseline stays bs1)")
    parser.add_argument("--algorithms", default="eagle3,domino",
                        help="comma list: eagle3 (chain/tree spec) and/or "
                             "domino (block speculation) — both reuse the "
                             "same trained target + device-resident params")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    global SEQ
    SEQ = args.seq
    algorithms = [a.strip() for a in args.algorithms.split(",") if a.strip()]

    os.makedirs(args.workdir, exist_ok=True)
    target_dir = os.path.join(args.workdir, "target")
    train_dir = os.path.join(args.workdir, "features/train")
    eval_dir = os.path.join(args.workdir, "features/eval")
    domino_train_dir = os.path.join(args.workdir, "features-domino/train")
    corpus_train = build_corpus(0, args.train_sequences, args.chain_vocab)
    corpus_eval = build_corpus(1, args.eval_sequences, args.chain_vocab)

    n = args.layers
    capture_layers = (1, n // 2 - 1, n - 4)
    dflash_layers = (1, n // 2)

    if not os.path.exists(os.path.join(target_dir, "config.json")):
        print("training target on-chip...", file=sys.stderr)
        first, last = train_target_onchip(
            target_dir, corpus_train, layers=args.layers,
            hidden=args.hidden, vocab=args.vocab,
            steps=args.target_steps, batch=args.target_batch,
            lr=args.target_lr,
        )
        print(json.dumps({"stage": "target", "loss_first": round(first, 3),
                          "loss_last": round(last, 3)}))

    splits = []
    if "eagle3" in algorithms:
        splits += [(train_dir, corpus_train, "eagle", capture_layers),
                   (eval_dir, corpus_eval, "eagle", capture_layers)]
    if "domino" in algorithms:
        splits += [(domino_train_dir, corpus_train, "dflash",
                    dflash_layers)]
    if any(not os.path.exists(os.path.join(d, ".split_done"))
           for d, *_ in splits):
        print("capturing features...", file=sys.stderr)
        capture_splits(target_dir, splits)
        print(json.dumps({"stage": "capture",
                          "train": args.train_sequences,
                          "eval": args.eval_sequences}))

    exports = {}  # algorithm -> export dir
    if "eagle3" in algorithms:
        ttt_tag = "" if args.draft_ttt == 3 else f"-ttt{args.draft_ttt}"
        export_dir = os.path.join(args.workdir, f"export{ttt_tag}")
        if not os.path.exists(os.path.join(
                export_dir, "model.safetensors")):
            print("training draft...", file=sys.stderr)
            run_root, draft_config = train_draft(
                args.workdir, target_dir=target_dir, train_dir=train_dir,
                eval_dir=eval_dir, hidden=args.hidden, vocab=args.vocab,
                epochs=args.draft_epochs, lr=args.draft_lr,
                ttt_length=args.draft_ttt,
            )
            draft_config_path = os.path.join(
                args.workdir, f"draft{ttt_tag}.json")
            with open(draft_config_path, "w") as f:
                json.dump(draft_config, f)
            from specforge_tpu.export.exporter import export_checkpoint

            export_checkpoint(
                run_root, export_dir, fmt="sglang",
                draft_config_path=draft_config_path,
            )
            print(json.dumps({"stage": "export"}))
        exports["eagle3"] = export_dir
    if "domino" in algorithms:
        export_dir = os.path.join(args.workdir, "export-domino")
        if not os.path.exists(os.path.join(
                export_dir, "model.safetensors")):
            print("training domino draft...", file=sys.stderr)
            run_root, draft_config = train_domino_draft(
                args.workdir, target_dir=target_dir,
                train_dir=domino_train_dir, layers=args.layers,
                hidden=args.hidden, vocab=args.vocab,
                epochs=args.draft_epochs, lr=args.draft_lr,
                dflash_layers=dflash_layers,
            )
            draft_config_path = os.path.join(
                args.workdir, "draft-domino.json")
            with open(draft_config_path, "w") as f:
                json.dump(draft_config, f)
            from specforge_tpu.export.exporter import export_checkpoint

            export_checkpoint(
                run_root, export_dir, fmt="sglang",
                draft_config_path=draft_config_path,
            )
            print(json.dumps({"stage": "export-domino"}))
        exports["domino"] = export_dir

    # serving measurement: plain vs chain vs tree (eagle3) / block (domino),
    # all fused single-dispatch programs
    from specforge_tpu.benchmarks.accept_grid import run_grid

    prompts_path = os.path.join(args.workdir, "prompts.jsonl")
    with open(prompts_path, "w") as f:
        for s in corpus_eval[: args.prompts]:
            f.write(json.dumps(
                {"input_ids": [int(x) for x in s[:24]]}) + "\n")
    grid = []
    for algorithm, export_dir in exports.items():
        report = run_grid(
            target_dir, export_dir,
            {"markov": prompts_path},
            [int(x) for x in args.draft_tokens.split(",")],
            args.max_new_tokens, args.prompts,
            topks=[int(x) for x in args.topk.split(",")],
            max_len=args.max_len,
            batch_sizes=[int(x) for x in args.batch_sizes.split(",")],
            family="dflash" if algorithm == "domino" else "eagle3",
            # the strongest tree mode for the headline (root-tree numbers
            # are in the accept-length comparison table, docs/benchmarks.md)
            tree_style="beam",
        )
        for cell in report["grid"]:
            cell["algorithm"] = algorithm
        grid += report["grid"]
    best = max(
        (c for c in grid if "speedup" in c),
        key=lambda c: c["speedup"], default=None,
    )
    summary = {
        "bench": "serving_speedup",
        "target": f"{args.layers}L/{args.hidden}h/{args.vocab}v",
        "grid": grid,
        "best_speedup": best["speedup"] if best else None,
        "best_speedup_per_algorithm": {
            a: max((c["speedup"] for c in grid
                    if c["algorithm"] == a and "speedup" in c),
                   default=None)
            for a in exports
        },
    }
    print(json.dumps(summary))
    out = args.out or os.path.join(args.workdir, "speedup.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

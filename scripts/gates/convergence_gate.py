#!/usr/bin/env python
"""Convergence gate: proof the framework trains a WORKING draft end-to-end.

Everything the reference demonstrates with a real run — acceptance climbing
during training (docs/benchmarks/eagle3-disaggregated-parity.md:18-24 shows
eval/simulated_acc_len 0.00133 → 0.0337 over 180 steps) — reproduced
self-contained on one chip with no downloads:

1. build a low-entropy synthetic corpus (order-1 Markov chain, 90%%
   deterministic transitions);
2. train a tiny torch Llama TARGET on it until its next-token loss
   approaches the corpus entropy (so its hidden states carry real signal);
3. capture hidden states with the repo's own offline pipeline
   (``OfflineCaptureRunner`` — the production capture path);
4. train a draft for a few hundred steps through ``build_training_run``;
5. assert the learning signal CLIMBS (``climb_metric`` names the series,
   pass = last >= --min-climb x first), per family:
   - eagle3: ``eval/simulated_acc_len`` (held-out eval) rises, and the
     exported draft's measured ``mean_accept_length`` (via the serving
     harness, greedy-equivalence enforced) beats a 1-step "untrained"
     baseline export by --min-accept-gain;
   - domino: ``train/accept_len`` (block accept telemetry) rises, and
     the exported draft's block-speculation accept length beats the
     1-step baseline export (DFlash block serving harness);
   - dflash / dspark: ``train/accuracy`` (masked-position / block
     accuracy) rises, plus the same exported block-speculation
     trained-vs-baseline comparison as domino;
   - peagle: ``train/accuracy`` (COD masked-position accuracy over all
     depths) rises, and a held-out eval probe (1-step runs on EVAL
     features, warm-started from the trained checkpoint vs fresh init)
     shows the trained draft's eval accuracy beating fresh init by
     --min-accept-gain. No serving comparison — the reference ships no
     P-EAGLE export/serving path either.

Exit 0 = gate passed; prints ONE JSON verdict line.

Usage:
    JAX_PLATFORMS=cpu python scripts/gates/convergence_gate.py \
        --workdir /tmp/conv --algorithm eagle3
Opt-in slow test wrapper: tests/test_convergence_gate.py
(SPECFORGE_RUN_CONVERGENCE=1), mirroring the reference's env-gated live
gates (SPECFORGE_RUN_SERVER_CAPTURE_TESTS, .github/workflows/test.yaml).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# honor JAX_PLATFORMS=cpu even where a sitecustomize pins another platform
# via jax.config (the conftest does the same for tests) — without this the
# "CPU" gate silently runs on the device with per-shape remote compiles
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

VOCAB = 256
HIDDEN = 128
SEQ = 96


def build_corpus(seed: int, n_sequences: int):
    """Order-1 Markov chain over VOCAB tokens: the next token follows a
    fixed random permutation with p=0.9, else uniform. Entropy ≈ 0.88 nats,
    so a trained target's argmax is deterministic given one token of
    context — a draft reading its hidden states can learn it fully.

    The permutation (the chain itself) is FIXED across seeds; ``seed``
    varies only the sampled sequences — train and eval splits must come
    from the same process or eval acceptance measures distribution shift,
    not learning."""
    rng = np.random.default_rng(seed)
    # avoid token VOCAB-1 (reserved as the DFlash mask token)
    usable = VOCAB - 1
    perm = np.random.default_rng(12345).permutation(usable)
    seqs = []
    for _ in range(n_sequences):
        cur = int(rng.integers(0, usable))
        seq = [cur]
        for _ in range(SEQ - 1):
            if rng.random() < 0.9:
                cur = int(perm[cur])
            else:
                cur = int(rng.integers(0, usable))
            seq.append(cur)
        seqs.append(np.asarray(seq, np.int64))
    return seqs


def train_target(target_dir: str, corpus, *, steps: int, seed: int = 0):
    """Train a tiny torch Llama on the corpus (CPU) so its hidden states
    encode the Markov structure; returns (initial_loss, final_loss)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=2 * HIDDEN,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4 * SEQ,
    ))
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-3)
    data = torch.tensor(np.stack(corpus), dtype=torch.long)
    rng = np.random.default_rng(seed)
    batch = 32
    first = last = None
    for step in range(steps):
        idx = rng.integers(0, len(data), size=batch)
        ids = data[idx]
        out = model(input_ids=ids, labels=ids)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        loss = float(out.loss)
        first = loss if first is None else first
        last = loss
        if step % 50 == 0:
            print(f"  target step {step}: loss={loss:.3f}", file=sys.stderr)
    model.eval()
    model.save_pretrained(target_dir, safe_serialization=True)
    return first, last


#: written after a capture fully completes — reuse gates on THIS, not on
#: bare directory existence (an interrupted capture leaves a partial dir)
_CAPTURE_MARKER = ".capture_complete"


def capture_complete(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, _CAPTURE_MARKER))


def capture_features(target_dir: str, out_dir: str, seqs, *, layout: str,
                     capture_layers):
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )

    runner = OfflineCaptureRunner(OfflineCaptureConfig(
        target_model_path=target_dir,
        output_dir=out_dir,
        capture_layers=tuple(capture_layers),
        max_length=SEQ,
        batch_size=16,
        layout=layout,
    ))
    samples = [
        {"input_ids": s, "loss_mask": np.ones_like(s)} for s in seqs
    ]
    written = runner.run(samples)
    with open(os.path.join(out_dir, _CAPTURE_MARKER), "w") as f:
        f.write(f"{len(written)}\n")
    return written


def _read_metric_series(metrics_jsonl: str, key: str):
    series = []
    with open(metrics_jsonl) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if key in rec.get("metrics", rec):
                payload = rec.get("metrics", rec)
                series.append((rec.get("step", len(series)), payload[key]))
    # one point per step (interval + epoch-end evals can coincide)
    by_step = dict(series)
    return sorted(by_step.items())


def _train_draft(workdir: str, run_id: str, *, algorithm: str,
                 target_dir: str, train_dir: str, eval_dir: str,
                 draft_config: dict, total_steps=None, num_epochs: int = 4,
                 eval_interval: int = 16, learning_rate: float = 1e-3,
                 log_interval: int = 8, warm_start: str = None):
    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config

    out_dir = os.path.join(workdir, f"runs-{run_id}")
    training = {
        "strategy": algorithm, "batch_size": 8,
        "num_epochs": num_epochs, "learning_rate": learning_rate,
        "log_interval": log_interval, "seed": 7,
    }
    if total_steps is not None:
        training["total_steps"] = total_steps
    if algorithm == "eagle3":
        training.update({"ttt_length": 3, "eval_interval": eval_interval})
    elif algorithm == "peagle":
        training.update({
            "mask_token_id": VOCAB - 1, "num_depths": 4,
            "down_sample_ratio": 0.7, "down_sample_ratio_min": 0.3,
        })
    else:  # dflash family (dflash / domino / dspark)
        training.update({
            "num_anchors": 16, "mask_token_id": VOCAB - 1,
            "objective_chunk_blocks": 8,
        })
    config = Config.model_validate({
        "run_id": run_id,
        "output_dir": out_dir,
        "model": {
            "target_model_path": target_dir,
            "draft_config": draft_config,
            **({"draft_checkpoint_path": warm_start} if warm_start else {}),
        },
        "data": {
            "train_data_path": train_dir,
            "eval_data_path": eval_dir if algorithm == "eagle3" else None,
            "max_length": SEQ, "num_workers": 0,
        },
        "training": training,
        "tracking": {"backend": "jsonl"},
    })
    trainer = build_training_run(config)
    trainer.fit()
    return out_dir


def _export(workdir: str, run_dir: str, run_id: str, draft_config: dict,
            fmt: str):
    from specforge_tpu.export.exporter import export_checkpoint

    draft_config_path = os.path.join(workdir, f"{run_id}-draft.json")
    with open(draft_config_path, "w") as f:
        json.dump(draft_config, f)
    export_dir = os.path.join(workdir, f"export-{run_id}")
    export_checkpoint(run_dir, export_dir, fmt=fmt,
                      draft_config_path=draft_config_path)
    return export_dir


def _measure_accept(target_dir: str, export_dir: str, prompts,
                    capture_layers):
    from serving_gate import run_gate

    summary = run_gate(
        target_dir, export_dir, prompts,
        num_draft_tokens=3, max_new_tokens=48,
        capture_layers=capture_layers,
    )
    return summary["mean_accept_length"]


def run_eagle3(workdir: str, corpus_train, corpus_eval, target_dir: str,
               total_steps_baseline: int = 1, smoke: bool = False):
    capture_layers = (1, 3, 5)  # 6-layer target; same layers at serving
    train_dir = os.path.join(workdir, "features-eagle/train")
    eval_dir = os.path.join(workdir, "features-eagle/eval")
    print("capturing eagle features...", file=sys.stderr)
    capture_features(target_dir, train_dir, corpus_train, layout="eagle",
                     capture_layers=capture_layers)
    capture_features(target_dir, eval_dir, corpus_eval, layout="eagle",
                     capture_layers=capture_layers)

    draft_config = {
        "architectures": ["LlamaEagle3Draft"],
        "vocab_size": VOCAB, "draft_vocab_size": VOCAB,
        "hidden_size": HIDDEN, "intermediate_size": 2 * HIDDEN,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 4 * SEQ,
    }

    if smoke:
        # always-on CI variant: prove the math still LEARNS in ~2 min —
        # climb-metric only (the export/serving-accept leg stays in the
        # full opt-in gate). 2 epochs over the shrunken corpus, dense
        # eval points so the first one lands early.
        run_dir = _train_draft(
            workdir, "conv-smoke", algorithm="eagle3",
            target_dir=target_dir, train_dir=train_dir, eval_dir=eval_dir,
            draft_config=draft_config, num_epochs=2, eval_interval=8,
        )
        series = _read_metric_series(
            os.path.join(run_dir, "conv-smoke.metrics.jsonl"),
            "eval/simulated_acc_len",
        )
        if len(series) < 2:
            raise SystemExit(f"GATE FAILED: too few eval points: {series}")
        return {
            "climb_metric": "eval/simulated_acc_len",
            "series": [(int(s), round(float(v), 4)) for s, v in series],
            "first": round(float(series[0][1]), 4),
            "last": round(float(series[-1][1]), 4),
        }

    print("training baseline (1 step)...", file=sys.stderr)
    base_run = _train_draft(
        workdir, "conv-base", algorithm="eagle3", target_dir=target_dir,
        train_dir=train_dir, eval_dir=eval_dir, draft_config=draft_config,
        total_steps=total_steps_baseline, num_epochs=1, eval_interval=0,
    )
    print("training draft...", file=sys.stderr)
    run_dir = _train_draft(
        workdir, "conv", algorithm="eagle3", target_dir=target_dir,
        train_dir=train_dir, eval_dir=eval_dir, draft_config=draft_config,
    )

    series = _read_metric_series(
        os.path.join(run_dir, "conv.metrics.jsonl"), "eval/simulated_acc_len"
    )
    if len(series) < 2:
        raise SystemExit(f"GATE FAILED: too few eval points: {series}")
    acc_first, acc_last = series[0][1], series[-1][1]

    prompts = [list(map(int, s[:24])) for s in corpus_eval[:4]]
    base_export = _export(workdir, base_run, "conv-base", draft_config,
                          "sglang")
    export_dir = _export(workdir, run_dir, "conv", draft_config, "sglang")
    accept_untrained = _measure_accept(target_dir, base_export, prompts,
                                       capture_layers)
    accept_trained = _measure_accept(target_dir, export_dir, prompts,
                                     capture_layers)
    return {
        "climb_metric": "eval/simulated_acc_len",
        "series": [
            (int(s), round(float(v), 4)) for s, v in series
        ],
        "first": round(float(acc_first), 4),
        "last": round(float(acc_last), 4),
        "accept_untrained": round(float(accept_untrained), 4),
        "accept_trained": round(float(accept_trained), 4),
    }


def run_domino(workdir: str, corpus_train, corpus_eval, target_dir: str,
               projector: str = "domino"):
    head = {
        "domino": {
            "pure_draft_prefix_len": 1,
            "emb_dim": 32,
            "gru_hidden_dim": 64,
            "shift_label": True,
        },
        "dspark": {
            "markov_rank": 16,
            "markov_head_type": "gated",
            "enable_confidence_head": True,
        },
        "dflash": {},  # vanilla: no correction head
    }[projector]
    draft_config = {
        "architectures": [
            {"domino": "DominoDraftModel",
             "dspark": "DSparkDraftModel",
             "dflash": "DFlashDraftModel"}[projector]
        ],
        "vocab_size": VOCAB, "hidden_size": HIDDEN,
        "intermediate_size": 2 * HIDDEN,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "head_dim": HIDDEN // 4,
        "num_hidden_layers": 2, "num_target_layers": 6,
        "block_size": 4,
        "max_position_embeddings": 4 * SEQ,
        "dflash_config": {
            "mask_token_id": VOCAB - 1,
            "target_layer_ids": [1, 4],
            # vanilla dflash has no correction head (projector_type None)
            **({} if projector == "dflash"
               else {"projector_type": projector}),
            **head,
        },
    }
    capture_layers = (1, 4)
    train_dir = os.path.join(workdir, "features-dflash/train")
    print("capturing dflash features...", file=sys.stderr)
    capture_features(target_dir, train_dir, corpus_train, layout="dflash",
                     capture_layers=capture_layers)

    rid = "convd" if projector == "domino" else f"conv-{projector}"
    print(f"training {projector} baseline (1 step)...", file=sys.stderr)
    base_run = _train_draft(
        workdir, f"{rid}-base", algorithm=projector, target_dir=target_dir,
        train_dir=train_dir, eval_dir=None, draft_config=draft_config,
        total_steps=1, num_epochs=1,
    )
    print(f"training {projector} draft...", file=sys.stderr)
    run_dir = _train_draft(
        workdir, rid, algorithm=projector, target_dir=target_dir,
        train_dir=train_dir, eval_dir=None, draft_config=draft_config,
        num_epochs=6,
    )
    # domino logs block accept length; dspark logs block accuracy; vanilla
    # dflash logs masked-position accuracy — all strictly rise when the
    # draft learns
    climb_key = {
        "domino": "train/accept_len",
        "dspark": "train/accuracy",
        "dflash": "train/accuracy",
    }[projector]
    series = _read_metric_series(
        os.path.join(run_dir, f"{rid}.metrics.jsonl"), climb_key
    )
    if len(series) < 2:
        raise SystemExit(f"GATE FAILED: too few {climb_key} points: {series}")
    out = {
        "climb_metric": climb_key,
        "series": [
            (int(s), round(float(v), 4)) for s, v in series
        ],
        "first": round(float(series[0][1]), 4),
        "last": round(float(series[-1][1]), 4),
    }
    # serving-side comparison: exported block-speculation accept length,
    # trained vs 1-step baseline (DFlash-family export + block spec decode)
    try:
        from dflash_serving_gate import run_gate as dflash_gate
    except ImportError:
        return out
    prompts = [list(map(int, s[:24])) for s in corpus_eval[:4]]
    base_export = _export(workdir, base_run, f"{rid}-base", draft_config,
                          "sglang")
    export_dir = _export(workdir, run_dir, rid, draft_config, "sglang")
    out["accept_untrained"] = dflash_gate(
        target_dir, base_export, prompts)["mean_accept_length"]
    out["accept_trained"] = dflash_gate(
        target_dir, export_dir, prompts)["mean_accept_length"]
    return out


def _peagle_eval_probe(workdir: str, run_id: str, *, target_dir: str,
                       eval_dir: str, draft_config: dict,
                       warm_start: str = None) -> float:
    """Held-out accuracy of a peagle draft: run probe steps over the EVAL
    feature set at a negligible learning rate (schema requires lr > 0) and
    average the logged COD accuracy — the forward metrics ARE eval accuracy
    when the weights don't move. ``warm_start``: trained run dir (weights
    only) vs None (fresh init baseline)."""
    run_dir = _train_draft(
        workdir, run_id, algorithm="peagle", target_dir=target_dir,
        train_dir=eval_dir, eval_dir=None, draft_config=draft_config,
        num_epochs=1, learning_rate=1e-12, log_interval=1,
        warm_start=warm_start,
    )
    series = _read_metric_series(
        os.path.join(run_dir, f"{run_id}.metrics.jsonl"), "train/accuracy"
    )
    if not series:
        raise SystemExit(f"GATE FAILED: eval probe {run_id} logged nothing")
    return float(np.mean([v for _s, v in series]))


def run_peagle(workdir: str, corpus_train, corpus_eval, target_dir: str):
    """P-EAGLE COD convergence: ``train/accuracy`` (set-wide masked-position
    accuracy over all COD depths) must climb, a held-out eval probe
    (trained weights vs fresh init over EVAL features) must show the gain
    generalizes, and the EXPORTED draft must beat a 1-step baseline export
    through the COD serving loop (PEagleSpecDecoder, greedy-equivalence
    enforced) — a serving leg the reference does not have (its
    algorithms/peagle/ is training-only)."""
    capture_layers = (1, 3, 5)  # same eagle-layout capture as EAGLE3
    train_dir = os.path.join(workdir, "features-eagle/train")
    eval_dir = os.path.join(workdir, "features-eagle/eval")
    if not capture_complete(train_dir):
        print("capturing eagle features...", file=sys.stderr)
        capture_features(target_dir, train_dir, corpus_train, layout="eagle",
                         capture_layers=capture_layers)
    if not capture_complete(eval_dir):
        print("capturing eagle eval features...", file=sys.stderr)
        capture_features(target_dir, eval_dir, corpus_eval, layout="eagle",
                         capture_layers=capture_layers)

    draft_config = {
        "architectures": ["PEagleDraftModel"],
        "vocab_size": VOCAB, "draft_vocab_size": VOCAB,
        "hidden_size": HIDDEN, "intermediate_size": 2 * HIDDEN,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2,
        "max_position_embeddings": 4 * SEQ,
    }
    print("training peagle draft...", file=sys.stderr)
    run_dir = _train_draft(
        workdir, "convp", algorithm="peagle", target_dir=target_dir,
        train_dir=train_dir, eval_dir=None, draft_config=draft_config,
        num_epochs=6,
    )
    series = _read_metric_series(
        os.path.join(run_dir, "convp.metrics.jsonl"), "train/accuracy"
    )
    if len(series) < 2:
        raise SystemExit(f"GATE FAILED: too few accuracy points: {series}")
    print("peagle eval probes (trained vs fresh init)...", file=sys.stderr)
    eval_trained = _peagle_eval_probe(
        workdir, "convp-eval-trained", target_dir=target_dir,
        eval_dir=eval_dir, draft_config=draft_config, warm_start=run_dir,
    )
    eval_fresh = _peagle_eval_probe(
        workdir, "convp-eval-fresh", target_dir=target_dir,
        eval_dir=eval_dir, draft_config=draft_config,
    )

    # serving leg: exported trained draft vs a 1-step baseline export,
    # through the COD serving loop
    print("peagle serving comparison (export → COD decode)...",
          file=sys.stderr)
    base_run = _train_draft(
        workdir, "convp-base", algorithm="peagle", target_dir=target_dir,
        train_dir=train_dir, eval_dir=None, draft_config=draft_config,
        total_steps=1, num_epochs=1,
    )
    export_dir = _export(workdir, run_dir, "convp", draft_config, "hf")
    base_export = _export(workdir, base_run, "convp-base", draft_config,
                          "hf")
    prompts = [list(map(int, s[:24])) for s in corpus_eval[:4]]
    accept_trained = _measure_peagle_accept(
        target_dir, export_dir, prompts, capture_layers,
        mask_token_id=VOCAB - 1, num_depths=4,
    )
    accept_untrained = _measure_peagle_accept(
        target_dir, base_export, prompts, capture_layers,
        mask_token_id=VOCAB - 1, num_depths=4,
    )
    return {
        "climb_metric": "train/accuracy",
        "series": [
            (int(s), round(float(v), 4)) for s, v in series
        ],
        "first": round(float(series[0][1]), 4),
        "last": round(float(series[-1][1]), 4),
        "eval_cod_accuracy_fresh": round(eval_fresh, 4),
        "eval_cod_accuracy_trained": round(eval_trained, 4),
        "accept_metric": "cod_serving_accept",
        "accept_untrained": round(accept_untrained, 4),
        "accept_trained": round(accept_trained, 4),
    }


def _measure_peagle_accept(target_dir, export_dir, prompts, capture_layers,
                           *, mask_token_id, num_depths,
                           max_new_tokens: int = 48):
    """Mean accept length of an exported P-EAGLE draft through the COD
    serving loop, with the greedy-equivalence invariant enforced."""
    import numpy as _np

    from specforge_tpu.inference.serving_loaders import (
        load_exported_peagle_draft,
    )
    from specforge_tpu.inference.spec_decode import (
        PEagleSpecDecoder,
        greedy_target_decode,
    )
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    config = TargetConfig.from_file(target_dir)
    params = load_target_params(target_dir, config)
    module, variables = load_exported_peagle_draft(export_dir)
    decoder = PEagleSpecDecoder(
        params, config, module, variables, capture_layers,
        mask_token_id=mask_token_id, num_depths=num_depths, max_len=192,
    )
    accepts = []
    for p in prompts:
        res = decoder.generate(p, max_new_tokens=max_new_tokens)
        oracle = greedy_target_decode(
            params, config, p, max_new_tokens, max_len=192,
        )
        n = min(len(res.output_ids), len(oracle))
        if not _np.array_equal(res.output_ids[:n], oracle[:n]):
            raise SystemExit(
                "GATE FAILED: peagle COD serving broke greedy equivalence"
            )
        accepts.extend(res.accept_lengths)
    return float(_np.mean(accepts)) if accepts else 0.0


def run_eagle3_online(workdir: str, corpus_eval, target_dir: str,
                      *, n_prompts: int = 2048, total_steps: int = 256):
    """The ONLINE counterpart of run_eagle3: drive the convergence corpus
    through the REAL disaggregated stack — C++ feature store + JAX capture
    server + producer + consumer (the measure_online_stack.py topology) —
    and assert the same eval-acceptance climb + exported-draft serving gain.
    The reference's flagship demonstration is exactly this: acceptance
    climbing during a disaggregated online run
    (docs/benchmarks/eagle3-disaggregated-parity.md:16-23)."""
    import signal
    import socket
    import subprocess
    import time

    repo = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )
    capture_layers = (1, 3, 5)
    batch_size = 8

    # offline eval features (held-out) + offline 1-step baseline export —
    # eval is offline by nature; the ONLINE part under test is the
    # producer→store→consumer training path
    eval_dir = os.path.join(workdir, "features-eagle/eval")
    if not capture_complete(eval_dir):
        print("capturing eagle eval features...", file=sys.stderr)
        capture_features(target_dir, eval_dir, corpus_eval, layout="eagle",
                         capture_layers=capture_layers)
    draft_config = {
        "architectures": ["LlamaEagle3Draft"],
        "vocab_size": VOCAB, "draft_vocab_size": VOCAB,
        "hidden_size": HIDDEN, "intermediate_size": 2 * HIDDEN,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 4 * SEQ,
    }

    # online prompt plan: fresh sequences of the SAME chain (the online
    # analog of multiple offline epochs — each prompt is consumed once)
    prompt_path = os.path.join(workdir, "online-prompts.jsonl")
    corpus_online = build_corpus(2, n_prompts)
    with open(prompt_path, "w") as f:
        for seq in corpus_online:
            f.write(json.dumps({
                "input_ids": [int(x) for x in seq],
                "loss_mask": [1] * len(seq),
            }) + "\n")

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    store_port, server_port = free_port(), free_port()
    out_dir = os.path.join(workdir, "runs-online")
    config_path = os.path.join(workdir, "online.json")
    with open(config_path, "w") as f:
        json.dump({
            "run_id": "convon",
            "output_dir": out_dir,
            "model": {"target_model_path": target_dir,
                      "draft_config": draft_config},
            "data": {"prompt_path": prompt_path,
                     "eval_data_path": eval_dir,
                     "max_length": SEQ, "num_workers": 0},
            "training": {
                "strategy": "eagle3", "batch_size": batch_size,
                "total_steps": total_steps, "learning_rate": 1e-3,
                "ttt_length": 3, "eval_interval": 32, "log_interval": 8,
                "save_interval": total_steps, "seed": 7,
            },
            "tracking": {"backend": "jsonl"},
            "runtime": {"store_backend": "network",
                        "store_endpoint": f"127.0.0.1:{store_port}",
                        "control_dir": os.path.join(workdir,
                                                    "online-control")},
            "deployment": {
                "mode": "disaggregated",
                "server_urls": [f"http://127.0.0.1:{server_port}"],
                "num_producer_workers": 2,
            },
        }, f)

    procs = []

    def spawn(argv, name):
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.setdefault("JAX_PLATFORMS", "cpu")
        p = subprocess.Popen(
            argv, env=env,
            stdout=open(os.path.join(workdir, f"online-{name}.log"), "w"),
            stderr=subprocess.STDOUT,
        )
        procs.append(p)
        return p

    import urllib.request
    try:
        subprocess.run(["make", "-C", os.path.join(repo, "cpp")],
                       check=True, capture_output=True)
        spawn([os.path.join(repo, "cpp", "feature_store_server"),
               "--port", str(store_port)], "store")
        spawn([sys.executable, "-m",
               "specforge_tpu.inference.capture_server_main",
               "--target-model", target_dir, "--port", str(server_port),
               "--capture-layers", *[str(c) for c in capture_layers],
               "--max-length", str(SEQ)], "capture")
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{server_port}/health", timeout=1)
                break
            except OSError:
                time.sleep(0.5)
        else:
            raise SystemExit("GATE FAILED: capture server never healthy")

        print("online stack up; training consumer...", file=sys.stderr)
        producer = spawn(
            [sys.executable, "-m", "specforge_tpu.cli", "train",
             "-c", config_path, "--set", "training.role=producer"],
            "producer")
        consumer = spawn(
            [sys.executable, "-m", "specforge_tpu.cli", "train",
             "-c", config_path, "--set", "training.role=consumer"],
            "consumer")
        rc_c = consumer.wait(timeout=3600)
        rc_p = producer.wait(timeout=600)
        if rc_c != 0 or rc_p != 0:
            raise SystemExit(
                f"GATE FAILED: online stack consumer rc={rc_c} producer "
                f"rc={rc_p} (see {workdir}/online-consumer.log)"
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

    series = _read_metric_series(
        os.path.join(out_dir, "convon.metrics.jsonl"),
        "eval/simulated_acc_len",
    )
    if len(series) < 2:
        raise SystemExit(f"GATE FAILED: too few eval points: {series}")

    # serving comparison: online-trained export vs an offline 1-step
    # baseline export (training amount ~0 — the untrained anchor)
    base_run = _train_draft(
        workdir, "convon-base", algorithm="eagle3", target_dir=target_dir,
        train_dir=eval_dir, eval_dir=None, draft_config=draft_config,
        total_steps=1, num_epochs=1, eval_interval=0,
    )
    base_export = _export(workdir, base_run, "convon-base", draft_config,
                          "sglang")
    export_dir = _export(workdir, out_dir, "convon", draft_config, "sglang")
    prompts = [list(map(int, s[:24])) for s in corpus_eval[:4]]
    accept_untrained = _measure_accept(target_dir, base_export, prompts,
                                       capture_layers)
    accept_trained = _measure_accept(target_dir, export_dir, prompts,
                                     capture_layers)
    return {
        "climb_metric": "eval/simulated_acc_len",
        "series": [(int(s), round(float(v), 4)) for s, v in series],
        "first": round(float(series[0][1]), 4),
        "last": round(float(series[-1][1]), 4),
        "accept_untrained": round(float(accept_untrained), 4),
        "accept_trained": round(float(accept_trained), 4),
        "topology": "online-disaggregated (C++ store + capture server + "
                    "producer + consumer)",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--algorithm", default="eagle3",
                        choices=["eagle3", "domino", "dspark", "dflash",
                                 "peagle"])
    parser.add_argument("--online", action="store_true",
                        help="drive the corpus through the REAL online "
                             "disaggregated stack (eagle3 only)")
    parser.add_argument("--smoke", action="store_true",
                        help="scaled-down always-on CI variant (eagle3 "
                             "only): climb-metric assertion in ~2 min, no "
                             "export/serving leg")
    parser.add_argument("--target-steps", type=int, default=400)
    parser.add_argument("--train-sequences", type=int, default=512)
    parser.add_argument("--eval-sequences", type=int, default=32)
    parser.add_argument("--min-climb", type=float, default=2.0,
                        help="required climb-metric last/first ratio")
    parser.add_argument("--min-accept-gain", type=float, default=0.2,
                        help="required accept_trained - accept_untrained")
    args = parser.parse_args()

    if args.smoke:
        if args.algorithm != "eagle3" or args.online:
            raise SystemExit("--smoke supports offline eagle3 only")
        args.target_steps = min(args.target_steps, 200)
        args.train_sequences = min(args.train_sequences, 192)
        args.eval_sequences = min(args.eval_sequences, 16)

    os.makedirs(args.workdir, exist_ok=True)
    corpus_train = build_corpus(0, args.train_sequences)
    corpus_eval = build_corpus(1, args.eval_sequences)

    target_dir = os.path.join(args.workdir, "target")
    if os.path.exists(os.path.join(target_dir, "config.json")):
        print("reusing trained target", file=sys.stderr)
        target_first = target_last = None
    else:
        print("training target...", file=sys.stderr)
        target_first, target_last = train_target(
            target_dir, corpus_train, steps=args.target_steps
        )
        print(
            f"target loss {target_first:.3f} -> {target_last:.3f} "
            f"(corpus entropy ~0.88)", file=sys.stderr,
        )

    if args.online:
        if args.algorithm != "eagle3":
            raise SystemExit("--online supports eagle3 only")
        result = run_eagle3_online(args.workdir, corpus_eval, target_dir)
    elif args.algorithm == "eagle3":
        result = run_eagle3(args.workdir, corpus_train, corpus_eval,
                            target_dir, smoke=args.smoke)
    elif args.algorithm == "peagle":
        result = run_peagle(args.workdir, corpus_train, corpus_eval,
                            target_dir)
    else:
        result = run_domino(args.workdir, corpus_train, corpus_eval,
                            target_dir, projector=args.algorithm)

    climbed = (
        result["last"] >= args.min_climb * result["first"]
        and result["last"] > result["first"]
    )
    accept_ok = True
    if "accept_trained" in result:
        accept_ok = (
            result["accept_trained"]
            >= result["accept_untrained"] + args.min_accept_gain
        )
    status = "pass" if (climbed and accept_ok) else "fail"
    verdict = {
        "gate": "convergence",
        "algorithm": args.algorithm,
        "online": bool(args.online),
        "smoke": bool(args.smoke),
        "status": status,
        "climbed": climbed,
        "accept_ok": accept_ok,
        "target_loss": (
            [round(target_first, 3), round(target_last, 3)]
            if target_first is not None else None
        ),
        **result,
    }
    print(json.dumps(verdict))
    if status != "pass":
        raise SystemExit(1)


if __name__ == "__main__":
    main()

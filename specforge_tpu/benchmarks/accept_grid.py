"""Accept-length grid: datasets × spec configs, one JSON report.

The TPU-native equivalent of the reference's serving benchmark grid
(benchmarks/README.md:11-67: accept-length + throughput over 13 datasets at
a (batch, steps, topk, draft_tokens) grid against a live SGLang server) —
here each cell drives the in-repo speculative-decoding harness with an
exported draft.

Usage:
    python -m specforge_tpu.benchmarks.accept_grid \
        --target <hf_dir> --export <export_dir> \
        --dataset gsm8k=prompts/gsm8k.jsonl --dataset mt-bench=... \
        --draft-tokens 2,4,8 --max-new-tokens 64 --out report.json

Each prompts file is JSONL with {"input_ids": [...]} (already tokenized —
produce with scripts/prepare_data.py + a tokenizer pass), OR a NAMED
dataset's raw records (gsm8k/aime/math500/mmlu/gpqa/ceval/humaneval/mbpp/
simpleqa/mt-bench — see benchmarks/datasets.py): named datasets run in text
space through the per-dataset benchmarker and report task ACCURACY alongside
accept length, throughput, and the speedup vs plain decode.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List


def run_grid(target: str, export_dir: str, datasets: Dict[str, str],
             draft_tokens: List[int], max_new_tokens: int,
             max_prompts: int, topks: List[int] = (1,),
             fused: bool = True, baseline: bool = True,
             family: str = "eagle3", max_len: int = 2048,
             tokenizer_path: str = None,
             batch_sizes: List[int] = (1,),
             tree_style: str = "root", adaptive: bool = False,
             stream: bool = False) -> Dict:
    from specforge_tpu.benchmarks.accept_length import (
        build_decoder,
        load_spec_models,
        measure_plain_decode,
        measure_with_decoder,
    )

    if family == "dflash":
        # DFlash-family exports (dflash/domino/dspark) serve through block
        # speculation: the block size is the draft's contract — one decoder,
        # no (draft_tokens, topk) sweep
        from specforge_tpu.benchmarks.accept_length import (
            load_exported_dflash_draft,
        )
        from specforge_tpu.inference.spec_decode import DFlashSpecDecoder
        from specforge_tpu.models.target.transformer import (
            TargetConfig,
            load_target_params,
        )

        target_config = TargetConfig.from_file(target)
        target_params = load_target_params(target, target_config)
        module, variables = load_exported_dflash_draft(export_dir)
        decoder = DFlashSpecDecoder(
            target_params, target_config, module, variables,
            max_len=max_len,
        )
        decoders = {module.config.block_size - 1: decoder}
        draft_tokens = list(decoders)
        topks = [1]
    else:
        # load the checkpoints ONCE; one decoder per draft-token budget;
        # every (dataset, topk) cell reuses them (topk is a generate-time
        # argument)
        models = load_spec_models(target, export_dir)
        target_params, target_config = models[0], models[1]
        decoders = {
            k: build_decoder(models, num_draft_tokens=k, max_len=max_len)
            for k in draft_tokens
        }

    tokenizer = None

    def _tokenizer():
        nonlocal tokenizer
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                tokenizer_path or target
            )
        return tokenizer

    cells = []
    for name, path in datasets.items():
        rows = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
                if len(rows) >= max_prompts:
                    break
        if not rows:
            print(f"dataset {name}: no prompts, skipping", file=sys.stderr)
            continue

        if "input_ids" not in rows[0]:
            # NAMED dataset with raw records: run in text space through the
            # benchmarker (formatting + extraction + accuracy — reference
            # benchmarks/benchmarker/base.py:16-50)
            from specforge_tpu.benchmarks.datasets import (
                get_benchmarker,
                run_text_benchmark,
            )

            bench = get_benchmarker(name)
            if bench is None:
                raise ValueError(
                    f"dataset file {path} has no 'input_ids' and {name!r} "
                    "is not a registered benchmarker (see "
                    "benchmarks/datasets.py)"
                )
            tok = _tokenizer()
            records = bench.load(path, max_records=max_prompts)
            prompt_ids = [tok.encode(bench.format(r)) for r in records]
            plain = None
            if baseline:
                plain = measure_plain_decode(
                    target_params, target_config, prompt_ids,
                    max_new_tokens=max_new_tokens, max_len=max_len,
                )
                print(json.dumps({"dataset": name, "plain_decode": plain}),
                      file=sys.stderr)
            for k in draft_tokens:
                for topk in topks:
                    cell = run_text_benchmark(
                        bench, records, decoders[k], tok, topk=topk,
                        max_new_tokens=max_new_tokens, fused=fused,
                    )
                    cell["num_draft_tokens"] = k
                    if plain and plain["output_throughput"] > 0:
                        cell["plain_throughput"] = plain["output_throughput"]
                        cell["speedup"] = round(
                            cell["output_throughput"]
                            / plain["output_throughput"], 3,
                        )
                    print(json.dumps(cell), file=sys.stderr)
                    cells.append(cell)
            continue

        prompts = [row["input_ids"] for row in rows]
        # the no-speculation baseline: plain greedy tokens/s on the SAME
        # prompts — every cell's speedup is spec/plain throughput (the
        # reference's headline metric, README.md:61). bs>1 cells get a
        # BATCHED plain baseline at the same bs (a bs1 denominator would
        # conflate batching with speculation).
        plain = None
        plain_batched = {}
        if baseline:
            plain = measure_plain_decode(
                target_params, target_config, prompts,
                max_new_tokens=max_new_tokens, max_len=max_len,
            )
            print(json.dumps({"dataset": name, "plain_decode": plain}),
                  file=sys.stderr)
            from specforge_tpu.benchmarks.accept_length import (
                measure_plain_decode_batched,
            )

            for bs in batch_sizes:
                if bs > 1:
                    plain_batched[bs] = measure_plain_decode_batched(
                        target_params, target_config, prompts, batch=bs,
                        max_new_tokens=max_new_tokens, max_len=max_len,
                    )
                    print(json.dumps({
                        "dataset": name,
                        "plain_decode_batched": plain_batched[bs],
                    }), file=sys.stderr)
        for k in draft_tokens:
            for bs in batch_sizes:
                for topk in topks:
                    if bs > 1 and topk != 1 and family == "dflash":
                        continue  # block mode has no tree variant
                    if bs > 1:
                        from specforge_tpu.benchmarks.accept_length import (
                            measure_batched,
                        )

                        # dflash-family batched blocks take no mode kwargs
                        mode_kw = {} if family == "dflash" else dict(
                            topk=topk, tree_style=tree_style,
                            adaptive=adaptive, stream=stream,
                        )
                        report = measure_batched(
                            decoders[k], prompts, batch=bs,
                            max_new_tokens=max_new_tokens, **mode_kw,
                        )
                    else:
                        report = measure_with_decoder(
                            decoders[k], prompts, topk=topk,
                            max_new_tokens=max_new_tokens, fused=fused,
                            tree_style=tree_style,
                        )
                    cell = {
                        "dataset": name,
                        "num_draft_tokens": k,
                        "topk": topk,
                        "tree_style": tree_style if topk > 1 else (
                            "adaptive" if adaptive and bs > 1 else "chain"
                        ),
                        "batch": bs,
                        **({"stream": True} if stream and bs > 1 else {}),
                        "prompts": len(report.per_prompt),
                        "mean_accept_length": round(
                            report.mean_accept_length, 4
                        ),
                        # wall-clock serving throughput, as in the reference
                        # grid (benchmarks/benchmarker/utils.py:55,116)
                        "output_tokens": report.output_tokens,
                        "output_throughput": round(
                            report.output_throughput, 2
                        ),
                    }
                    base = plain_batched.get(bs) if bs > 1 else plain
                    if base and base["output_throughput"] > 0:
                        cell["plain_throughput"] = (
                            base["output_throughput"]
                        )
                        cell["speedup"] = round(
                            report.output_throughput
                            / base["output_throughput"], 3,
                        )
                    print(json.dumps(cell), file=sys.stderr)
                    cells.append(cell)
    return {"grid": cells, "target": target, "export": export_dir}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", required=True)
    parser.add_argument("--export", required=True)
    parser.add_argument(
        "--dataset", action="append", required=True,
        metavar="NAME=PROMPTS_JSONL",
    )
    parser.add_argument("--draft-tokens", default="2,4,8")
    parser.add_argument("--topk", default="1",
                        help="comma list of tree widths (1 = chain)")
    parser.add_argument("--max-new-tokens", type=int, default=64)
    parser.add_argument("--max-prompts", type=int, default=32)
    parser.add_argument("--out", default="accept_grid.json")
    parser.add_argument("--host-loop", action="store_true",
                        help="time the host-dispatched loop instead of the "
                             "fused single-dispatch program (debugging)")
    parser.add_argument("--no-baseline", action="store_true",
                        help="skip the plain-decode baseline/speedup")
    parser.add_argument("--family", default="eagle3",
                        choices=["eagle3", "dflash"],
                        help="export family: eagle3 (chain/tree) or dflash "
                             "(block speculation: dflash/domino/dspark)")
    parser.add_argument("--max-len", type=int, default=2048)
    parser.add_argument("--tokenizer", default=None,
                        help="tokenizer dir for NAMED (raw-record) "
                             "datasets; default: the target dir")
    parser.add_argument("--tree-style", default="root",
                        choices=["root", "beam"],
                        help="tree layout for topk>1 cells (beam = "
                             "every-depth branching, fused only)")
    parser.add_argument("--adaptive", action="store_true",
                        help="batched cells use the adaptive chain "
                             "(EMA-driven draft depth + plain fallback)")
    parser.add_argument("--stream", action="store_true",
                        help="batched cells use continuous batching "
                             "(generate_stream_fused) at the batch width")
    parser.add_argument("--batch", default="1",
                        help="comma list of serving batch sizes (bs>1 runs "
                             "the single-program batched chain loop)")
    args = parser.parse_args()

    datasets = dict(spec.split("=", 1) for spec in args.dataset)
    draft_tokens = [int(x) for x in args.draft_tokens.split(",")]
    report = run_grid(
        args.target, args.export, datasets, draft_tokens,
        args.max_new_tokens, args.max_prompts,
        topks=[int(x) for x in args.topk.split(",")],
        fused=not args.host_loop, baseline=not args.no_baseline,
        family=args.family, max_len=args.max_len,
        tokenizer_path=args.tokenizer,
        batch_sizes=[int(x) for x in args.batch.split(",")],
        tree_style=args.tree_style, adaptive=args.adaptive,
        stream=args.stream,
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"cells": len(report["grid"]), "out": args.out}))


if __name__ == "__main__":
    main()

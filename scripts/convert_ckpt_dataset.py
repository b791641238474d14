#!/usr/bin/env python
"""Convert a reference SpecForge offline dataset (torch .ckpt[.gz] files) to
the native .sft format (safetensors; mmap-able, header-inspectable).

The training loader reads .ckpt directly too — conversion just removes the
torch dependency from the hot path and enables cheap spec reads.

Usage: python scripts/convert_ckpt_dataset.py SRC_DIR DST_DIR [--workers 8]
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

from specforge_tpu.runtime.data_plane.feature_file import (  # noqa: E402
    convert_ckpt_to_safetensors,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    jobs = []
    for dirpath, _dirs, files in os.walk(args.src):
        for name in files:
            if name.endswith((".ckpt", ".ckpt.gz")):
                src = os.path.join(dirpath, name)
                base = name[:-len(".ckpt.gz")] if name.endswith(".gz") \
                    else name[:-len(".ckpt")]
                jobs.append((src, os.path.join(args.dst, f"{base}.sft")))

    def convert(pair):
        src, dst = pair
        convert_ckpt_to_safetensors(
            src, dst, {"target_repr": "hidden_state"}
        )

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        list(pool.map(convert, jobs))
    print(f"converted {len(jobs)} files into {args.dst}")


if __name__ == "__main__":
    main()

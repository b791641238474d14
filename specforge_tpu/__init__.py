"""specforge_tpu — a TPU-native framework for training speculative-decoding draft models.

Re-implements the capabilities of sgl-project/SpecForge (EAGLE3 / P-EAGLE / DFlash /
Domino / DSpark draft training against a frozen target LLM) with a JAX/XLA/Pallas
compute path designed for TPU hardware: SPMD over `jax.sharding.Mesh`, functional
transforms, static-shape compiled train steps, and Pallas kernels for the hot ops.

Layering (bottom-up), mirroring the reference layer map (see SURVEY.md §1):

- ``runtime.contracts``   — dependency-light metadata dataclasses (no arrays).
- ``parallel``            — mesh construction + sharding rules (dp, fsdp, sp axes).
- ``ops``                 — numerical kernels: teacher projection, fused CE loss,
                            LK loss, RoPE, TTT attention (XLA reference + Pallas).
- ``models``              — draft models (flax) + frozen target head.
- ``algorithms``          — per-algorithm specs/providers registry.
- ``runtime.data_plane``  — feature stores, loaders, ref channels.
- ``runtime.control_plane``— metadata-only flow controllers / ledgers.
- ``training``            — strategies, jitted train step, trainer, checkpoints.
- ``data``                — chat templates, parsers, dataset preparation.
- ``export`` / ``eval``   — checkpoint export (HF / SGLang layout), evaluator.
"""

__version__ = "0.1.0"

"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The environment may pre-register an accelerator PJRT plugin and pin
``jax_platforms`` via config (overriding the env var), so we both set the env
vars *and* update the jax config before any backend is initialized. Tests that
need real TPU hardware must be explicitly opted in via SPECFORGE_TPU_TESTS=1.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("SPECFORGE_TPU_TESTS"):
    import jax

    jax.config.update("jax_platforms", "cpu")

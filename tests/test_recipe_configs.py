"""Every recipe config under configs/ must build a draft model through the
production registry path (reference ships per-target draft configs under
configs/ — ref scripts consume them via AutoDraftModel.from_config)."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.algorithms.builtin import builtin_algorithm_registry

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ARCH_TO_ALGO = {
    "LlamaEagle3Draft": "eagle3",
    "DFlashDraftModel": "dflash",
    "DominoDraftModel": "domino",
    "DSparkDraftModel": "dspark",
    "PEagleDraftModel": "peagle",
}


def _config_paths():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
    assert len(paths) >= 25, f"recipe configs missing ({len(paths)})"
    return paths


@pytest.mark.parametrize(
    "path", _config_paths(), ids=lambda p: os.path.basename(p)
)
def test_recipe_config_builds_draft(path):
    raw = json.load(open(path))
    algo = ARCH_TO_ALGO[raw["architectures"][0]]
    registration = builtin_algorithm_registry().resolve(algo)
    draft, cfg = registration.providers.build_draft(raw, dtype=jnp.bfloat16)
    assert cfg.hidden_size == raw["hidden_size"]
    # capture layers resolve for the target depth the recipe names
    n_target = raw.get("num_target_layers") or 36
    layers = registration.providers.resolve_capture_layers(
        cfg, n_target, None
    )
    assert len(layers) >= 1
    assert all(-1 <= l < n_target for l in layers)


@pytest.mark.parametrize(
    "path",
    [p for p in _config_paths() if "eagle3" in os.path.basename(p)][:3],
    ids=lambda p: os.path.basename(p),
)
def test_eagle3_recipe_init_smoke(path):
    """A few eagle3 recipes init + forward at tiny sequence length (full
    param init for 70B-class drafts is too slow for CI — shape-check the
    smallest ones)."""
    raw = json.load(open(path))
    if raw["hidden_size"] > 3000:
        pytest.skip("large draft: covered by build-only test")
    registration = builtin_algorithm_registry().resolve("eagle3")
    draft, cfg = registration.providers.build_draft(raw, dtype=jnp.float32)
    model = registration.providers.build_training_model(
        draft, {"length": 2}
    )
    rng = np.random.default_rng(0)
    b, s = 1, 8
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.integers(0, 64, size=(b, s))),
        jnp.ones((b, s), jnp.int32),
        jnp.ones((b, s, 1), jnp.int32),
        jnp.asarray(rng.normal(size=(b, s, 3 * cfg.hidden_size)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, s, cfg.vocab_size)), jnp.float32),
    )
    assert "params" in variables


EXAMPLE_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize(
    "path",
    sorted(glob.glob(os.path.join(EXAMPLE_DIR, "*.json"))),
    ids=lambda p: os.path.basename(p),
)
def test_example_run_config_validates(path):
    """Every example run config under examples/ passes the strict schema
    and points its draft_config_path at an existing recipe config."""
    from specforge_tpu.config.schema import Config

    raw = json.load(open(path))
    cfg = Config.model_validate(raw)
    dcp = cfg.model.draft_config_path
    if dcp:
        repo_root = os.path.join(os.path.dirname(__file__), "..")
        assert os.path.exists(os.path.join(repo_root, dcp)), dcp

"""Shared tiny-model fixtures, mirroring the reference test strategy
(tests/test_runtime/_fixtures.py there): a 32-hidden/64-vocab/24-draft-vocab
EAGLE3 draft + random target head + random offline feature files, all flowing
through the production manifest-reader/loader paths."""

import os

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
from specforge_tpu.models.draft.llama_eagle3 import Eagle3Config, LlamaEagle3Draft
from specforge_tpu.runtime.data_plane.feature_dataloader import FeatureDataLoader
from specforge_tpu.runtime.data_plane.feature_file import save_feature_file
from specforge_tpu.runtime.data_plane.feature_store import FileFeatureStore
from specforge_tpu.runtime.data_plane.offline_reader import OfflineManifestReader
from specforge_tpu.training.strategies import Eagle3TrainStrategy

V, VD, H, MAXLEN, LENGTH = 64, 24, 32, 16, 3

TINY_CFG = Eagle3Config(
    vocab_size=V, draft_vocab_size=VD, hidden_size=H, intermediate_size=64,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)


def make_vocab_maps(seed=0):
    rng = np.random.default_rng(seed)
    keep = np.sort(rng.choice(V, size=VD, replace=False))
    t2d = np.zeros(V, bool)
    t2d[keep] = True
    d2t = (keep - np.arange(VD)).astype(np.int32)
    return t2d, d2t


def write_offline_dataset(root, n=8, seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        seq = int(rng.integers(8, MAXLEN + 1))
        tensors = {
            "input_ids": rng.integers(0, V, size=(seq,)).astype(np.int64),
            "loss_mask": (rng.random(seq) > 0.25).astype(np.int64),
            "hidden_state": rng.normal(size=(seq, 3 * H)).astype(
                ml_dtypes.bfloat16
            ),
            "target": rng.normal(size=(seq, H)).astype(ml_dtypes.bfloat16),
        }
        save_feature_file(
            os.path.join(root, f"sample-{i:04d}.sft"),
            tensors,
            {"target_repr": "hidden_state"},
        )


def build_offline_loader(root, batch_size=2, num_workers=0):
    refs = OfflineManifestReader(root).read()
    collate = PaddingCollator(
        CollatorConfig(max_length=MAXLEN, cast_float_dtype="float32")
    )
    return FeatureDataLoader(
        FileFeatureStore(), collate, refs=refs, batch_size=batch_size,
        num_workers=num_workers, metadata={"target_repr": "hidden_state"},
    )


def build_model_and_strategy(seed=0, length=LENGTH, dtype=jnp.float32):
    t2d, d2t = make_vocab_maps(seed)
    draft = LlamaEagle3Draft(TINY_CFG, dtype=dtype)
    model = OnlineEagle3Model(draft_model=draft, length=length)
    strategy = Eagle3TrainStrategy(model)

    dummy_ids = jnp.zeros((1, MAXLEN), jnp.int32)
    dummy_mask = jnp.ones((1, MAXLEN), jnp.int32)
    dummy_lm = jnp.ones((1, MAXLEN, 1), jnp.int32)
    dummy_hidden = jnp.zeros((1, MAXLEN, 3 * H), jnp.float32)
    dummy_target = jnp.zeros((1, MAXLEN, V), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(seed), dummy_ids, dummy_mask, dummy_lm,
        dummy_hidden, dummy_target,
    )
    variables = {
        "params": variables["params"],
        "buffers": {
            "draft_model": {"t2d": jnp.asarray(t2d), "d2t": jnp.asarray(d2t)}
        },
    }
    rng = np.random.default_rng(seed + 1)
    head_w = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    frozen = {"target_head_weight": head_w}
    return model, strategy, variables, frozen

"""VLM/mrope data path: 3D position ids (get_rope_index semantics), the
collator's [3, S] padding, and an end-to-end mrope training forward."""

import numpy as np
import pytest

import jax.numpy as jnp

from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
from specforge_tpu.data.vlm import (
    VisionSpan,
    mrope_position_ids,
    spans_from_token_ids,
)


def test_text_only_degenerates_to_arange():
    pos = mrope_position_ids(10)
    assert pos.shape == (3, 10)
    np.testing.assert_array_equal(pos, np.tile(np.arange(10), (3, 1)))


def test_vision_span_grid_layout():
    # 3 text tokens, then a 1x2x2 image (4 tokens), then 2 text tokens
    pos = mrope_position_ids(9, [VisionSpan(start=3, t=1, h=2, w=2)])
    np.testing.assert_array_equal(pos[:, :3], np.tile(np.arange(3), (3, 1)))
    # image: temporal stays at 3; height 3,3,4,4; width 3,4,3,4
    np.testing.assert_array_equal(pos[0, 3:7], [3, 3, 3, 3])
    np.testing.assert_array_equal(pos[1, 3:7], [3, 3, 4, 4])
    np.testing.assert_array_equal(pos[2, 3:7], [3, 4, 3, 4])
    # text resumes at 3 + max(1,2,2) = 5 on all axes
    np.testing.assert_array_equal(pos[:, 7:], np.tile([5, 6], (3, 1)))


def test_spans_from_token_ids():
    ids = [5, 7, 9, 9, 9, 9, 2, 9, 9, 1]
    spans = spans_from_token_ids(ids, image_token_id=9,
                                 grids=[(1, 2, 2), (1, 1, 2)])
    assert spans == [VisionSpan(2, 1, 2, 2), VisionSpan(7, 1, 1, 2)]
    with pytest.raises(ValueError, match="grid"):
        spans_from_token_ids(ids, 9, grids=[(1, 1, 1), (1, 1, 2)])


def test_collator_pads_3d_position_ids():
    collate = PaddingCollator(CollatorConfig(max_length=12))
    sample = {
        "input_ids": np.arange(8, dtype=np.int64),
        "loss_mask": np.ones(8, np.int64),
        "position_ids": mrope_position_ids(
            8, [VisionSpan(start=2, t=1, h=2, w=2)]
        ),
    }
    batch = collate([sample, sample], sample_ids=["a", "b"])
    pos = batch.tensors["position_ids"]
    assert pos.shape == (2, 3, 12)          # batch-first [B, 3, S]
    assert pos[0, 0, 8:].sum() == 0         # padded tail
    np.testing.assert_array_equal(pos[0, :, :8], sample["position_ids"])


def test_mrope_training_forward():
    """OnlineEagle3Model with an mrope draft consumes [B, 3, S] position ids
    (vision sample) and produces finite losses; text-only 3D ids match the
    implicit-arange path exactly."""
    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )
    import jax

    S = 16
    cfg = Eagle3Config(
        vocab_size=64, draft_vocab_size=24, hidden_size=32,
        intermediate_size=64, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={"rope_type": "mrope", "mrope_section": [2, 1, 1]},
    )
    model = OnlineEagle3Model(
        draft_model=LlamaEagle3Draft(cfg, dtype=jnp.float32), length=2
    )
    rng = np.random.default_rng(0)
    args = dict(
        input_ids=jnp.asarray(rng.integers(0, 64, size=(1, S))),
        attention_mask=jnp.ones((1, S), jnp.int32),
        loss_mask=jnp.asarray((rng.random((1, S, 1)) > 0.2).astype(np.int32)),
        hidden_states=jnp.asarray(
            rng.normal(size=(1, S, 96)).astype(np.float32)
        ),
        target=jnp.asarray(rng.normal(size=(1, S, 64)).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), *args.values())

    def run(position_ids):
        out = model.apply(variables, *args.values(),
                          position_ids=position_ids)
        return float(out[0][0])  # first ploss

    # text-only [B, 3, S] equals the implicit arange path
    text3d = jnp.asarray(
        np.tile(np.arange(S, dtype=np.int32), (1, 3, 1))
    )
    assert run(text3d) == pytest.approx(run(None), rel=1e-6)

    # a vision sample produces a different, finite loss
    vision = jnp.asarray(mrope_position_ids(
        S, [VisionSpan(start=4, t=1, h=2, w=2)]
    ))[None]
    loss = run(vision)
    assert np.isfinite(loss) and loss != pytest.approx(run(None), rel=1e-6)

import numpy as np
import pytest

from specforge_tpu.runtime.contracts import (
    ContractViolation,
    FeatureHandle,
    FeatureSpec,
    PromptTask,
    SampleRef,
    TrainBatch,
    assert_no_tensors,
)


def _ref(sample_id="s0"):
    spec = FeatureSpec(name="hidden_state", shape=(8, 48), dtype="bfloat16")
    return SampleRef(
        sample_id=sample_id,
        prompt_id="p0",
        epoch=1,
        features={"hidden_state": FeatureHandle(uri="local://s0/h.g0", spec=spec)},
        metadata={"target_repr": "hidden_state"},
    )


def test_feature_spec_nbytes():
    spec = FeatureSpec(name="x", shape=(8, 48), dtype="bfloat16")
    assert spec.nbytes == 8 * 48 * 2
    assert FeatureSpec(name="ids", shape=(16,), dtype="int32").nbytes == 64


def test_feature_spec_rejects_unknown_dtype():
    with pytest.raises(ValueError):
        FeatureSpec(name="x", shape=(2,), dtype="complex64")


def test_sample_ref_json_roundtrip():
    ref = _ref()
    again = SampleRef.from_json(ref.to_json())
    assert again == ref
    assert again.nbytes == ref.nbytes


def test_prompt_task_json_roundtrip():
    task = PromptTask(prompt_id="p1", payload={"text": "hi"}, epoch=2, attempt=1)
    assert PromptTask.from_json(task.to_json()) == task


def test_no_tensors_rejects_arrays_in_metadata():
    with pytest.raises(ContractViolation):
        SampleRef(
            sample_id="bad",
            features={},
            metadata={"oops": np.zeros((2, 2))},
        )
    with pytest.raises(ContractViolation):
        PromptTask(prompt_id="bad", payload={"x": [1, np.ones(3)]})
    with pytest.raises(ContractViolation):
        TrainBatch(tensors={}, metadata={"deep": {"er": (np.ones(1),)}})


def test_no_tensors_accepts_plain_json():
    assert_no_tensors({"a": [1, 2.5, "x", None, {"b": True}]})


def test_train_batch_allows_tensors_in_tensors():
    batch = TrainBatch(tensors={"input_ids": np.zeros((2, 4), np.int32)},
                       sample_ids=["s0"], metadata={"target_repr": "logits"})
    assert batch.tensors["input_ids"].shape == (2, 4)


def test_server_capture_layouts_match_offline_schemas():
    """Per-registration server-capture layouts (reference
    ServerCaptureLayout) agree with each algorithm's offline feature names —
    what the server writes is exactly what the loader reads."""
    from specforge_tpu.algorithms.builtin import builtin_algorithm_registry

    registry = builtin_algorithm_registry()
    for reg in registry:
        layout = reg.providers.server_capture
        assert layout is not None, reg.name
        schema = reg.spec.offline_schema
        assert layout.aux_feature == schema.aux_feature, reg.name
        if schema.last_hidden_feature is not None:
            assert layout.last_hidden_feature == schema.last_hidden_feature, (
                reg.name
            )
        # the server may capture more than an algorithm's minimal offline
        # schema (dflash servers also write last-hidden for dspark)
        assert frozenset(schema.feature_names) <= layout.feature_names, (
            reg.name
        )

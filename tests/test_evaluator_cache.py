"""Evaluator jit-cache + accept-report throughput units.

W4 (round-2 verdict): the evaluator must compile once per DISTINCT batch
metadata, not once per metadata drift — a mixed-metadata eval set that
alternates between two metadata values must trace exactly twice.
"""

import jax.numpy as jnp
import numpy as np

from specforge_tpu.benchmarks.accept_length import AcceptLengthReport
from specforge_tpu.eval.evaluator import Evaluator
from specforge_tpu.runtime.contracts import TrainBatch


class _CountingStrategy:
    def __init__(self):
        self.traces = []

    def eval_outputs(self, variables, tensors, frozen, metadata):
        # executed only while tracing — one append per compile
        self.traces.append(dict(metadata))
        x = tensors["x"]
        zeros = jnp.zeros((3,), jnp.float32)
        return {
            "corrects": zeros + jnp.sum(x),
            "denoms": zeros + 1.0,
            "acc_nums": zeros + 0.5,
            "acc_dens": zeros + 1.0,
            "loss_sums": zeros,
            "loss_dens": zeros + 1.0,
        }


def _batch(i, meta):
    return TrainBatch(
        tensors={"x": jnp.asarray(np.full((2, 2), float(i), np.float32))},
        sample_ids=[f"s{i}"],
        metadata=meta,
    )


def test_mixed_metadata_compiles_once_per_distinct_metadata():
    strategy = _CountingStrategy()
    ev = Evaluator(strategy, metadata={"base": 1})
    batches = [
        _batch(0, {"target_repr": "hidden_state"}),
        _batch(1, {"target_repr": "logits"}),
        _batch(2, {"target_repr": "hidden_state"}),
        _batch(3, {"target_repr": "logits"}),
        _batch(4, {"target_repr": "hidden_state"}),
    ]
    metrics = ev.run({"params": {}}, batches, {})
    assert len(strategy.traces) == 2, strategy.traces
    assert {t["target_repr"] for t in strategy.traces} == {
        "hidden_state", "logits",
    }
    # base metadata still participates in every trace
    assert all(t["base"] == 1 for t in strategy.traces)
    assert "eval/simulated_acc_len" in metrics
    # second run: fully cached, no new traces
    ev.run({"params": {}}, batches, {})
    assert len(strategy.traces) == 2


def test_accept_report_throughput_units():
    report = AcceptLengthReport(
        per_prompt=[2.0, 3.0],
        accept_lengths=[2, 2, 3, 3],
        num_draft_tokens=4,
        wall_seconds=2.0,
    )
    assert report.output_tokens == 10
    assert report.output_throughput == 5.0
    js = report.to_json()
    assert js["output_tokens"] == 10
    assert js["output_throughput"] == 5.0
    assert js["wall_seconds"] == 2.0
    # degenerate: no wall-clock recorded -> 0, not a division error
    empty = AcceptLengthReport(
        per_prompt=[], accept_lengths=[], num_draft_tokens=4
    )
    assert empty.output_throughput == 0.0

"""Batch-size-invariant evaluator.

Per-position correct/denominator and acceptance numerator/denominator are
summed over the whole eval set (and, under jit sharding, over ranks) *before*
any division; the headline metric is

    eval/simulated_acc_len = Σ_i Π_{j ≤ i} a_j

with a_j the set-wide per-TTT-position acceptance rates — the expected accepted
draft length under speculative decoding. Reference: eval/evaluator.py:27-222.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from specforge_tpu.runtime.contracts import TrainBatch


class Evaluator:
    def __init__(
        self,
        strategy,
        metadata: Optional[Dict[str, Any]] = None,
        device_put_fn=None,
    ):
        """``device_put_fn``: optional host-batch → device-array assembly.
        Under multi-host it builds global arrays from each host's local eval
        shard; per-host batch counts are equal by the ref-sharding contract
        (parallel/multihost.py), so the collective schedule is globally
        agreed and empty-shard deadlock cannot occur (ref
        eval/evaluator.py:27-222)."""
        self.strategy = strategy
        self.metadata = dict(metadata or {})
        self.device_put_fn = device_put_fn
        # jit cache keyed by the (static) per-batch metadata: a mixed-metadata
        # eval set compiles once per distinct metadata, not once per drift
        # (ref eval/evaluator.py:27-222 re-traces implicitly via torch).
        self._jit_cache: Dict[Any, Any] = {}

    def _jitted_for(self, metadata: Dict[str, Any]):
        key = tuple(sorted((k, repr(v)) for k, v in metadata.items()))
        fn = self._jit_cache.get(key)
        if fn is None:
            meta = dict(metadata)
            fn = jax.jit(
                lambda variables, tensors, frozen: self.strategy.eval_outputs(
                    variables, tensors, frozen, meta
                )
            )
            self._jit_cache[key] = fn
        return fn

    def run(
        self,
        variables: Dict[str, Any],
        batches: Iterable[TrainBatch],
        frozen: Dict[str, Any],
    ) -> Dict[str, float]:
        sums: Dict[str, np.ndarray] = {}
        n_batches = 0
        for batch in batches:
            metadata = {**self.metadata, **batch.metadata}
            tensors = (
                self.device_put_fn(batch.tensors)
                if self.device_put_fn is not None
                else batch.tensors
            )
            out = self._jitted_for(metadata)(variables, tensors, frozen)
            out = jax.device_get(out)
            for key, value in out.items():
                acc = sums.get(key)
                sums[key] = (
                    np.asarray(value, np.float64)
                    if acc is None
                    else acc + np.asarray(value, np.float64)
                )
            n_batches += 1
        if n_batches == 0:
            return {}

        metrics: Dict[str, float] = {}
        accs = sums["corrects"] / np.maximum(sums["denoms"], 1e-6)
        rates = sums["acc_nums"] / np.maximum(sums["acc_dens"], 1e-8)
        plosses = sums["loss_sums"] / np.maximum(sums["loss_dens"], 1e-6)
        for i in range(len(accs)):
            metrics[f"eval/acc_{i}"] = float(accs[i])
            metrics[f"eval/acceptance_rate_{i}"] = float(rates[i])
            metrics[f"eval/ploss_{i}"] = float(plosses[i])
        metrics["eval/simulated_acc_len"] = float(
            np.sum(np.cumprod(rates))
        )
        return metrics

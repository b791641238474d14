"""Bounded profiler window over optimizer steps.

TPU translation of StepProfiler (training/profiling.py:22-120): a
``jax.profiler`` trace opened before the first micro-step of the configured
window and closed on every exit path; plus the always-on lightweight perf
counters the controller logs each window (data-wait / compute / ack seconds,
steps-per-hour, samples/s — controller.py:682-727).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@dataclass
class ProfilingConfig:
    enabled: bool = False
    start_step: int = 10
    num_steps: int = 5
    output_dir: str = "profiles"


class StepProfiler:
    def __init__(self, config: ProfilingConfig, run_id: str = "run"):
        self.config = config
        self.run_id = run_id
        self._active = False
        self._done = False

    def on_step_begin(self, step: int) -> None:
        if not self.config.enabled or self._done or self._active:
            return
        if step >= self.config.start_step:
            path = os.path.join(self.config.output_dir, self.run_id)
            os.makedirs(path, exist_ok=True)
            jax.profiler.start_trace(path)
            self._active = True
            self._window_end = step + self.config.num_steps

    def on_step_end(self, step: int) -> None:
        if self._active and step + 1 >= self._window_end:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def finalize(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class PerfCounters:
    """Accumulates wall-clock per phase between log windows."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.data_wait_s = 0.0
        self.compute_s = 0.0
        self.ack_s = 0.0
        self.steps = 0
        self.samples = 0
        self._window_start = time.monotonic()

    def window_metrics(self, global_batch_samples_per_step: int) -> Dict[str, float]:
        elapsed = max(time.monotonic() - self._window_start, 1e-9)
        steps = max(self.steps, 1)
        return {
            "perf/data_wait_s_per_step": self.data_wait_s / steps,
            "perf/compute_s_per_step": self.compute_s / steps,
            "perf/ack_s_per_step": self.ack_s / steps,
            "perf/steps_per_hour": self.steps / elapsed * 3600.0,
            "perf/global_samples_per_s": self.samples / elapsed,
        }

"""Tracing/profiling hooks (SURVEY.md §5: absent in the reference, first-class
here because samples/sec/chip is the north-star metric).

- StepTimer: per-epoch step-time and throughput accounting, logged with the
  standard metric names (train_samples_per_sec_per_chip, train_step_ms).
- trace(): context manager around jax.profiler for on-demand TPU traces
  (view with TensorBoard / xprof).
- nan_guard(): enable jax debug_nans as the single-process analogue of the
  reference's missing sanitizer layer.
"""

import contextlib
import os
import time
from typing import Optional


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.steps = 0
        self.samples = 0

    def add(self, dt: float, batch_size: int, steps: int = 1):
        self.total_time += dt
        self.steps += steps
        self.samples += batch_size

    @property
    def step_ms(self) -> float:
        return 1000.0 * self.total_time / self.steps if self.steps else 0.0

    @property
    def samples_per_sec(self) -> float:
        return self.samples / self.total_time if self.total_time > 0 else 0.0

    def metrics(self, prefix: str, n_chips: int = 1) -> dict:
        if self.steps == 0:
            return {}
        return {
            f"{prefix}_step_ms": round(self.step_ms, 2),
            f"{prefix}_samples_per_sec": round(self.samples_per_sec, 2),
            f"{prefix}_samples_per_sec_per_chip": round(
                self.samples_per_sec / max(n_chips, 1), 2
            ),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace; set WAV2VEC2FORBRAIN_TPU_TRACE_DIR or pass a dir."""
    import jax

    log_dir = log_dir or os.environ.get("WAV2VEC2FORBRAIN_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(enable: bool = True):
    import jax

    jax.config.update("jax_debug_nans", enable)

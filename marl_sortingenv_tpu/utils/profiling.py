"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; the
TPU build adds first-class ones).

* ``trace(log_dir)`` — context manager around ``jax.profiler`` for
  TensorBoard-viewable device traces.
* ``Throughput`` — steps/s counter with ``block_until_ready`` timing.
* ``annotate`` — named trace spans (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./log/profile"):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Wall-clock env-steps/s measurement with device sync."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n_steps: int, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        self._steps += n_steps

    def rate(self) -> float:
        if self._t0 is None or self._steps == 0:
            return 0.0
        return self._steps / (time.perf_counter() - self._t0)

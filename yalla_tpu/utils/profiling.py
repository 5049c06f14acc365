"""Step-rate logging and device tracing."""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Tracks integration throughput (cell-steps/s).

    >>> timer = StepTimer(n_cells=500_000)
    >>> for _ in range(100):
    ...     cells.take_step(dt, force); timer.tick()
    >>> print(timer.report())
    """

    def __init__(self, n_cells=None, every=0, verbose=False):
        self.n_cells = n_cells
        self.every = every
        self.verbose = verbose
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n_steps=1):
        self.steps += n_steps
        if self.verbose and self.every and self.steps % self.every == 0:
            print(self.report(), end="\r", flush=True)

    @property
    def elapsed(self):
        return time.perf_counter() - self.t0

    @property
    def steps_per_sec(self):
        return self.steps / max(self.elapsed, 1e-9)

    def report(self):
        msg = (f"{self.steps} steps, {self.elapsed:.1f}s "
               f"({self.steps_per_sec:.1f} steps/s")
        if self.n_cells:
            msg += f", {self.n_cells * self.steps_per_sec:.3g} cell-steps/s"
        return msg + ")"


@contextlib.contextmanager
def trace(log_dir="/tmp/yalla_tpu_trace"):
    """Capture a device profile viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

"""Profiling hooks.

The reference only wall-clocks fit steps (probnum25 notebook cell 8); here
we expose the JAX profiler for real device traces plus a lightweight step
timer usable around jitted calls.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking wall-clock timer for jitted steps.

    >>> timer = StepTimer()
    >>> with timer:                       # doctest: +SKIP
    ...     out = step(...)
    >>> timer.mean_ms                     # doctest: +SKIP
    """

    def __init__(self):
        self.times = []
        self._t0 = None
        self._out = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        jax.effects_barrier() if hasattr(jax, "effects_barrier") else None
        self.times.append(time.perf_counter() - self._t0)
        return False

    def record(self, out):
        """Time-to-ready of a device value."""
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self):
        return 1e3 * sum(self.times) / max(len(self.times), 1)

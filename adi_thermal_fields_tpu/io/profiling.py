"""Profiling hooks: jax.profiler traces and per-step timing.

The reference's only instrumentation is wall-clock prints
(quick_compare_neumann_robin_backend.py:172-186); here a trace context
captures a full XLA/TPU profile viewable in TensorBoard/Perfetto, and
``StepTimer`` measures steady-state step time with correct device
synchronization (scalar pull — block_until_ready alone can return early on
remote-tunnel platforms).
"""
from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measure steady-state per-step wall time of a jitted step function."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self._probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[::4097]))

    def sync(self, x) -> float:
        """Force completion of everything ``x`` depends on."""
        return float(self._probe(x))

    def time_steps(self, step_fn, x0, n_steps: int = 20, warmup: int = 1):
        """Returns (seconds_per_step, final_state).

        Measured as the SLOPE between a short (n/4) and a full (n) loop:
        on remote-tunnel platforms every synchronized timing carries a
        fixed ~25-30 ms round trip regardless of the program, so naive
        T/n inflates per-step time by ~30ms/n (bench.py carries the
        measurement; this cancelled it exactly)."""
        x = x0
        for _ in range(warmup):
            x = step_fn(x)
        self.sync(x)
        k_small = max(1, n_steps // 4)
        t0 = time.perf_counter()
        for _ in range(k_small):
            x = step_fn(x)
        self.sync(x)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_steps):
            x = step_fn(x)
        self.sync(x)
        t_big = time.perf_counter() - t0
        return (t_big - t_small) / (n_steps - k_small), x

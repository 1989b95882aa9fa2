"""A/B the fused Pallas subsampling against the lax conv chain on chip.

Prints parity (max abs diff on valid rows) and amortized timings at the
20-min decode shape (16, 16384, 80) — the PERFORMANCE.md "conv subsampling
27.5 ms" component.  Chained-call harness (inputs threaded through the
carry) to defeat LICM and amortize the tunnel round trip.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lcasr_tpu.ops.subsampling_pallas import (
    dw_striding_chain_lax,
    fused_dw_striding,
)

B, T, F, C = (16, 16384, 80, 256) if len(sys.argv) < 2 else map(int, sys.argv[1].split(","))
DTYPE = jnp.bfloat16
N_CHAIN = 8

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, F)), DTYPE)
params = []
params += [jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.1, DTYPE),
           jnp.asarray(rng.normal(size=(C,)) * 0.1, DTYPE)]
for _ in range(2):
    params += [jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.1, DTYPE),
               jnp.asarray(rng.normal(size=(C,)) * 0.1, DTYPE),
               jnp.asarray(rng.normal(size=(1, 1, C, C)) * 0.06, DTYPE),
               jnp.asarray(rng.normal(size=(C,)) * 0.1, DTYPE)]
params = tuple(params)


@jax.jit
def f_lax(x):
    return dw_striding_chain_lax(x[..., None], params, "silu")


@jax.jit
def f_fused(x):
    return fused_dw_striding(x, params, "silu")


def timed(fn, x):
    def chained(x):
        def body(i, carry):
            o = fn(carry)
            # data dependence on the output so LICM can't hoist
            return carry + 0.0 * o.mean().astype(carry.dtype)

        return jax.lax.fori_loop(0, N_CHAIN, body, x)

    g = jax.jit(chained)
    _ = float(g(x).sum())  # compile + warm
    t0 = time.perf_counter()
    _ = float(g(x).sum())
    t1 = time.perf_counter()
    return (t1 - t0) / N_CHAIN * 1e3


a = np.asarray(f_lax(x), np.float32)
b = np.asarray(f_fused(x), np.float32)
err = np.abs(a - b).max()
rel = err / max(np.abs(a).max(), 1e-9)
print(f"parity: shape lax={a.shape} fused={b.shape} maxabs={err:.4g} rel={rel:.4g}")
assert a.shape == b.shape
assert rel < 2e-2, "parity failure"

ms_lax = timed(f_lax, x)
ms_fused = timed(f_fused, x)
out = {
    "shape": [B, T, F], "conv_channels": C, "dtype": "bf16",
    "lax_ms": round(ms_lax, 2), "fused_ms": round(ms_fused, 2),
    "speedup": round(ms_lax / ms_fused, 2),
}
print(json.dumps(out))

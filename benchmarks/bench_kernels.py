"""Kernel benchmark harness: Pallas flash attention + conformer ops across
sequence lengths (1k → 45k tokens ≙ 8k → 360k mel frames, the full training
schedule range).

Prints a JSON report per configuration.  Run on the real chip:
    python benchmarks/bench_kernels.py

CAVEAT on remote-attached chips (axon tunnel): every synced call pays a
~56 ms host↔device round trip, so small-kernel "ms" ≈ 56 + device time;
subtract the floor when comparing.  Reference numbers (v5e-1, bf16):
flash attention @46080 tokens ≈ 105 ms fwd / 270 ms bwd ≈ 60 TFLOP/s.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from lcasr_tpu.ops.flash_attention import flash_attention
    from lcasr_tpu.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    H, D = 6, 128
    report = []

    for T in (1024, 4096, 15360, 46080):
        q = jnp.asarray(rng.normal(size=(1, T, H, D)).astype(np.float32), jnp.bfloat16)

        for name, window in (("full", (-1, -1)), ("win1024", (1024, 1024))):
            fwd = jax.jit(lambda q, w=window: flash_attention(q, q, q, window=w).sum())
            t = time_fn(fwd, q, warmup=1, iters=3)["mean_s"]
            # attention flops: 4·T·T_band·H·D (QK^T + PV)
            band = min(T, 2049 if name == "win1024" else T)
            flops = 4 * T * band * H * D
            report.append(
                {
                    "kernel": f"flash_attention_{name}",
                    "tokens": T,
                    "ms": round(t * 1000, 2),
                    "tflops": round(flops / t / 1e12, 2),
                }
            )

            bwd = jax.jit(
                jax.grad(lambda q, w=window: (flash_attention(q, q, q, window=w) ** 2).sum())
            )
            tb = time_fn(lambda q: bwd(q).sum(), q, warmup=1, iters=3)["mean_s"]
            report.append(
                {
                    "kernel": f"flash_attention_{name}_bwd",
                    "tokens": T,
                    "ms": round(tb * 1000, 2),
                    "tflops": round(2.5 * flops / tb / 1e12, 2),
                }
            )

    # conformer conv + FF at the flagship width
    from lcasr_tpu.ops.conv import ConformerConvolution
    from lcasr_tpu.ops.mlp import ConformerFeedForward

    for T in (4096, 15360):
        x = jnp.asarray(rng.normal(size=(1, T, 768)).astype(np.float32), jnp.bfloat16)
        cc = ConformerConvolution(d_model=768, dtype=jnp.bfloat16)
        vcc = cc.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda x: cc.apply(vcc, x).sum())
        report.append(
            {"kernel": "conformer_conv", "tokens": T,
             "ms": round(time_fn(f, x, warmup=1, iters=3)["mean_s"] * 1000, 2)}
        )
        ff = ConformerFeedForward(768, hidden_dim=3072, dtype=jnp.bfloat16)
        vff = ff.init(jax.random.PRNGKey(0), x)
        f2 = jax.jit(lambda x: ff.apply(vff, x).sum())
        t2 = time_fn(f2, x, warmup=1, iters=3)["mean_s"]
        report.append(
            {"kernel": "conformer_ff", "tokens": T, "ms": round(t2 * 1000, 2),
             "tflops": round(2 * 2 * T * 768 * 3072 / t2 / 1e12, 2)}
        )

    # CTC loss at training shapes
    from lcasr_tpu.ops.ctc import ctc_loss

    for T, U in ((256, 64), (2048, 256)):
        lp = jnp.asarray(
            rng.normal(size=(8, T, 4096)).astype(np.float32)
        )
        lp = jax.nn.log_softmax(lp, -1)
        labels = jnp.asarray(rng.integers(0, 4095, size=(8, U)))
        il = jnp.full((8,), T, jnp.int32)
        ll = jnp.full((8,), U, jnp.int32)
        f = jax.jit(lambda lp: ctc_loss(lp, labels, il, ll))
        g = jax.jit(jax.grad(lambda lp: ctc_loss(lp, labels, il, ll)))
        report.append(
            {"kernel": "ctc_fwd", "tokens": T, "labels": U,
             "ms": round(time_fn(f, lp, warmup=1, iters=3)["mean_s"] * 1000, 2)}
        )
        report.append(
            {"kernel": "ctc_grad", "tokens": T, "labels": U,
             "ms": round(time_fn(lambda lp: g(lp).sum(), lp, warmup=1, iters=3)["mean_s"] * 1000, 2)}
        )

    for row in report:
        print(json.dumps(row))


if __name__ == "__main__":
    main()

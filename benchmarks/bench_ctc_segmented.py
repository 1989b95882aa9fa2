"""Segmented vs monolithic CTC backward at the 1-hour lattice scale.

The 1-hour training config's CTC lattice (docs/MEMORY_BUDGET_1H.md) is
T_sub = 45,000 post-subsampling frames x S = 18,001 augmented states
(~9,000 BPE tokens) over C = 4,096 classes.  The monolithic analytic
backward materializes four (T, S) fp32 tensors (hoisted emissions, alphas,
betas, gamma) ~= 3.2 GB each; the segmented path (ops/ctc.py,
segment_size=K) stores only (T/K, S) segment-entry checkpoints and
recomputes per segment, so residuals drop to O((T/K + K)*S).

Usage: python benchmarks/bench_ctc_segmented.py [--mono] [--t 45000]
Writes benchmarks/RESULTS_ctc_segmented.json when run to completion.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=45000)
    p.add_argument("--u", type=int, default=9000)
    p.add_argument("--c", type=int, default=4096)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--mono", action="store_true", help="also try monolithic")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from lcasr_tpu.ops.ctc import ctc_loss

    T, U, C, K = args.t, args.u, args.c, args.k
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, T, C)), jnp.float32)
    log_probs = jax.nn.log_softmax(logits, -1)
    labels = jnp.asarray(rng.integers(0, C - 1, size=(1, U)), jnp.int32)
    il = jnp.array([T], jnp.int32)
    ul = jnp.array([U], jnp.int32)

    results = {"T": T, "U": U, "C": C, "K": K}

    def run(name, seg):
        fn = jax.jit(
            jax.grad(
                lambda lp: ctc_loss(
                    lp, labels, il, ul, reduction="sum", segment_size=seg
                )
            )
        )
        g = fn(log_probs)
        g.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            g = fn(log_probs)
        g.block_until_ready()
        wall = (time.perf_counter() - t0) / 3
        results[name + "_ms"] = round(wall * 1e3, 1)
        print(f"{name}: {wall * 1e3:.1f} ms/grad", flush=True)

    run("segmented", K)
    if args.mono:
        try:
            run("monolithic", None)
        except Exception as e:  # expected: RESOURCE_EXHAUSTED at 1-h scale
            results["monolithic_error"] = type(e).__name__
            print(f"monolithic failed: {type(e).__name__}: {str(e)[:300]}")

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "RESULTS_ctc_segmented.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Round-4 kernel consolidation (VERDICT r3 #8): re-measure every
production hot kernel ONCE, in ONE session, under ONE harness — the
amortized chain (`utils.profiling.time_fn_chain`: n calls inside one
dispatch, LICM-proofed carry) — so PERFORMANCE.md's tables stop mixing
numbers from three generations of methodology.

Covers the production compute path at flagship width (768d-6H-128hd):
  * Pallas flash attention fwd + fused one-pass bwd, full and win1024,
    1k → 46k tokens (the training-schedule range, 46k ≙ the 1-hour lattice)
  * conformer conv module + feed-forward
  * conv subsampling chain (the strided-slice rewrite)
  * CTC fwd/grad (analytic VJP) + the segmented backward at the big shape
  * selective-scan (Mamba) fwd and fwd+bwd

Writes benchmarks/RESULTS_r4_kernels.jsonl (one JSON row per measurement).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "RESULTS_r4_kernels.jsonl")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from lcasr_tpu.ops.flash_attention import flash_attention
    from lcasr_tpu.utils.profiling import time_fn_chain

    rng = np.random.default_rng(0)
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    H, D = 6, 128
    for T in (1024, 4096, 15360, 46080):
        q = jnp.asarray(rng.normal(size=(1, T, H, D)).astype(np.float32),
                        jnp.bfloat16)
        for name, window in (("full", (-1, -1)), ("win1024", (1024, 1024))):
            band = min(T, 2049 if name == "win1024" else T)
            flops = 4 * T * band * H * D

            r = time_fn_chain(
                lambda c, w=window: flash_attention(c, c, c, window=w).sum(),
                q, n=8 if T < 40000 else 4)
            emit({"kernel": f"flash_attention_{name}", "tokens": T,
                  "ms": round(r["ms"], 2),
                  "tflops": round(flops / (r["ms"] / 1e3) / 1e12, 1)})

            g = jax.grad(
                lambda c, w=window: (flash_attention(c, c, c, window=w).astype(jnp.float32) ** 2).sum())
            r = time_fn_chain(lambda c: g(c).sum(), q,
                              n=6 if T < 40000 else 3)
            emit({"kernel": f"flash_attention_{name}_bwd", "tokens": T,
                  "ms": round(r["ms"], 2),
                  "tflops": round(2.5 * flops / (r["ms"] / 1e3) / 1e12, 1)})

    # conformer conv + FF at flagship width
    from lcasr_tpu.ops.conv import ConformerConvolution, ConvSubsampling
    from lcasr_tpu.ops.mlp import ConformerFeedForward

    for T in (4096, 15360):
        x = jnp.asarray(rng.normal(size=(1, T, 768)).astype(np.float32),
                        jnp.bfloat16)
        cc = ConformerConvolution(d_model=768, dtype=jnp.bfloat16)
        vcc = cc.init(jax.random.PRNGKey(0), x)
        r = time_fn_chain(lambda c: cc.apply(vcc, c).sum(), x, n=10)
        emit({"kernel": "conformer_conv", "tokens": T, "ms": round(r["ms"], 2)})

        ff = ConformerFeedForward(768, hidden_dim=3072, dtype=jnp.bfloat16)
        vff = ff.init(jax.random.PRNGKey(0), x)
        r = time_fn_chain(lambda c: ff.apply(vff, c).sum(), x, n=10)
        emit({"kernel": "conformer_ff", "tokens": T, "ms": round(r["ms"], 2),
              "tflops": round(2 * 2 * T * 768 * 3072 / (r["ms"] / 1e3) / 1e12, 1)})

    # subsampling chain (16384 mel frames = the decode window)
    sub = ConvSubsampling(subsampling="dw_striding", subsampling_factor=8,
                          feat_in=80, feat_out=768, conv_channels=256,
                          dtype=jnp.bfloat16)
    xs = jnp.asarray(rng.normal(size=(16, 16384 // 16, 80)).astype(np.float32),
                     jnp.bfloat16)  # 16-window batch as the decode runs it
    vs = sub.init(jax.random.PRNGKey(0), xs,
                  jnp.full((16,), 16384 // 16, jnp.int32))
    r = time_fn_chain(
        lambda c: sub.apply(vs, c, jnp.full((16,), c.shape[1], jnp.int32))[0].sum(),
        xs, n=10)
    emit({"kernel": "subsampling_dw_striding_b16", "frames": 16384,
          "ms": round(r["ms"], 2)})

    # CTC at training shapes (analytic VJP) + the segmented 1-hour lattice
    from lcasr_tpu.ops.ctc import ctc_loss

    for B, T, U, seg in ((8, 256, 64, None), (8, 2048, 256, None),
                         (1, 45000, 18001 // 4, None),
                         (1, 45000, 18001 // 4, 256)):
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(B, T, 4096)).astype(np.float32)), -1)
        labels = jnp.asarray(rng.integers(0, 4095, size=(B, U)))
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U, jnp.int32)
        tag = f"ctc_b{B}_t{T}_u{U}" + (f"_seg{seg}" if seg else "")
        try:
            g = jax.grad(lambda c: ctc_loss(c, labels, il, ll,
                                            segment_size=seg))
            r = time_fn_chain(lambda c: g(c).sum(), lp,
                              n=4 if T < 10000 else 2, iters=2)
            emit({"kernel": tag + "_grad", "ms": round(r["ms"], 2)})
        except Exception as e:  # noqa: BLE001 — the 45k rows may not fit
            emit({"kernel": tag + "_grad", "error": str(e)[:200]})

    # selective scan (Mamba) at the documented shape
    from lcasr_tpu.ops.ssm import selective_scan

    B, L, Dm, N = 8, 2048, 1024, 16
    u = jnp.asarray(rng.normal(size=(B, L, Dm)).astype(np.float32), jnp.bfloat16)
    delta = jax.nn.softplus(
        jnp.asarray(rng.normal(size=(B, L, Dm)).astype(np.float32), jnp.bfloat16))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(Dm, N)).astype(np.float32)))
    Bm = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32), jnp.bfloat16)
    Cm = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32), jnp.bfloat16)

    r = time_fn_chain(
        lambda c: selective_scan(c, delta, A, Bm, Cm).astype(jnp.float32).sum(),
        u, n=8)
    emit({"kernel": "selective_scan_fwd", "shape": f"b{B}_l{L}_d{Dm}_n{N}",
          "ms": round(r["ms"], 2)})
    gs = jax.grad(
        lambda c: (selective_scan(c, delta, A, Bm, Cm).astype(jnp.float32) ** 2).sum())
    r = time_fn_chain(lambda c: gs(c).sum(), u, n=6)
    emit({"kernel": "selective_scan_fwd_bwd", "shape": f"b{B}_l{L}_d{Dm}_n{N}",
          "ms": round(r["ms"], 2)})

    with open(OUT, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

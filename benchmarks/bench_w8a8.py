"""W8A8 quantized inference A/B at the flagship decode shapes.

Same-program A/B (amortized chained harness, see bench_forward_breakdown.py)
of the bf16 vs W8A8 (ops/qdense.py) flagship window forward — the 20-min
decode's unit of work (window batch 16 × 16384 mel frames) — plus the FF
block in isolation, and a full end-to-end 20-min decode RTFx A/B through
StreamingDecoder (the bench.py protocol).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_w8a8.py
Writes benchmarks/RESULTS_w8a8.json.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lcasr_tpu.evaluation.streaming import StreamingDecoder
from lcasr_tpu.models.sconformer_xl import SCConformerXL
from lcasr_tpu.ops.mlp import ConformerFeedForward

B, T_MEL, F = 16, 16384, 80
T, D, H, HD = 2048, 768, 6, 128
N_LAYERS = 9
DTYPE = jnp.bfloat16
N_CHAIN = 32

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
results = {}


def timed(fn, *args):
    def chained(x, rest):
        def body(i, carry):
            o = fn(carry, *rest)
            return carry + (0.0 * o.mean()).astype(carry.dtype)

        return jax.lax.fori_loop(0, N_CHAIN, body, x)

    def scalar(x, rest):
        return chained(x, rest).sum().astype(jnp.float32)

    g = jax.jit(scalar)
    x, rest = args[0], args[1:]
    _ = float(g(x, rest))
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(g(x, rest))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


def rec(k, v):
    results[k] = round(v, 3) if isinstance(v, float) else v
    print(f"{k}: {results[k]}", flush=True)


# ---- FF block in isolation at body shape ----
xb = jnp.asarray(rng.normal(size=(B, T, D)), DTYPE)
for quant in (False, True):
    mlp = ConformerFeedForward(D, hidden_dim=4 * D, quant_w8a8=quant, dtype=DTYPE)
    vm = mlp.init(key, xb)
    rec(f"mlp_ms_{'w8a8' if quant else 'bf16'}",
        timed(lambda x, v: mlp.apply(v, x), xb, vm))

# ---- full flagship window forward ----
xm = jnp.asarray(rng.normal(size=(B, T_MEL, F)), DTYPE)
xa = jnp.swapaxes(xm, 1, 2).astype(jnp.float32)
ml = jnp.full((B,), T_MEL, jnp.int32)
FLAGSHIP = dict(
    vocab_size=4095, d_model=D, n_layers=N_LAYERS, n_heads=H, head_dim=HD,
    subsampling_conv_channels=256, expansion_factor=4,
    use_rotary=True, rotary_base_freq=1.5e6,
)
vf = None
for quant in (False, True, "auto"):
    model = SCConformerXL(**FLAGSHIP, quant_w8a8=quant, dtype=DTYPE)
    if vf is None:
        vf = model.init(key, xa, ml)  # same checkpoint serves both paths
    tag = {False: "bf16", True: "w8a8", "auto": "w8a8_auto"}[quant]
    rec(f"full_forward_ms_{tag}",
        timed(lambda x, v: model.apply(v, x, ml)["final_posteriors"]
              .astype(jnp.float32), xa, vf))

# ---- end-to-end 20-min decode RTFx (bench.py protocol) ----
total_frames = 120_000
spec = rng.normal(size=(1, 80, total_frames)).astype(np.float32)
SEQ_LEN, OVERLAP = 16384, int(16384 * 0.875)
for quant in (False, True, "auto"):
    model = SCConformerXL(**FLAGSHIP, quant_w8a8=quant, dtype=DTYPE)
    dec = StreamingDecoder(model, vf, 4096, window_batch_size=16,
                           transfer_dtype="int8")
    _ = dec.greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)  # compile
    wall = np.inf
    for _i in range(5):
        t0 = time.perf_counter()
        _ = dec.greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)
        wall = min(wall, time.perf_counter() - t0)
    tag = {False: "bf16", True: "w8a8", "auto": "w8a8_auto"}[quant]
    rec(f"decode_rtfx_{tag}", total_frames / 100.0 / wall)

out = os.path.join(os.path.dirname(__file__), "RESULTS_w8a8.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))

# ---- optional: in-situ single-site probe (W8A8_SITES=1) ----
# full flagship forward with exactly one site family quantized, localizing
# which GEMM families pay in composition (they mostly don't — see
# ops/qdense.py module docstring for the analysis)
if os.environ.get("W8A8_SITES"):
    for pol in (False, "ff", "decoder", "conv", "qkv", "attn_out"):
        m = SCConformerXL(**FLAGSHIP, quant_w8a8=pol, dtype=DTYPE)
        rec(f"site_ms_{pol or 'none'}",
            timed(lambda x, v: m.apply(v, x, ml)["final_posteriors"]
                  .astype(jnp.float32), xa, vf))
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

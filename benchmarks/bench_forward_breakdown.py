"""Per-component device-time breakdown of the flagship decode window forward.

Times the full SCConformerXL window forward at the 20-min decode shape
(window batch 16, 16384 mel frames -> 2048 body tokens, 9L-768D-6H bf16) and
each body component in isolation at body shapes — MLP, attention, conformer
conv module, norms — with the amortized chained harness (inputs threaded
through the carry so LICM can't hoist).  Sum-of-parts vs whole localizes
where the body's effective TF/s is lost vs the 162 TF/s matmul ceiling
(PERFORMANCE.md "Device-side budget").

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_forward_breakdown.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from lcasr_tpu.models.sconformer_xl import Attention, ConformerLayer, SCConformerXL
from lcasr_tpu.ops.conv import ConformerConvolution, ConvSubsampling
from lcasr_tpu.ops.mlp import ConformerFeedForward
from lcasr_tpu.ops.norms import LayerNorm

B, T_MEL, F = 16, 16384, 80
T, D, H, HD = 2048, 768, 6, 128
N_LAYERS = 9
DTYPE = jnp.bfloat16
N_CHAIN = 32  # RT/32 ≈ 2 ms residual per-component additive error

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


def timed(fn, *args):
    """ms per call, amortized over N_CHAIN chained calls in one dispatch."""

    def chained(x, rest):
        def body(i, carry):
            o = fn(carry, *rest)
            # full-output mean: a [0]-element dependence would let XLA
            # slice the whole op down to one output element
            return carry + (0.0 * o.mean()).astype(carry.dtype)

        return jax.lax.fori_loop(0, N_CHAIN, body, x)

    def scalar(x, rest):
        return chained(x, rest).sum().astype(jnp.float32)  # scalar fetch only

    g = jax.jit(scalar)
    x, rest = args[0], args[1:]
    _ = float(g(x, rest))  # compile + warm
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(g(x, rest))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


class _R(dict):
    def __setitem__(self, k, v):  # print incrementally — tunnel can drop
        super().__setitem__(k, v)
        print(f"{k}: {v:.3f}" if isinstance(v, float) else f"{k}: {v}", flush=True)


results = _R()

# ---- body-shape input ----
xb = jnp.asarray(rng.normal(size=(B, T, D)), DTYPE)
lengths = jnp.full((B,), T, jnp.int32)

# ---- harness floor: one cheap elementwise op per chain step ----
results["floor_ms"] = timed(lambda x: x * 1.0009765625, xb)

# ---- MLP (×2 per layer) ----
mlp = ConformerFeedForward(D, hidden_dim=4 * D, dtype=DTYPE)
vm = mlp.init(key, xb)
results["mlp_ms"] = timed(lambda x, v: mlp.apply(v, x), xb, vm)

# ---- attention block incl. qkv/out proj + rotary-less flash ----
att = Attention(n_feats=D, head_dim=HD, n_heads=H, use_pallas=True, dtype=DTYPE)
va = att.init(key, xb, lengths=lengths)
results["attention_ms"] = timed(lambda x, v: att.apply(v, x, lengths=lengths), xb, va)

# ---- conformer conv module ----
conv = ConformerConvolution(d_model=D, kernel_size=9, dtype=DTYPE)
vc = conv.init(key, xb)
results["conv_module_ms"] = timed(lambda x, v: conv.apply(v, x), xb, vc)

# ---- one norm at body shape ----
ln = LayerNorm(D)
vn = ln.init(key, xb)
results["layernorm_ms"] = timed(lambda x, v: ln.apply(v, x), xb, vn)

# ---- one full ConformerLayer ----
layer = ConformerLayer(d_model=D, n_heads=H, head_dim=HD, dtype=DTYPE)
vl = layer.init(key, xb, lengths=lengths)
results["layer_ms"] = timed(lambda x, v: layer.apply(v, x, lengths=lengths), xb, vl)

# ---- subsampling at mel shape ----
sub = ConvSubsampling(feat_in=F, feat_out=D, conv_channels=256, dtype=DTYPE)
xm = jnp.asarray(rng.normal(size=(B, T_MEL, F)), DTYPE)
ml = jnp.full((B,), T_MEL, jnp.int32)
vs = sub.init(key, xm, ml)
results["subsampling_ms"] = timed(lambda x, v: sub.apply(v, x, ml)[0], xm, vs)

# ---- whole flagship forward (model takes (B, feat, T) audio) ----
model = SCConformerXL(
    vocab_size=4095, d_model=D, n_layers=N_LAYERS, n_heads=H, head_dim=HD,
    subsampling_conv_channels=256, expansion_factor=4,
    use_rotary=True, rotary_base_freq=1.5e6, dtype=DTYPE,
)
xa = jnp.swapaxes(xm, 1, 2).astype(jnp.float32)  # (B, 80, T_MEL)
vf = model.init(key, xa, ml)
results["full_forward_ms"] = timed(
    lambda x, v: model.apply(v, x, ml)["final_posteriors"].astype(jnp.float32),
    xa, vf,
)

body_sum = N_LAYERS * results["layer_ms"]
parts = (
    N_LAYERS * (2 * results["mlp_ms"] + results["attention_ms"] + results["conv_module_ms"]
                + 5 * results["layernorm_ms"])
)
results["layers_x9_ms"] = round(body_sum, 2)
results["parts_sum_x9_ms"] = round(parts, 2)
results = {k: round(v, 3) if isinstance(v, float) else v for k, v in results.items()}
print(json.dumps(results))

"""W8A8 dynamic-quantized dense matmuls for inference.

A NEW capability with no reference counterpart (the reference serves fp16/
fp32 GEMMs via torch, `lcasr/components/fused_dense.py`): on TPU v5e the MXU
runs int8×int8→int32 at 2× the bf16 FLOP rate (394 vs 197 TOPs peak), so the
decode-path GEMMs can run W8A8:

  * weights  : symmetric per-OUTPUT-CHANNEL int8 (scale = col-max/127),
  * activations: symmetric per-TOKEN (row) int8, quantized dynamically
    in-graph (no calibration pass),
  * accumulation in int32, one fused rescale `int32 · (row_scale · col_scale)`
    back to the compute dtype.

MEASURED OUTCOME (v5e, flagship decode shapes — an honest negative at these
sizes; benchmarks/RESULTS_w8a8.json): isolated GEMMs win modestly (fc1 1.2×,
dec_ff 1.25×, qkv 1.15×; fc2 at K=3072 loses 0.93×), and a composed
FF-block microbench wins 2.20 vs 2.47 ms — but IN SITU every site is
neutral-to-losing (full forward 126→132-135 ms; per-site probe in
RESULTS_w8a8.json): the bf16 GEMMs were already absorbing the neighboring
norm/activation/residual elementwise work via XLA fusion, and dynamic
quantization replaces that with two extra unfusable passes (row-max+rint
quantize, int32 rescale) whose HBM traffic exceeds the int8 MXU gain at
D=768.  The attention projections lose outright (~0.8 ms/layer): their
int32 GEMM output cannot fuse into the Pallas flash kernel.  The cached-LM
rescoring step is a wash too (KV-scatter-bound, not GEMM-bound).  The path
is therefore a tested OPT-IN (`--w8a8`), expected to pay at larger d_model
(the int8 rate gain grows with arithmetic intensity) or on parts with
higher MXU:HBM ratios.

The weight quantization runs in-graph: it is loop-invariant inside the
decode's `lax.scan` over window batches, so XLA's LICM hoists it out — the
per-forward cost is the activation quant only.  Param trees are UNCHANGED
(kernels stay fp32/bf16): any existing checkpoint serves quantized by just
constructing the model with `quant_w8a8=True` (or a site policy, below).

INFERENCE-ONLY: `jnp.rint` has zero gradient, so a quantized matmul blocks
backprop silently.  Model entry points guard `train=True` + quant.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax import lax


def w8a8_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers,
    precision: Any = None,
    preferred_element_type: Optional[Any] = None,
):
    """Drop-in `lax.dot_general` replacement for `nn.Dense(dot_general=...)`.

    Only the Dense pattern is supported: contract lhs's LAST dim with rhs's
    FIRST, no batch dims.  Zero rows stay exactly zero (padding invariance:
    the models zero padded positions before projections).
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if tuple(lc) != (lhs.ndim - 1,) or tuple(rc) != (0,) or lb or rb:
        raise NotImplementedError(
            f"w8a8_dot_general supports only the Dense contraction; got "
            f"{dimension_numbers} for lhs rank {lhs.ndim}"
        )
    out_dtype = lhs.dtype

    w = rhs.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0  # (1, N)
    w_scale = jnp.maximum(w_scale, 1e-8)
    w_q = jnp.clip(jnp.rint(w / w_scale), -127, 127).astype(jnp.int8)

    x = lhs.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0  # (..., 1)
    x_scale = jnp.maximum(x_scale, 1e-8)
    x_q = jnp.clip(jnp.rint(x / x_scale), -127, 127).astype(jnp.int8)

    y = lax.dot_general(
        x_q, w_q, dimension_numbers, preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(out_dtype)


def quant_dot_general(quant: bool):
    """`dot_general=` argument for nn.Dense: the W8A8 path when `quant`,
    flax's default (`lax.dot_general`) otherwise."""
    return w8a8_dot_general if quant else None


# ---------------------------------------------------------------------------
# Site-granular policy.
#
# Whether W8A8 wins is a per-GEMM question, not a per-model one (isolated
# modules win, composed sites mostly don't — see the module docstring), so
# models accept `quant_w8a8` as a POLICY: False (off), True (every site),
# "auto" (the least-bad subset measured in situ), or an iterable of site
# names — letting deployments enable exactly the sites that pay on THEIR
# shapes/hardware.
# ---------------------------------------------------------------------------

# every GEMM family a model can tag
ALL_SITES = frozenset({
    "qkv",       # attention input projections
    "attn_out",  # attention output projection
    "ff",        # conformer/transformer feed-forward pairs
    "conv",      # conformer-conv pointwise pair
    "decoder",   # CTC decoder head (ff + reprojection)
    "proj",      # generic projections (mamba mixer, AED cross-attn)
    "lm_head",   # LM / AED vocab head
})

# the least-bad subset at the flagship encoder shapes (v5e,
# RESULTS_w8a8.json in-situ per-site probe); attention excluded because its
# int32 GEMM output can't fuse into the Pallas flash kernel, conv for being
# a wash (skipping it also shrinks the quantization error surface)
AUTO_SITES = frozenset({"ff", "decoder", "lm_head"})


def resolve_quant_policy(flag) -> frozenset:
    """Normalize a `quant_w8a8` model attribute to a frozenset of sites."""
    if flag is True:
        return ALL_SITES
    if flag is None or flag is False:
        return frozenset()
    if isinstance(flag, str):
        sites = AUTO_SITES if flag == "auto" else frozenset({flag})
    else:
        sites = frozenset(flag)
    bad = sites - ALL_SITES
    if bad:
        raise ValueError(
            f"unknown quant_w8a8 site(s) {sorted(bad)}; valid: "
            f"{sorted(ALL_SITES)} or 'auto'"
        )
    return sites


def quant_site(flag, site: str) -> bool:
    """True when the policy `flag` quantizes GEMMs tagged `site`."""
    return site in resolve_quant_policy(flag)

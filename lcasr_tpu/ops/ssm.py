"""Selective state-space scan (Mamba) ops.

TPU-native replacement for the `mamba_ssm` CUDA/Triton selective-scan and
`causal_conv1d` kernels (reference `lcasr/components/bidirectional_mamba.py:
17-35`, SURVEY §2.8 #7): the recurrence

    h_t = exp(Δ_t ⊙ A) h_{t-1} + (Δ_t ⊙ B_t) x_t
    y_t = C_t · h_t + D ⊙ x_t

is a first-order linear recurrence in (gain, bias) form, evaluated with
`jax.lax.associative_scan` — log-depth, MXU/VPU-friendly, differentiable —
instead of a handwritten sequential kernel.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def causal_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Depthwise causal conv.  x: (B, L, C); kernel: (K, C) → (B, L, C)."""
    K, C = kernel.shape
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :],
        window_strides=(1,),
        padding=[(K - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    if bias is not None:
        out = out + bias
    return out


def selective_scan(
    x: jnp.ndarray,  # (B, L, D)   input sequence
    delta: jnp.ndarray,  # (B, L, D)   timestep (post-softplus)
    A: jnp.ndarray,  # (D, N)      negative-real diagonal state matrix
    B: jnp.ndarray,  # (B, L, N)   input gate
    C: jnp.ndarray,  # (B, L, N)   output gate
    D: Optional[jnp.ndarray] = None,  # (D,) skip
) -> jnp.ndarray:
    """Parallel selective scan.  Returns y (B, L, D)."""
    xf = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    # discretize: gain (B, L, D, N), bias (B, L, D, N)
    dA = jnp.exp(delta[..., None] * A[None, None])  # exp(Δ A)
    dBx = delta[..., None] * Bf[:, :, None, :] * xf[..., None]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)  # h: (B, L, D, N)
    y = jnp.einsum("bln,bldn->bld", Cf, h)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None] * xf
    return y.astype(x.dtype)


def flip_with_lengths(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse each sequence within its valid region, keeping padding at the
    end (reference `bidirectional_mamba.py:138-152` flip_with_mask)."""
    if lengths is None:
        return jnp.flip(x, axis=1)
    B, L = x.shape[:2]
    idx = jnp.arange(L)[None, :]  # (1, L)
    src = lengths[:, None] - 1 - idx  # reversed position within valid region
    src = jnp.where(src >= 0, src, idx)  # padding keeps identity position
    return jnp.take_along_axis(x, src[..., None].astype(jnp.int32), axis=1)

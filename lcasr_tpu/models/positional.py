"""Alternative positional encodings for the paper's pos-enc ablations
(rotary / sine / fourier / none).

Counterparts of reference `lcasr/components/positional_encodings.py`:
LearnableFourierPosEnc (`:7-104`, ESPnet-derived), ScaledSinuEmbedding
(`:106-120`), DynamicPositionBias (`:122-158`).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LearnableFourierPosEnc(nn.Module):
    """x + MLP-free learnable Fourier features of absolute position.

    gamma-scaled random Gaussian projection of scalar positions into
    d_model/2 sin/cos pairs, added to the input.
    """

    d_model: int
    # reference default gamma=1.0; an EXPLICIT None means d_model // 2
    # (positional_encodings.py:27-44), the paper's variance heuristic
    gamma: Optional[float] = 1.0
    # reference hidden_dim (positional_encodings.py:52-58): modulate the
    # fourier features with a Linear-GELU-Linear MLP before adding.  The
    # main conformer uses None (raw features); the enc-dec decoders pass 64.
    hidden_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offsets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, T, _ = x.shape
        gamma = self.gamma if self.gamma is not None else self.d_model // 2
        w_r = self.param(
            "w_r",
            nn.initializers.normal(stddev=gamma ** -0.5),
            (1, self.d_model // 2),
            jnp.float32,
        )
        pos = jnp.arange(T, dtype=jnp.float32)[None, :, None]  # (1, T, 1)
        if offsets is not None:
            pos = pos + offsets[:, None, None].astype(jnp.float32)
        proj = pos @ w_r  # (B or 1, T, d_model//2)
        pe = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        pe = pe * (self.d_model ** -0.5)
        if self.hidden_dim is not None:
            pe = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp_0")(
                pe.astype(self.dtype)
            )
            pe = jax.nn.gelu(pe, approximate=False)
            pe = nn.Dense(self.d_model, dtype=self.dtype, name="mlp_1")(pe)
        return x + pe.astype(x.dtype)


class ScaledSinuEmbedding(nn.Module):
    """Learned-scale sinusoidal absolute positions (reference `:106-120`)."""

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
        inv_freq = 1.0 / (
            10000 ** (jnp.arange(0, self.d_model, 2, dtype=jnp.float32) / self.d_model)
        )
        t = jnp.arange(T, dtype=jnp.float32)
        sinu = jnp.einsum("i,j->ij", t, inv_freq)
        emb = jnp.concatenate([jnp.sin(sinu), jnp.cos(sinu)], axis=-1)
        return x + (emb * scale).astype(x.dtype)[None]


class DynamicPositionBias(nn.Module):
    """MLP over relative distances → per-head attention bias
    (reference `:122-158`; used by the v2 enc-dec decoder)."""

    dim: int
    heads: int
    depth: int = 2
    log_distance: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seqlen_q: int, seqlen_k: int) -> jnp.ndarray:
        # relative positions range over [-(seqlen_k-1), seqlen_q-1]
        rel = jnp.arange(-(seqlen_k - 1), seqlen_q, dtype=jnp.float32)[:, None]
        if self.log_distance:
            rel = jnp.sign(rel) * jnp.log1p(jnp.abs(rel))
        h = rel
        for i in range(self.depth):
            h = nn.Dense(self.dim, dtype=jnp.float32, name=f"mlp_{i}")(h)
            h = nn.silu(h)
        bias = nn.Dense(self.heads, dtype=jnp.float32, name="proj")(h)  # (R, H)
        # index bias[i - j + seqlen_k - 1] for query i, key j
        qi = jnp.arange(seqlen_q)[:, None]
        kj = jnp.arange(seqlen_k)[None, :]
        idx = qi - kj + seqlen_k - 1
        out = bias[idx]  # (Tq, Tk, H)
        return jnp.transpose(out, (2, 0, 1)).astype(self.dtype)  # (H, Tq, Tk)

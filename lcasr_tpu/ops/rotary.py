"""Rotary positional embeddings with position interpolation.

Semantics of reference `lcasr/components/rotary_emb.py`: inverse frequencies
1/base^(2i/d), positions divided by a `rotary_interpolation_factor`
(arXiv:2306.15595), cos/sin tables over the full kv length, optional learned
frequencies, and a query offset for KV-cache continuation.  The paper's main
models use base θ=1.5e6.

In this framework the tables are computed inside jit (they fuse into the
attention prologue); there is no host-side cache because XLA caches the
compiled computation per (seq_len,) shape bucket.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def rotary_tables(
    seq_len: int,
    dim: int,
    base: float = 10000.0,
    interpolation_factor: float = 1.0,
    inv_freq: Optional[jnp.ndarray] = None,
    dtype: Any = jnp.float32,
    offset=0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin), each (seq_len, dim).  `offset` shifts the positions
    (global coordinates of a context-parallel sequence shard)."""
    if inv_freq is None:
        inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = (offset + jnp.arange(seq_len, dtype=jnp.float32)) / interpolation_factor
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    q_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q and k.  q, k: (B, T, H, D); cos/sin: (T_kv, D).

    The query tables are sliced at `q_offset` so a cached-KV continuation sees
    consistent absolute positions (reference `rotary_emb.py:68-73`).
    """
    cos_b = cos[None, :, None, :]
    sin_b = sin[None, :, None, :]
    q_cos = cos_b[:, q_offset : q_offset + q.shape[1]]
    q_sin = sin_b[:, q_offset : q_offset + q.shape[1]]
    k_cos = cos_b[:, : k.shape[1]]
    k_sin = sin_b[:, : k.shape[1]]
    q_out = (q * q_cos) + (rotate_half(q) * q_sin)
    k_out = (k * k_cos) + (rotate_half(k) * k_sin)
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


class RotaryEmbedding(nn.Module):
    """Carrier module for (optionally learned) inverse frequencies."""

    dim: int
    base: float = 10000.0
    learned_freq: bool = False
    interpolation_factor: float = 1.0

    @nn.compact
    def __call__(self, seq_len: int, dtype: Any = jnp.float32, offset=0):
        init_inv_freq = 1.0 / (
            self.base ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim)
        )
        if self.learned_freq:
            inv_freq = self.param("inv_freq", lambda key: init_inv_freq)
        else:
            inv_freq = init_inv_freq
        # interpolation factor can be overridden at runtime (sequence-warmup
        # bumps it, reference exp/train.py:332-333) via module rebind.
        return rotary_tables(
            seq_len,
            self.dim,
            interpolation_factor=self.interpolation_factor,
            inv_freq=inv_freq,
            dtype=dtype,
            offset=offset,
        )

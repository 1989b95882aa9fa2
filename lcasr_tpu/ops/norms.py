"""Normalisation layers.

The reference uses Apex FusedLayerNorm / FusedRMSNorm (CUDA) with a pure-torch
RMSNorm fallback (reference `lcasr/models/sconformer_xl.py:14-17`,
`lcasr/components/normalisation.py:6-47`).  On TPU, XLA fuses the norm
arithmetic into neighbouring ops, so the default implementation is plain jnp
with fp32 statistics; a Pallas fused kernel can be slotted in behind the same
API if profiling shows a gap at very long sequence lengths.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return (y * scale + bias).astype(orig_dtype)


class RMSNorm(nn.Module):
    """RMS norm, apex-FusedRMSNorm semantics (x·rsqrt(ms+eps)·scale, eps=1e-6)
    — the implementation the reference's published checkpoints trained with."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        ms = (x * x).mean(-1, keepdims=True)
        y = x * jnp.reciprocal(jnp.sqrt(ms + self.eps))
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        return (y * scale).astype(orig_dtype)


def get_norm(name: str) -> Callable[..., nn.Module]:
    """Norm factory matching the reference's `default_norm` choice
    ('rms_norm' | 'layer_norm', reference `sconformer_xl.py:86-90`)."""
    if name == "rms_norm":
        return RMSNorm
    if name == "layer_norm":
        return LayerNorm
    raise ValueError(f"default_norm must be rms_norm or layer_norm (got {name})")

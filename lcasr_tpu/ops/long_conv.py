"""Long convolution (HazyResearch "safari", arXiv:2302.06646) ops.

Counterpart of reference `lcasr/components/long_conv.py` (vendored safari
code, optional CUDA fftconv): a learned full-length depthwise kernel applied
via FFT convolution, with squash (soft-threshold) kernel regularization —
selectable as the conformer conv module via `conv_type: longconv`
(reference `exp/configs/README.md:23`).

TPU-native: `jnp.fft.rfft` over a 2L-padded window (linear convolution),
bidirectional by default for ASR (separate causal kernels for each
direction).  XLA lowers the FFT natively; no custom kernel needed.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def squash_kernel(kernel: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Soft-threshold regularization: sign(k)·relu(|k| − lam)."""
    return jnp.sign(kernel) * jax.nn.relu(jnp.abs(kernel) - lam)


def fft_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Causal depthwise linear convolution via FFT.

    x: (B, L, H); kernel: (H, Lk) with Lk ≤ L → (B, L, H)
    """
    B, L, H = x.shape
    n = 2 * L
    k_f = jnp.fft.rfft(kernel.astype(jnp.float32), n=n, axis=-1)  # (H, n//2+1)
    x_f = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=1)  # (B, n//2+1, H)
    y_f = x_f * jnp.swapaxes(k_f, 0, 1)[None]
    y = jnp.fft.irfft(y_f, n=n, axis=1)[:, :L]
    return y.astype(x.dtype)


class LongConv(nn.Module):
    """Bidirectional learned long convolution with squash regularization."""

    d_model: int
    l_max: int = 8192  # learned kernel length
    lam: float = 0.001
    bidirectional: bool = True
    kernel_init_scale: float = 0.002
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, L, H = x.shape
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], 0.0, x)
        Lk = min(self.l_max, L)
        k_fwd = self.param(
            "kernel_fwd",
            nn.initializers.normal(self.kernel_init_scale),
            (H, self.l_max),
            jnp.float32,
        )[:, :Lk]
        y = fft_conv(x, squash_kernel(k_fwd, self.lam))
        if self.bidirectional:
            k_bwd = self.param(
                "kernel_bwd",
                nn.initializers.normal(self.kernel_init_scale),
                (H, self.l_max),
                jnp.float32,
            )[:, :Lk]
            y = y + jnp.flip(fft_conv(jnp.flip(x, 1), squash_kernel(k_bwd, self.lam)), 1)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        return y + bias.astype(y.dtype)


class ConformerLongConvolution(nn.Module):
    """Conformer conv module with the depthwise conv replaced by a long
    convolution: pointwise(2×) → GLU → longconv → norm → SiLU → pointwise."""

    d_model: int
    l_max: int = 8192
    norm_type: str = "batch_renorm"
    exp_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        from lcasr_tpu.ops.conv import BatchNorm, BatchRenorm
        from lcasr_tpu.ops.norms import LayerNorm

        inner = int(self.d_model * self.exp_factor)
        x = nn.Dense(inner * 2, dtype=self.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = LongConv(inner, l_max=self.l_max, dtype=self.dtype, name="long_conv")(
            x, pad_mask=pad_mask
        )
        if self.norm_type == "batch_renorm":
            x = BatchRenorm(inner, name="norm")(x, pad_mask=pad_mask, train=train)
        elif self.norm_type == "batch_norm":
            x = BatchNorm(inner, name="norm")(x, pad_mask=pad_mask, train=train)
        elif self.norm_type == "layer_norm":
            x = LayerNorm(inner, name="norm")(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.d_model, dtype=self.dtype, name="pointwise_conv2")(x)

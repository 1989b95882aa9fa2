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


def ma_smooth_kernel(kernel: jnp.ndarray, window_len: int = 7) -> jnp.ndarray:
    """Moving-average smoothing of the time-domain kernel (reference
    `long_conv.py:247-251,277`: AvgPool1d, odd window, stride 1, same
    padding, zero-pad counted in the denominator).  kernel: (H, L)."""
    assert window_len % 2 == 1, "window size must be odd"
    pad = window_len // 2
    w = jnp.full((window_len,), 1.0 / window_len, kernel.dtype)
    padded = jnp.pad(kernel, ((0, 0), (pad, pad)))
    return jax.vmap(lambda row: jnp.convolve(row, w, mode="valid"))(padded)


def freq_smooth_kernel(kernel: jnp.ndarray, window_len: int = 7) -> jnp.ndarray:
    """Frequency-domain Gaussian smoothing (reference `long_conv.py:241-246,
    271-275`): rfft the kernel, depthwise-correlate each spectrum with
    exp(-0.5·|i − W//2|²) ('same' padding), irfft back.  kernel: (H, L)."""
    L = kernel.shape[-1]
    kf = jnp.fft.rfft(kernel.astype(jnp.float32), axis=-1)  # (H, F) complex
    idx = jnp.arange(window_len, dtype=jnp.float32)
    w = jnp.exp(-0.5 * jnp.abs(idx - window_len // 2) ** 2).astype(kf.dtype)
    pad = window_len // 2
    kf_p = jnp.pad(kf, ((0, 0), (pad, pad)))
    # F.conv1d is cross-correlation; jnp.convolve flips, so flip w (symmetric
    # here, kept for clarity)
    sm = jax.vmap(lambda row: jnp.convolve(row, w[::-1], mode="valid"))(kf_p)
    return jnp.fft.irfft(sm, n=L, axis=-1).astype(kernel.dtype)


def double_exp_init(scale: float = 0.02):
    """Kernel init with a per-(head, position) double-exponential decay
    envelope (reference `long_conv.py:258-265`): randn·scale scaled by
    exp(-(j/L)·(H/2)^(i/H))."""

    def init(key, shape, dtype=jnp.float32):
        H, L = shape
        k = jax.random.normal(key, shape, jnp.float32) * scale
        i = jnp.arange(H, dtype=jnp.float32)[:, None]
        j = jnp.arange(L, dtype=jnp.float32)[None, :]
        envelope = jnp.exp(-(j / L) * jnp.power(float(H // 2), i / H))
        return (k * envelope).astype(dtype)

    return init


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
    """Bidirectional learned long convolution with squash regularization and
    the reference's optional kernel smoothing (`long_conv.py:221-279`):
    `use_ma_smoothing` applies a moving average over the time kernel, or,
    with `smooth_freq`, a Gaussian smoothing of its spectrum — both BEFORE
    the squash, as in the reference forward."""

    d_model: int
    l_max: int = 8192  # learned kernel length
    lam: float = 0.001
    bidirectional: bool = True
    kernel_init_scale: float = 0.002
    weight_init: str = "random"  # random | double_exp
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False
    dtype: Any = jnp.float32

    def _kernel_param(self, name: str, H: int, Lk: int) -> jnp.ndarray:
        if self.weight_init == "double_exp":
            init = double_exp_init(0.02)
        elif self.weight_init == "random":
            init = nn.initializers.normal(self.kernel_init_scale)
        else:
            raise NotImplementedError(f"{self.weight_init} is not a valid weight_init")
        k = self.param(name, init, (H, self.l_max), jnp.float32)[:, :Lk]
        if self.use_ma_smoothing:
            if self.smooth_freq:
                k = freq_smooth_kernel(k, self.ma_window_len)
            else:
                k = ma_smooth_kernel(k, self.ma_window_len)
        return squash_kernel(k, self.lam)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, L, H = x.shape
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], 0.0, x)
        Lk = min(self.l_max, L)
        y = fft_conv(x, self._kernel_param("kernel_fwd", H, Lk))
        if self.bidirectional:
            y = y + jnp.flip(
                fft_conv(jnp.flip(x, 1), self._kernel_param("kernel_bwd", H, Lk)), 1
            )
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        return y + bias.astype(y.dtype)


class ConformerLongConvolution(nn.Module):
    """Conformer conv module with the depthwise conv replaced by a long
    convolution: pointwise(2×) → GLU → longconv → norm → SiLU → pointwise."""

    d_model: int
    l_max: int = 8192
    norm_type: str = "batch_renorm"
    exp_factor: float = 1.0
    weight_init: str = "random"
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        from lcasr_tpu.ops.conv import BatchNorm, BatchRenorm
        from lcasr_tpu.ops.norms import LayerNorm

        inner = int(self.d_model * self.exp_factor)
        x = nn.Dense(inner * 2, dtype=self.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = LongConv(
            inner, l_max=self.l_max, weight_init=self.weight_init,
            use_ma_smoothing=self.use_ma_smoothing,
            ma_window_len=self.ma_window_len, smooth_freq=self.smooth_freq,
            dtype=self.dtype, name="long_conv",
        )(x, pad_mask=pad_mask)
        if self.norm_type == "batch_renorm":
            x = BatchRenorm(inner, name="norm")(x, pad_mask=pad_mask, train=train)
        elif self.norm_type == "batch_norm":
            x = BatchNorm(inner, name="norm")(x, pad_mask=pad_mask, train=train)
        elif self.norm_type == "layer_norm":
            x = LayerNorm(inner, name="norm")(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.d_model, dtype=self.dtype, name="pointwise_conv2")(x)

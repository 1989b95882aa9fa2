"""Long convolution (HazyResearch "safari", arXiv:2302.06646) ops.

Counterpart of reference `lcasr/components/long_conv.py` (vendored safari
code, optional CUDA fftconv), selectable as the conformer conv module via
`conv_type: longconv` (reference `exp/configs/README.md:23`).  Faithful to
the reference `LongConv.forward` (`long_conv.py:464-603`):

  * kernel source is either the learned position-MLP `PositionKernel`
    (reference DEFAULT, `long_conv.py:290-338`: features [a·i, log(b·i),
    sin(c·i)] with learned base rates → 2-layer MLP) or the direct
    `LongConvKernel` parameterization (per-position weights with squash
    soft-thresholding and optional MA / frequency-Gaussian smoothing,
    `long_conv.py:221-279`),
  * bidirectional runs TWO kernel channels combined into one padded kernel
    (`long_conv.py:578-582`): the backward kernel is flipped and left-padded
    by L, so it sees strictly FUTURE positions (offset ≥ 1),
  * FFT length is `L_kernel + L`; when the input is shorter than `l_max`
    the direct kernel is CROPPED by the rfft (torch semantics), reproducing
    the reference's circular tail leak exactly (`long_conv.py:583-587`),
  * learned residual skip `y += u·D` (`long_conv.py:517,589`),
  * GELU then a GLU-gated output linear (`postact='glu'`,
    `long_conv.py:529-549,595-598`).

TPU-native: XLA lowers `jnp.fft.rfft` natively; the whole module is three
FFTs + one GEMM, no custom kernel needed.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.ops.conv import uniform_init as _uniform_init


def squash_kernel(kernel: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Soft-threshold regularization: sign(k)·relu(|k| − lam)."""
    return jnp.sign(kernel) * jax.nn.relu(jnp.abs(kernel) - lam)


def ma_smooth_kernel(kernel: jnp.ndarray, window_len: int = 7) -> jnp.ndarray:
    """Moving-average smoothing of the time-domain kernel (reference
    `long_conv.py:247-251,277`: AvgPool1d, odd window, stride 1, same
    padding, zero-pad counted in the denominator).  kernel: (..., L)."""
    assert window_len % 2 == 1, "window size must be odd"
    pad = window_len // 2
    w = jnp.full((window_len,), 1.0 / window_len, kernel.dtype)
    lead = kernel.shape[:-1]
    flat = kernel.reshape(-1, kernel.shape[-1])
    padded = jnp.pad(flat, ((0, 0), (pad, pad)))
    out = jax.vmap(lambda row: jnp.convolve(row, w, mode="valid"))(padded)
    return out.reshape(*lead, kernel.shape[-1])


def freq_smooth_kernel(kernel: jnp.ndarray, window_len: int = 7) -> jnp.ndarray:
    """Frequency-domain Gaussian smoothing (reference `long_conv.py:241-246,
    271-275`): rfft the kernel, depthwise-correlate each spectrum with
    exp(-0.5·|i − W//2|²) ('same' padding), irfft back.  kernel: (..., L)."""
    L = kernel.shape[-1]
    lead = kernel.shape[:-1]
    kf = jnp.fft.rfft(kernel.astype(jnp.float32), axis=-1).reshape(-1, L // 2 + 1)
    idx = jnp.arange(window_len, dtype=jnp.float32)
    w = jnp.exp(-0.5 * jnp.abs(idx - window_len // 2) ** 2).astype(kf.dtype)
    pad = window_len // 2
    kf_p = jnp.pad(kf, ((0, 0), (pad, pad)))
    # F.conv1d is cross-correlation; jnp.convolve flips, so flip w (symmetric
    # here, kept for clarity)
    sm = jax.vmap(lambda row: jnp.convolve(row, w[::-1], mode="valid"))(kf_p)
    out = jnp.fft.irfft(sm, n=L, axis=-1).astype(kernel.dtype)
    return out.reshape(*lead, L)


def double_exp_init(scale: float = 0.02):
    """Kernel init with a per-(head, position) double-exponential decay
    envelope (reference `long_conv.py:258-265`): randn·scale scaled by
    exp(-(j/L)·(H/2)^(i/H)).  shape (C, H, L)."""

    def init(key, shape, dtype=jnp.float32):
        C, H, L = shape
        k = jax.random.normal(key, shape, jnp.float32) * scale
        i = jnp.arange(H, dtype=jnp.float32)[:, None]
        j = jnp.arange(L, dtype=jnp.float32)[None, :]
        envelope = jnp.exp(-(j / L) * jnp.power(float(H // 2), i / H))
        return (k * envelope[None]).astype(dtype)

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


class PositionKernel(nn.Module):
    """Predict the kernel value at each position from the position itself
    (reference `long_conv.py:290-338`, the reference LongConv's DEFAULT
    kernel): features [i·a, log(i·b), sin(i·c)] (i is 1-based, a/b/c learned
    base rates init [0.01, 1, 1]) through Linear(3→32)·ReLU·Linear(32→H·C),
    all weights AND biases ~ N(0, 0.002)."""

    H: int
    l_max: int
    channels: int = 1
    intermediate_dim: int = 32

    @nn.compact
    def __call__(self, L: int) -> jnp.ndarray:
        L = min(L, self.l_max)
        base_rates = self.param(
            "base_rates",
            lambda key, shape: jnp.asarray([0.01, 1.0, 1.0], jnp.float32),
            (3,),
        )
        i = jnp.arange(L, dtype=jnp.float32) + 1.0
        feats = jnp.stack(
            [i * base_rates[0],
             jnp.log(i * base_rates[1]),
             jnp.sin(i * base_rates[2])],
            axis=-1,
        )  # (L, 3)
        small = nn.initializers.normal(stddev=0.002)
        h = nn.Dense(self.intermediate_dim, kernel_init=small, bias_init=small,
                     name="mlp_in")(feats)
        h = jax.nn.relu(h)
        k = nn.Dense(self.H * self.channels, kernel_init=small, bias_init=small,
                     name="mlp_out")(h)  # (L, C·H)
        # rearrange 'l (c h) -> c h l'
        return k.reshape(L, self.channels, self.H).transpose(1, 2, 0)


class LongConv(nn.Module):
    """The reference `LongConv` module (`long_conv.py:464-603`) end to end:
    kernel → (bidirectional combine) → FFT conv → +u·D skip → GELU →
    Linear(H·C → 2·d_model) → GLU.

    `bidirectional` defaults True here (ASR encoders are non-causal; the
    reference module default is False but its conformer integration class is
    a dead import upstream, so the integration default is this repo's call).
    `position_kernel` mirrors the reference default (True); the direct
    parameterization (`weight_init` / smoothing / squash) applies only when
    it is False, exactly as upstream."""

    d_model: int
    l_max: int = 8192  # learned kernel length
    channels: int = 1
    lam: float = 0.001
    bidirectional: bool = True
    position_kernel: bool = True
    intermediate_dim: int = 32
    kernel_init_scale: float = 0.002
    weight_init: str = "random"  # random | double_exp
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False
    dtype: Any = jnp.float32

    def _direct_kernel(self, kc: int, H: int) -> jnp.ndarray:
        """LongConvKernel (`long_conv.py:221-279`): (kc, H, l_max) weights,
        optional smoothing, then squash.  NOTE the reference forward ignores
        the requested length — the FULL kernel goes to the rfft, which crops
        it to the FFT length (the tail-leak quirk reproduced in __call__)."""
        if self.weight_init == "double_exp":
            init = double_exp_init(0.02)
        elif self.weight_init == "random":
            init = nn.initializers.normal(self.kernel_init_scale)
        else:
            raise NotImplementedError(f"{self.weight_init} is not a valid weight_init")
        k = self.param("kernel", init, (kc, H, self.l_max), jnp.float32)
        if self.use_ma_smoothing:
            if self.smooth_freq:
                k = freq_smooth_kernel(k, self.ma_window_len)
            else:
                k = ma_smooth_kernel(k, self.ma_window_len)
        return squash_kernel(k, self.lam)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, L, H = x.shape
        assert H == self.d_model
        C = self.channels
        kc = C * (2 if self.bidirectional else 1)
        u = x.astype(jnp.float32)  # reference casts the fwd to fp32 (:550)
        if pad_mask is not None:
            u = jnp.where(pad_mask[..., None], 0.0, u)

        L_kernel = min(L, self.l_max)
        if self.position_kernel:
            k = PositionKernel(H, self.l_max, channels=kc,
                               intermediate_dim=self.intermediate_dim,
                               name="kernel")(L_kernel)
        else:
            k = self._direct_kernel(kc, H)

        if self.bidirectional:
            # (:578-582) forward kernel right-padded, backward kernel flipped
            # and LEFT-padded by L: the backward half sees strictly future
            # positions (offset ≥ 1); the current position enters via D only
            k0, k1 = k[:C], k[C:]
            zl = jnp.zeros((C, H, L), k.dtype)
            k = jnp.concatenate([k0, zl], -1) + jnp.concatenate(
                [zl, jnp.flip(k1, -1)], -1
            )

        n = L_kernel + L
        # torch.fft.rfft(k, n) CROPS a longer kernel to n — keep that
        # semantics (jnp.fft.rfft also crops) instead of pre-slicing
        k_f = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)  # (C, H, F)
        u_f = jnp.fft.rfft(u, n=n, axis=1)  # (B, F, H)
        y_f = u_f[:, None] * k_f.transpose(0, 2, 1)[None]  # (B, C, F, H)
        y = jnp.fft.irfft(y_f, n=n, axis=2)[:, :, :L]  # (B, C, L, H)

        # learned skip (:517,589): D ~ randn(C, H), y += u·D
        D = self.param("D", nn.initializers.normal(stddev=1.0), (C, H),
                       jnp.float32)
        y = y + u[:, None] * D[:, None, :][None]

        # '... c h l -> ... (c h) l' flatten (c-major), GELU (exact erf),
        # then the GLU-gated output linear (torch Linear default init)
        y = y.transpose(0, 2, 1, 3).reshape(B, L, C * H)
        y = jax.nn.gelu(y, approximate=False)
        bound = (C * H) ** -0.5
        y = nn.Dense(2 * self.d_model, kernel_init=_uniform_init(bound),
                     bias_init=_uniform_init(bound), dtype=jnp.float32,
                     name="output_linear")(y)
        a, b = jnp.split(y, 2, axis=-1)
        return (a * jax.nn.sigmoid(b)).astype(x.dtype)


class ConformerLongConvolution(nn.Module):
    """Conformer conv-module slot for `conv_type: longconv`.

    The reference's `ConformerLongConvolution` is a dead import (referenced
    only by the graveyard `models/bin/old/metaconformer___.py:9,379`; the
    class no longer exists in `components/convolution.py`), so the faithful
    integration is the safari module itself in the conv slot — the layer
    already pre-norms and adds the residual around it, matching the
    reference layer shape `PreNorm(conv_module(...))`.  `norm_type` /
    `exp_factor` are accepted for config compatibility with the standard
    conv module but are not part of the reference LongConv."""

    d_model: int
    l_max: int = 8192
    norm_type: str = "batch_renorm"  # accepted, unused (see docstring)
    exp_factor: float = 1.0  # accepted, unused (see docstring)
    bidirectional: bool = True
    position_kernel: bool = True
    weight_init: str = "random"
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        return LongConv(
            self.d_model, l_max=self.l_max,
            bidirectional=self.bidirectional,
            position_kernel=self.position_kernel,
            weight_init=self.weight_init,
            use_ma_smoothing=self.use_ma_smoothing,
            ma_window_len=self.ma_window_len, smooth_freq=self.smooth_freq,
            dtype=self.dtype, name="long_conv",
        )(x, pad_mask=pad_mask)

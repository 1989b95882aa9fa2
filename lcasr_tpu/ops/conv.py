"""Convolution ops: batch renorm, conformer conv module, conv subsampling.

TPU-native counterparts of reference `lcasr/components/batchrenorm.py`,
`convolution.py` and `subsampling.py`.  All convolutions use channel-minor
(NWC / NHWC) layouts — the layout XLA:TPU tiles onto the MXU — rather than the
reference's NCHW, and the whole stack is pure-functional (running statistics
live in the flax `batch_stats` collection).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Context-parallel halo exchange
# ---------------------------------------------------------------------------
def halo_exchange(
    x: jnp.ndarray, axis_name: str, left: int, right: int, axis: int = 1
) -> jnp.ndarray:
    """Prepend/append `left`/`right` frames from the ring neighbors along
    `axis` (time).  Must run inside shard_map over `axis_name`.

    Edge shards receive zeros (lax.ppermute delivers zeros to destinations
    with no named source), which matches 'same' zero padding of the global
    convolution — this is the conv halo-exchange story full-model context
    parallelism needs (SURVEY §2.9; depthwise kernel 9 → 4-frame halo,
    stride-2 subsampling stages → 1-frame left halo each)."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left > 0:
        # receiver i gets the LAST `left` frames of shard i-1
        tail = jax.lax.slice_in_dim(x, x.shape[axis] - left, x.shape[axis], axis=axis)
        parts.append(
            jax.lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(n - 1)])
        )
    parts.append(x)
    if right > 0:
        head = jax.lax.slice_in_dim(x, 0, right, axis=axis)
        parts.append(
            jax.lax.ppermute(head, axis_name, [(i + 1, i) for i in range(n - 1)])
        )
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


# ---------------------------------------------------------------------------
# Batch renormalization
# ---------------------------------------------------------------------------
class BatchRenorm(nn.Module):
    """Batch renormalization (arXiv:1702.03275) over a (B, T, C) tensor.

    Matches reference `lcasr/components/batchrenorm.py:8-92` semantics:
      * r/d clipping schedules driven by num_batches_tracked:
          rmax = clip(2/35000·t + 25/35, 1, 3)
          dmax = clip(5/20000·t − 25/20, 0, 5)
      * eps added to the (biased) batch std, momentum 0.01 running updates,
      * pad-mask-aware statistics (True in `pad_mask` = padded position),
      * eval mode normalizes with running stats only.

    Under pjit the batch/time reductions are over the *global* logical array,
    so cross-replica statistics come for free from XLA's collective lowering —
    no explicit psum is required (unlike the NCCL world).
    """

    num_features: int
    eps: float = 1e-3
    momentum: float = 0.01
    affine: bool = True
    # mesh axis names to psum batch statistics over when running inside
    # shard_map (context/data-parallel manual shards).  Under plain jit/pjit
    # reductions are already global — leave empty there.
    stat_axes: Tuple[str, ...] = ()

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        C = self.num_features
        ra_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_std = self.variable("batch_stats", "running_std", lambda: jnp.ones((C,), jnp.float32))
        steps = self.variable("batch_stats", "num_batches_tracked", lambda: jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32))

        orig_dtype = x.dtype
        # stats in fp32 (reference fp32 master math) — or fp64 when the input
        # already is (x64 testing); never downcast
        xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))

        def _psum(val):
            for ax in self.stat_axes:
                val = jax.lax.psum(val, ax)
            return val

        if train:
            if pad_mask is not None:
                keep = ~pad_mask  # (B, T) True = valid
                w = keep.astype(xf.dtype)[..., None]  # (B, T, 1)
                count = jnp.maximum(_psum(w.sum((0, 1))), 1.0)
                batch_mean = _psum((xf * w).sum((0, 1))) / count
                var = _psum(((xf - batch_mean) ** 2 * w).sum((0, 1))) / count
            else:
                count = _psum(jnp.asarray(xf.shape[0] * xf.shape[1], jnp.float32))
                batch_mean = _psum(xf.sum((0, 1))) / count
                var = _psum(((xf - batch_mean) ** 2).sum((0, 1))) / count
            batch_std = jnp.sqrt(var) + self.eps

            t = steps.value.astype(jnp.float32)
            rmax = jnp.clip(2.0 / 35000.0 * t + 25.0 / 35.0, 1.0, 3.0)
            dmax = jnp.clip(5.0 / 20000.0 * t - 25.0 / 20.0, 0.0, 5.0)
            r = jnp.clip(
                jax.lax.stop_gradient(batch_std) / ra_std.value, 1.0 / rmax, rmax
            )
            d = jnp.clip(
                (jax.lax.stop_gradient(batch_mean) - ra_mean.value) / ra_std.value,
                -dmax,
                dmax,
            )
            y = (xf - batch_mean) / batch_std * r + d

            if not self.is_initializing():
                ra_mean.value = ra_mean.value + self.momentum * (
                    jax.lax.stop_gradient(batch_mean) - ra_mean.value
                )
                ra_std.value = ra_std.value + self.momentum * (
                    jax.lax.stop_gradient(batch_std) - ra_std.value
                )
                steps.value = steps.value + 1
        else:
            y = (xf - ra_mean.value) / ra_std.value

        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
            y = weight * y + bias
        return y.astype(orig_dtype)


class BatchNorm(nn.Module):
    """Plain batch norm on (B, T, C) with the same mutable-state contract."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        C = self.num_features
        ra_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var", lambda: jnp.ones((C,), jnp.float32))
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if train:
            if pad_mask is not None:
                keep = (~pad_mask).astype(xf.dtype)[..., None]
                n = jnp.maximum(keep.sum((0, 1)), 1.0)
                mean = (xf * keep).sum((0, 1)) / n
                var = (((xf - mean) ** 2) * keep).sum((0, 1)) / n
                unbias = n / jnp.maximum(n - 1.0, 1.0)
            else:
                mean = xf.mean((0, 1))
                var = ((xf - mean) ** 2).mean((0, 1))
                n = xf.shape[0] * xf.shape[1]
                unbias = n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                # torch BatchNorm1d accumulates the UNBIASED batch variance
                # into running_var (batch norm itself uses the biased one)
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * var * unbias
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return (weight * y + bias).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Conformer convolution module
# ---------------------------------------------------------------------------
def depthwise_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    seq_axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Depthwise 1-D conv, 'same' padding.  x: (B, T, C); kernel: (K, C).

    With `seq_axis_name` (inside shard_map, x time-sharded) the 'same'
    padding becomes a (K-1)/2-frame halo exchange with the ring neighbors +
    a 'valid' conv — output identical to the unsharded conv."""
    K, C = kernel.shape
    pad = (K - 1) // 2
    if seq_axis_name is not None and pad > 0:
        x = halo_exchange(x, seq_axis_name, left=pad, right=pad, axis=1)
        padding = [(0, 0)]
    else:
        padding = [(pad, pad)]
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :],  # (K, 1, C) in WIO for grouped conv
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    if bias is not None:
        out = out + bias
    return out


class ConformerConvolution(nn.Module):
    """pointwise(2×expand) → GLU → pad-mask zero → depthwise(k) → norm →
    SiLU → pointwise, operating on (B, T, D).

    Mirrors reference `lcasr/components/convolution.py:41-124` (default norm
    batch_renorm, kernel 9).  The FlashFFTConv CUDA path is unnecessary on
    TPU: XLA lowers the depthwise conv to fused VPU code, and the whole
    module is a fusion-friendly chain of channel-minor ops.
    """

    d_model: int
    kernel_size: int = 9
    norm_type: str = "batch_renorm"
    exp_factor: float = 1.0
    seq_axis_name: Optional[str] = None  # context parallel (inside shard_map)
    stat_axes: Tuple[str, ...] = ()  # mesh axes for batch-norm statistics
    # reference parity: the reference calls batch_norm(x) with NO mask
    # (convolution.py:119 — BatchRenorm's masked-stats support is dead code
    # upstream), so padded frames (zeroed above) COUNT toward batch stats.
    # True excludes them — cleaner, but a training-trajectory divergence.
    mask_norm_stats: bool = False
    quant_w8a8: bool = False  # int8 MXU pointwise convs (ops/qdense.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        from lcasr_tpu.ops.qdense import quant_dot_general

        assert (self.kernel_size - 1) % 2 == 0
        inner = int(self.d_model * self.exp_factor)
        dg = quant_dot_general(self.quant_w8a8)
        x = nn.Dense(inner * 2, dtype=self.dtype, dot_general=dg,
                     name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU over the channel dim

        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], 0.0, x)

        kernel = self.param(
            "depthwise_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, inner),
            jnp.float32,
        )
        dw_bias = self.param("depthwise_bias", nn.initializers.zeros, (inner,), jnp.float32)
        x = depthwise_conv1d(
            x, kernel.astype(x.dtype), dw_bias.astype(x.dtype),
            seq_axis_name=self.seq_axis_name,
        )

        if not train:
            # eval uses running stats — the batch-stat mask is dead there,
            # and keeping its arithmetic out of the graph keeps inference
            # HLO (and the persistent compile cache for every decode
            # program) identical to pre-r5 builds
            stat_mask = None
        elif self.mask_norm_stats:
            stat_mask = pad_mask
        elif pad_mask is not None:
            # reference parity WITH static batches: the reference's unmasked
            # batch stats (convolution.py:119) only ever see LIVE rows (its
            # batches shrink as samples finish; mesh padding rows don't
            # exist there), and each live row contributes every frame of the
            # reference's DYNAMIC window — including zero-filled time
            # padding up to the window width, which the reference counts.
            # Our static batch is wider (chunks pad to the static
            # chunk_size), so columns past the batch's true window width
            # must NOT count: the window width is the longest live row's
            # length (exact whenever any row spans the window; a final chunk
            # in which every sample ends early under-counts the reference's
            # trailing zero columns — the one residual corner).  Found by
            # the cross-framework AED trajectory arm: counting static pad
            # columns shifted batch statistics ~0.2% per step.
            T_loc = pad_mask.shape[1]
            row_len = (~pad_mask).sum(axis=1).astype(jnp.float32)  # (B,)
            col0 = 0
            if self.seq_axis_name is not None:
                # context parallelism: lengths and liveness are GLOBAL; the
                # column index needs this shard's global offset
                row_len = jax.lax.psum(row_len, self.seq_axis_name)
                col0 = jax.lax.axis_index(self.seq_axis_name) * T_loc
            live = row_len > 0
            u_len = jnp.max(jnp.where(live, row_len, 0.0))
            # under manual collectives (shard_map CP), the window width is
            # the max over the WHOLE batch — rows live on other data shards
            # too (stats are psum'd over stat_axes, so the keep-mask must
            # agree across them)
            for ax in self.stat_axes:
                if ax != self.seq_axis_name:
                    u_len = jax.lax.pmax(u_len, ax)
            cols = col0 + jnp.arange(T_loc, dtype=jnp.float32)
            keep = live[:, None] & (cols[None, :] < u_len)
            stat_mask = ~keep
        else:
            stat_mask = None
        if self.norm_type == "batch_renorm":
            x = BatchRenorm(inner, stat_axes=self.stat_axes, name="norm")(
                x, pad_mask=stat_mask, train=train
            )
        elif self.norm_type == "batch_norm":
            x = BatchNorm(inner, name="norm")(x, pad_mask=stat_mask, train=train)
        elif self.norm_type == "layer_norm":
            from lcasr_tpu.ops.norms import LayerNorm

            x = LayerNorm(inner, name="norm")(x)
        elif self.norm_type == "group_norm":
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5,  # torch default
                             dtype=self.dtype, name="norm")(x)
        elif self.norm_type == "none":
            pass
        else:
            raise ValueError(f"conv_norm_type={self.norm_type} is not valid")

        x = jax.nn.silu(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, dot_general=dg,
                     name="pointwise_conv2")(x)
        return x


# ---------------------------------------------------------------------------
# Convolutional subsampling
# ---------------------------------------------------------------------------
def calc_length(
    lengths: jnp.ndarray,
    all_paddings: int,
    kernel_size: int,
    stride: int,
    ceil_mode: bool,
    repeat_num: int = 1,
) -> jnp.ndarray:
    """Output length through repeated strided convs.

    Same arithmetic as reference `lcasr/components/subsampling.py:557-567`.
    """
    add_pad = float(all_paddings - kernel_size)
    one = 1.0
    lengths = lengths.astype(jnp.float32)
    for _ in range(repeat_num):
        lengths = lengths + add_pad
        lengths = lengths / stride + one
        lengths = jnp.ceil(lengths) if ceil_mode else jnp.floor(lengths)
    return lengths.astype(jnp.int32)


def uniform_init(bound: float):
    """torch-default bounded-uniform initializer U(-bound, bound) — the
    single shared copy (long_conv.py and mamba.py import it)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvParams(nn.Module):
    """Declares a conv's kernel/bias with `nn.Conv`'s exact names, shapes
    and init — so the dw_striding chain can run as a pure function (lax
    chain or fused Pallas kernel, ops/subsampling_pallas.py) over a param
    tree that stays bit-identical to the nn.Conv layout (checkpoint- and
    RNG-compatible: flax derives param keys from the path, not call
    order)."""

    kshape: Tuple[int, ...]
    bound: float

    @nn.compact
    def __call__(self):
        k = self.param("kernel", uniform_init(self.bound), self.kshape)
        b = self.param("bias", uniform_init(self.bound), (self.kshape[-1],))
        return k, b


class ConvSubsampling(nn.Module):
    """Conv subsampling on (B, T, feat) → (B, T/factor, d_model).

    Modes (reference `subsampling.py:219-363`):
      * 'dw_striding' (default, all paper checkpoints): one full 3×3 stride-2
        conv to `conv_channels`, then (log2(factor) − 1) stages of
        [3×3 stride-2 depthwise + 1×1 pointwise], activation per stage,
      * 'striding': log2(factor) full 3×3 stride-2 convs,
      * 'vggnet': per stage two 3×3 s1 convs + 2×2 stride-2 max pool
        (ceil mode),
      * `is_causal`: left-only padding (streaming; reference CausalConv2D).
    Then a linear to `feat_out` over the flattened (freq × channels) axis.
    Squeezeformer-style uniform init (reference `:430-451`).

    Uses NHWC layout with the frequency axis as H: input (B, T, F) is viewed
    as an image (B, T, F, 1).  There is no int32-overflow input chunking
    (reference `:396-420`) — XLA:TPU handles ≥2³¹-element conv inputs; at
    1-hour contexts the conv is also automatically windowed by the streaming
    decode path.
    """

    subsampling_factor: int = 8
    feat_in: int = 80
    feat_out: int = 768
    conv_channels: int = 256
    activation: str = "silu"
    norm_out: bool = False
    subsampling: str = "dw_striding"
    is_causal: bool = False
    # context parallel: inside shard_map with the time axis sharded, each
    # stride-2 stage left-pads via a halo exchange instead of zero padding
    # (kernel 3, stride 2, pad (1,1): output i reads input [2i-1, 2i+1], so
    # only output 0 of a shard needs 1 frame (2 if causal) from the left
    # neighbor).  Requires the local T to be a multiple of the factor.
    seq_axis_name: Optional[str] = None
    # fused Pallas dw_striding chain on TPU (ops/subsampling_pallas.py);
    # backward recomputes through the lax chain (exact conv gradients)
    use_pallas: bool = True
    dtype: Any = jnp.float32

    @property
    def _sampling_num(self) -> int:
        return int(math.log2(self.subsampling_factor))

    def output_freq(self) -> int:
        f = float(self.feat_in)
        for _ in range(self._sampling_num):
            if self.subsampling == "vggnet":
                f = math.ceil((f - 2 + 0) / 2 + 1)
            else:
                pad = 2 if not self.is_causal else 3
                f = math.floor((f - 3 + pad) / 2 + 1)
        return int(f)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        act = {
            "silu": jax.nn.silu,
            "relu": jax.nn.relu,
            # exact erf GELU (torch nn.GELU default, reference helpers.py:12)
            "gelu": lambda v: jax.nn.gelu(v, approximate=False),
            "none": lambda v: v,
        }[self.activation]

        if self.subsampling == "vggnet":
            new_lengths = calc_length(
                lengths, all_paddings=0, kernel_size=2, stride=2,
                ceil_mode=True, repeat_num=self._sampling_num,
            )
        else:
            pad_total = 2 if not self.is_causal else 3  # causal: k-1 left + s-1
            new_lengths = calc_length(
                lengths, all_paddings=pad_total, kernel_size=3, stride=2,
                ceil_mode=False, repeat_num=self._sampling_num,
            )

        C = self.conv_channels
        scale = 1.0 / 3.0  # 1/kernel_size
        dw_max = (3 ** 2) ** -0.5
        pw_max = C ** -0.5
        # causal: left k-1 = 2, right s-1 = 1 on BOTH dims (reference
        # causal_convs.py:48-49,70) — total 3, matching calc_length's
        # all_paddings=3 above; a (2, 0) pad would yield one fewer frame
        # per stage than the reported lengths
        t_pad = (2, 1) if self.is_causal else (1, 1)
        f_pad = (2, 1) if self.is_causal else (1, 1)
        cp = self.seq_axis_name
        if cp is not None and self.subsampling == "vggnet":
            raise NotImplementedError("context parallel: use dw_striding/striding")
        if cp is not None and self.is_causal:
            # the causal right pad (s-1) adds one output per stage that the
            # halo scheme does not reproduce
            raise NotImplementedError("context parallel: causal subsampling unsupported")

        def strided(h):
            """Halo-exchange the time axis for one stride-2 stage under CP:
            left halo of t_pad[0] frames replaces the zero padding, then the
            conv runs 'valid' in time — per-shard outputs equal the global
            conv's slice (local T must be even)."""
            if cp is None:
                return h, [t_pad, f_pad]
            # shapes are static under trace: fail loudly instead of producing
            # misaligned stride-2 windows at every shard boundary
            assert h.shape[1] % 2 == 0, (
                f"context parallel needs an even local T per stride-2 stage, "
                f"got {h.shape[1]} (global T must divide shards x "
                f"subsampling_factor)"
            )
            h = halo_exchange(h, cp, left=t_pad[0], right=0, axis=1)
            # no right pad: with even local T the global stride-2 windows
            # never read the right zero pad, and haloed length Tl + t_pad[0]
            # yields exactly Tl/2 outputs per shard
            return h, [(0, 0), f_pad]

        h = x[..., None]  # (B, T, F, 1)

        # NOTE (r3): a strided-slice tap+matmul reformulation of these convs
        # at the XLA level was tried and REVERTED — same-harness A/B on v5e
        # measured the nn.Conv chain at 22.9 ms vs 129 ms for the tap
        # version at (16, 16384, 80): strided slices on the minor dims
        # lower to layout-hostile gathers.  The Pallas fusion below
        # (ops/subsampling_pallas.py) instead streams the whole chain
        # through VMEM with parity-split contiguous tap reads.
        if self.subsampling == "dw_striding":
            # params declared with nn.Conv's exact layout (see _ConvParams),
            # chain evaluated as a pure function — fused Pallas kernel on
            # TPU, XLA convs elsewhere / under CP / causal / odd shapes
            from lcasr_tpu.ops.subsampling_pallas import (
                dw_striding_chain_lax,
                fused_dw_striding,
                fused_subsampling_enabled,
            )

            params = list(_ConvParams((3, 3, 1, C), scale, name="conv_in")())
            for i in range(self._sampling_num - 1):
                params += _ConvParams((3, 3, 1, C), dw_max, name=f"dw_conv_{i}")()
                params += _ConvParams((1, 1, C, C), pw_max, name=f"pw_conv_{i}")()
            params = tuple(p.astype(self.dtype) for p in params)
            h = h.astype(self.dtype)
            use_fused = (
                self.use_pallas
                and fused_subsampling_enabled()
                and cp is None
                and not self.is_causal
                and self._sampling_num == 3
                and h.shape[1] % 8 == 0
                and self.feat_in % 8 == 0
                and C % 128 == 0
            )
            if use_fused:
                h = fused_dw_striding(
                    h[..., 0], params, self.activation
                )
            else:
                h = dw_striding_chain_lax(
                    h, params, self.activation, t_pad, f_pad, cp
                )
        elif self.subsampling == "striding":
            for i in range(self._sampling_num):
                h, pad2d = strided(h)
                # reference EFFECTIVE init: ConvSubsampling.reset_parameters
                # is never invoked upstream (and is gated to dw_striding
                # anyway), so striding convs carry torch's default
                # kaiming-uniform bound 1/sqrt(fan_in) — 1/3 for stage 0
                # (fan_in 9), 1/sqrt(9C) for the C-channel stages
                st_scale = scale if i == 0 else (9 * C) ** -0.5
                h = nn.Conv(
                    C, (3, 3), strides=(2, 2), padding=pad2d,
                    kernel_init=uniform_init(st_scale),
                    bias_init=uniform_init(st_scale),
                    dtype=self.dtype, name=f"conv_{i}",
                )(h)
                h = act(h)
        elif self.subsampling == "vggnet":
            for i in range(self._sampling_num):
                h = act(nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"vgg_conv_{i}_0")(h))
                h = act(nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"vgg_conv_{i}_1")(h))
                # 2x2 stride-2 max pool, ceil mode (pad to even)
                pt = (-h.shape[1]) % 2
                pf = (-h.shape[2]) % 2
                if pt or pf:
                    h = jnp.pad(h, ((0, 0), (0, pt), (0, pf), (0, 0)),
                                constant_values=-jnp.inf)
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        else:
            raise ValueError(f"Not valid sub-sampling: {self.subsampling}!")

        B, T, F, _ = h.shape
        h = h.reshape(B, T, F * C)
        # reference EFFECTIVE init for `out`: torch nn.Linear default
        # uniform(±1/sqrt(in_features)) — the Squeezeformer fc_scale in
        # reset_parameters (subsampling.py:448-451) is dead code upstream
        # (never invoked), so matching it would diverge from real reference
        # from-scratch runs
        fc_scale = (F * C) ** -0.5
        # NOTE: bias iff norm_out — reference `subsampling.py:374` passes
        # `bias=norm_out` (comment there says the opposite; behavior wins,
        # since published checkpoints carry this layout)
        h = nn.Dense(
            self.feat_out,
            use_bias=self.norm_out,
            kernel_init=uniform_init(fc_scale),
            bias_init=uniform_init(fc_scale),
            dtype=self.dtype,
            name="out",
        )(h)
        if self.norm_out:
            from lcasr_tpu.ops.norms import LayerNorm

            h = LayerNorm(self.feat_out, name="norm_out")(h)
        return h, new_lengths


class StackingSubsampling(nn.Module):
    """Frame-stacking subsampling (reference `subsampling.py:41-89`):
    pad T to a multiple of the factor, stack consecutive frames, then an MLP
    (4× hidden) to feat_out."""

    subsampling_factor: int
    feat_in: int
    feat_out: int
    norm: bool = True
    norm_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        from lcasr_tpu.ops.mlp import ConformerFeedForward
        from lcasr_tpu.ops.norms import LayerNorm

        b, t, h = x.shape
        sf = self.subsampling_factor
        pad = (sf - t % sf) % sf
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        # reference builds pre_norm from `norm` ALONE (subsampling.py:61-68)
        # — norm and norm_out are independent, both may apply
        if self.norm:
            x = LayerNorm(self.feat_in, name="pre_norm")(x)
        x = x.reshape(b, (t + pad) // sf, h * sf)
        x = ConformerFeedForward(
            d_model=h * sf,
            hidden_dim=self.feat_out * 4,
            out_dim=self.feat_out,
            bias1=False,
            bias2=False,
            dtype=self.dtype,
            name="proj_out",
        )(x)
        lengths = jnp.maximum((lengths + pad) // sf, 1)
        if self.norm_out:
            x = LayerNorm(self.feat_out, name="norm_out")(x)
        return x, lengths


class Conv1DSubsampling(nn.Module):
    """1-D conv subsampling (reference `subsampling.py:102-160`): one 'same'
    conv over features, then log2(factor) stride-2 convs, linear out."""

    subsampling_factor: int
    feat_in: int
    feat_out: int
    conv_channels: int
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False):
        sampling_num = int(math.log2(self.subsampling_factor))
        new_lengths = calc_length(
            lengths, all_paddings=2, kernel_size=3, stride=2,
            ceil_mode=False, repeat_num=sampling_num,
        )
        h = nn.Conv(self.conv_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        h = jax.nn.silu(h)
        for i in range(sampling_num):
            h = nn.Conv(self.conv_channels, (3,), strides=(2,), padding=[(1, 1)],
                        dtype=self.dtype, name=f"conv_{i}")(h)
            if self.batch_norm:
                # `train` must thread through or the renorm would run on
                # frozen init running-stats forever
                h = BatchRenorm(self.conv_channels, name=f"norm_{i}")(h, train=train)
            h = jax.nn.silu(h)
        h = nn.Dense(self.feat_out, use_bias=False, dtype=self.dtype, name="out")(h)
        return h, new_lengths


class TimeReductionModule(nn.Module):
    """Squeezeformer time reduction (reference `subsampling.py:570-632`):
    depthwise stride-`stride` conv + pointwise projection, with the
    reference's uniform init."""

    d_model: int
    out_dim: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        K, S = self.kernel_size, self.stride
        pad = max(0, K - S)
        dw_max = K ** -0.5
        pw_max = self.d_model ** -0.5
        kernel = self.param("dw_kernel", uniform_init(dw_max), (K, self.d_model), jnp.float32)
        bias = self.param("dw_bias", uniform_init(dw_max), (self.d_model,), jnp.float32)
        if lengths is not None:
            x = jnp.where(
                (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None], x, 0.0
            )
        # reference torch Conv1d pads SYMMETRICALLY (padding=3 both sides,
        # subsampling.py:590-596), then truncates to len(pad_mask[::stride])
        # = ceil(T/stride) when masks are supplied (:616-620); a left-only
        # pad dropped one frame for odd T
        h = jax.lax.conv_general_dilated(
            x, kernel[:, None, :].astype(x.dtype), window_strides=(S,),
            padding=[(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.d_model,
        ) + bias.astype(x.dtype)
        h = nn.Dense(
            self.out_dim, kernel_init=uniform_init(pw_max),
            bias_init=uniform_init(pw_max), dtype=self.dtype, name="pw",
        )(h)
        if lengths is not None:
            L = -(-x.shape[1] // S)  # ceil, ≙ pad_mask[::stride] columns
            h = h[:, :L]
            lengths = -(-lengths // S)
        return h, lengths

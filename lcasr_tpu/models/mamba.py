"""Bidirectional-Mamba CTC ASR model.

Counterpart of reference `lcasr/models/mamba.py:53-188` +
`lcasr/components/bidirectional_mamba.py:38-226,673-699`: the same
subsampling / self-conditioning / CTC-decoder skeleton as SCConformerXL, with
pre-norm bidirectional Mamba mixers instead of conformer layers.

Mixer structure (per reference `:154-226`):
  in_proj → (x, z); x split into forward/reverse halves; each half gets a
  depthwise causal conv (+SiLU) in its own direction (reverse via mask-aware
  flip), then the selective scan; halves re-merged, y_out linear, gated by
  SiLU(z), out_proj.  S4D-real init for A, softplus-dt with dt-range init.

NOTE: the reference contains an apparent bug — the reverse-direction conv is
applied to the already-convolved FORWARD half (`bidirectional_mamba.py:181-187`
feeds `x_fwd` into `conv1d_rvse`; the commented-out lines show the intent).
This implementation follows the intended semantics (conv on the reverse
half); there are no published Mamba checkpoints, so no compatibility is lost.

The CUDA selective-scan/causal-conv kernels map to
`jax.lax.associative_scan` + `lax.conv` (see `lcasr_tpu/ops/ssm.py`).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lcasr_tpu.models.decoder import ASRLinearSCDecoder
from lcasr_tpu.ops.attention import length_mask
from lcasr_tpu.ops.conv import (ConvSubsampling, StackingSubsampling,
                                uniform_init as _uniform_init)
from lcasr_tpu.ops.norms import RMSNorm
from lcasr_tpu.ops.ssm import causal_conv1d, flip_with_lengths, selective_scan
from lcasr_tpu.models.registry import register_model



class BiMambaMixer(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    n_layer: int = 1  # for the GPT-2 out_proj depth rescale (_init_weights)
    quant_w8a8: bool = False  # int8 MXU projections (ops/qdense.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from lcasr_tpu.ops.qdense import quant_dot_general

        dg = quant_dot_general(self.quant_w8a8)
        B_, L, _ = x.shape
        d_inner = self.expand * self.d_model
        half = d_inner // 2
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        # reference EFFECTIVE inits: torch Linear/Conv1d defaults
        # (kaiming-uniform bound 1/sqrt(fan_in)); biasless Linears are
        # untouched by _init_weights' bias zeroing, and out_proj is
        # re-initialized then scaled by 1/sqrt(n_layer) (the GPT-2 residual
        # scheme, reference `models/mamba.py:21-50,118`)
        xz = nn.Dense(d_inner * 2, use_bias=False,
                      kernel_init=_uniform_init(self.d_model ** -0.5),
                      dtype=self.dtype, dot_general=dg, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        x_fwd, x_rvse = jnp.split(xs, 2, axis=-1)

        x_rvse = flip_with_lengths(x_rvse, lengths)

        def conv_params(name):
            # depthwise torch Conv1d: fan_in = (in/groups)·k = d_conv
            cb = self.d_conv ** -0.5
            k = self.param(f"{name}_kernel", _uniform_init(cb), (self.d_conv, half), jnp.float32)
            b = self.param(f"{name}_bias", _uniform_init(cb), (half,), jnp.float32) if self.conv_bias else None
            return k, b

        kf, bf = conv_params("conv1d_fwd")
        kr, br = conv_params("conv1d_rvse")
        x_fwd = jax.nn.silu(causal_conv1d(x_fwd, kf.astype(x_fwd.dtype), bf))
        x_rvse = jax.nn.silu(causal_conv1d(x_rvse, kr.astype(x_rvse.dtype), br))

        # stack directions along batch for one shared scan (reference :193)
        x_all = jnp.concatenate([x_fwd, x_rvse], axis=0)  # (2B, L, half)

        x_dbl = nn.Dense(dt_rank + self.d_state * 2, use_bias=False,
                         kernel_init=_uniform_init(half ** -0.5),
                         dtype=self.dtype, dot_general=dg, name="x_proj")(x_all)
        dt, Bssm, Cssm = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)

        # dt projection with dt-range bias init (reference :100-118)
        def dt_bias_init(key):
            u = jax.random.uniform(key, (half,))
            dt0 = jnp.exp(
                u * (math.log(self.dt_max) - math.log(self.dt_min)) + math.log(self.dt_min)
            )
            dt0 = jnp.maximum(dt0, self.dt_init_floor)
            return dt0 + jnp.log(-jnp.expm1(-dt0))  # inverse softplus

        dt_init_std = dt_rank ** -0.5
        dt_w = self.param(
            "dt_proj_kernel",
            lambda key: jax.random.uniform(key, (dt_rank, half), minval=-dt_init_std, maxval=dt_init_std),
        )
        dt_b = self.param("dt_proj_bias", dt_bias_init)
        delta = jax.nn.softplus(dt.astype(jnp.float32) @ dt_w + dt_b)

        # S4D-real A init (log-parameterized), D skip
        A_log = self.param(
            "A_log",
            lambda key: jnp.log(
                jnp.broadcast_to(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), (half, self.d_state))
            ),
        )
        D = self.param("D", nn.initializers.ones, (half,), jnp.float32)
        A = -jnp.exp(A_log)

        y_all = selective_scan(x_all, delta, A, Bssm, Cssm, D)
        y_fwd, y_rvse = jnp.split(y_all, 2, axis=0)
        y_rvse = flip_with_lengths(y_rvse, lengths)

        y = nn.Dense(d_inner, use_bias=False,
                     kernel_init=_uniform_init(d_inner ** -0.5),
                     dtype=self.dtype, dot_general=dg, name="y_out")(
            jnp.concatenate([y_fwd, y_rvse], axis=-1)
        )
        y = y * jax.nn.silu(z)
        return nn.Dense(
            self.d_model, use_bias=False,
            kernel_init=_uniform_init(d_inner ** -0.5 / math.sqrt(self.n_layer)),
            dtype=self.dtype, dot_general=dg, name="out_proj",
        )(y)


class MambaBlock(nn.Module):
    d_model: int
    n_layer: int = 1
    quant_w8a8: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        h = RMSNorm(self.d_model, name="norm")(x)
        h = BiMambaMixer(self.d_model, n_layer=self.n_layer,
                         quant_w8a8=self.quant_w8a8, dtype=self.dtype,
                         name="mixer")(h, lengths=lengths)
        return h + x


@register_model("Mamba")
class Mamba(nn.Module):
    """Bidirectional-Mamba encoder + self-conditioned CTC decoder
    (reference `lcasr/models/mamba.py:53`)."""

    vocab_size: int = 128
    feat_in: int = 80
    subsampling: str = "dw_striding"
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    subsampling_act: str = "silu"
    subsampling_norm_out: bool = False
    self_conditioning: bool = True
    n_layers: int = 6
    d_model: int = 768
    # W8A8 policy: False | True | 'auto' | site names (ops/qdense.py);
    # mixer projections are site 'proj', the CTC head is 'decoder'
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio_signal: jnp.ndarray,  # (B, feat, T)
        length: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_logits: bool = False,
    ):
        from lcasr_tpu.ops.qdense import quant_site, resolve_quant_policy

        if resolve_quant_policy(self.quant_w8a8) and train:
            raise ValueError(
                "quant_w8a8 is inference-only (rint blocks gradients); "
                "build the training model without it"
            )
        x = jnp.swapaxes(audio_signal, 1, 2).astype(self.dtype)
        B = x.shape[0]
        have_lengths = length is not None
        if not have_lengths:
            length = jnp.full((B,), x.shape[1], jnp.int32)

        if self.subsampling == "stacking":
            sub = StackingSubsampling(
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                norm=not self.subsampling_norm_out,
                norm_out=self.subsampling_norm_out,
                dtype=self.dtype,
                name="subsampling",
            )
        else:
            sub = ConvSubsampling(
                subsampling=self.subsampling,  # mode must forward (see
                # sconformer_xl: default-dw_striding otherwise)
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                conv_channels=(
                    self.subsampling_conv_channels
                    if self.subsampling_conv_channels != -1
                    else self.d_model
                ),
                activation=self.subsampling_act,
                norm_out=self.subsampling_norm_out,
                dtype=self.dtype,
                name="subsampling",
            )
        x, length = sub(x, length)
        lengths_arg = length if have_lengths else None

        decoder = ASRLinearSCDecoder(
            d_model=self.d_model,
            vocab_size=self.vocab_size,
            norm=True,  # Mamba decoder always norms (reference mamba.py:97-101)
            norm_type="rms_norm",
            quant_w8a8=quant_site(self.quant_w8a8, "decoder"),
            dtype=self.dtype,
            name="decoder",
        )

        for i in range(self.n_layers):
            x = MambaBlock(self.d_model, n_layer=self.n_layers,
                           quant_w8a8=quant_site(self.quant_w8a8, "proj"),
                           dtype=self.dtype, name=f"layers_{i}")(
                x, lengths=lengths_arg
            )
            if i != self.n_layers - 1 and self.self_conditioning:
                posts = jax.nn.softmax(
                    decoder(x, logits=True).astype(jnp.float32), axis=-1
                ).astype(x.dtype)
                x = decoder.integrate_projections(x, decoder.project_back(posts))

        x = decoder.apply_norm(x)
        final_posts = decoder(x, logits=return_logits)
        return {"final_posteriors": final_posts, "length": length}

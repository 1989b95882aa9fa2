"""Feed-forward ops.

The reference's ConformerFeedForward is Tri Dao's FusedMLP — linear → tanh-GELU
→ linear with cuBLASLt epilogue fusion and checkpoint_lvl recompute policies
(reference `lcasr/components/fused_dense.py:209-498`).  On TPU, XLA fuses
bias+GELU into the matmul epilogue natively, so the module is two Dense layers
with `jax.nn.gelu(approximate=True)` (the same tanh approximation).  The
recompute policies map to `jax.checkpoint` at the layer level
(`lcasr_tpu.models.sconformer_xl`), not to manual autograd functions.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.ops.qdense import quant_dot_general


class ConformerFeedForward(nn.Module):
    d_model: int
    hidden_dim: Optional[int] = None
    out_dim: Optional[int] = None
    bias1: bool = False
    bias2: bool = False
    activation: str = "gelu_approx"
    quant_w8a8: bool = False  # int8 MXU inference path (ops/qdense.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.hidden_dim or self.d_model * 4
        out = self.out_dim or self.d_model
        dg = quant_dot_general(self.quant_w8a8)
        x = nn.Dense(hidden, use_bias=self.bias1, dtype=self.dtype,
                     dot_general=dg, name="fc1")(x)
        if self.activation == "gelu_approx":
            x = jax.nn.gelu(x, approximate=True)
        elif self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "sqrelu":
            x = jnp.square(jax.nn.relu(x))
        else:
            raise ValueError(f"unknown activation {self.activation}")
        x = nn.Dense(out, use_bias=self.bias2, dtype=self.dtype,
                     dot_general=dg, name="fc2")(x)
        return x


class SwiGLU(nn.Module):
    """swiglu spare part (reference `lcasr/components/feedforward.py:3-27`)."""

    d_model: int
    expansion_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.d_model * self.expansion_factor
        gate_up = nn.Dense(hidden * 2, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(
            jax.nn.silu(gate) * up
        )

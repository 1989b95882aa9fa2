"""SCConformerMeta: gradient-prediction meta-learning conformer.

Counterpart of reference `lcasr/models/sconformer_meta.py:96-600` (the LIVE
path — the file also carries ~300 lines of commented-out abandoned variants,
plus ~4k LoC more under `models/bin/`, SURVEY §2.1).  The live mechanism:

  * a standard self-conditioned conformer encoder produces hidden
    representations `reprs` (reference `:444-446` — `retain_grad` so the
    trainer can read d loss/d reprs) and CTC posteriors (`original_probs`,
    `:465`),
  * a META branch — `combiner(logits, initial_signal)` (`:467`, combiner
    `:56-77`) → `n_meta_layers` conformer layers (`:470-491`) → a norm+linear
    meta head (`metadecoder` `:34-53`) — predicts the GRADIENT of the CTC
    loss w.r.t. `reprs` (`grad_pred`, `:493-494`),
  * the trainer (reference `exp/train_utterance_meta_loss_pred.py:192-209`)
    computes the TRUE `repr_grads = autograd.grad(ctc_loss, reprs)` and
    trains ONLY the meta branch (all other params frozen, reference
    `:287-295`) to match it under an l2/mse/cosine objective,
  * at inference the predicted gradient substitutes the label-dependent true
    gradient: refinement steps `reprs ← reprs − lr·EMA(grad_pred)`
    (EMAGradModule `:79-94`; `inference_iterations`/`inference_lr` `:152-153`).

JAX mapping: `retain_grad` surgery becomes an explicit function split —
`encode` (audio → reprs), `decode_reprs` (reprs → log-probs) and
`meta_predict` (logits, initial → grad_pred) are separate apply-methods, so
the true repr-gradient is just `jax.grad` of `decode_reprs ∘ ctc_loss` and
the meta branch trains with a masked optimizer (`training/meta.py`).  The
dead `VectorQuantize` codebook (never used by the live path) is dropped;
`codebook_classes` defaults to d_model so grad_pred matches the repr
gradient's shape — the reference's 16384 default only works with its
commented-out VQ lookup.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.models.decoder import ASRLinearSCDecoder
from lcasr_tpu.models.registry import register_model
from lcasr_tpu.models.sconformer_xl import ConformerLayer
from lcasr_tpu.ops.conv import ConvSubsampling, StackingSubsampling
from lcasr_tpu.ops.norms import LayerNorm
from lcasr_tpu.ops.attention import length_mask
from lcasr_tpu.ops.rotary import RotaryEmbedding


class Combiner(nn.Module):
    """Fuse the logit and initial-signal representations (reference
    `sconformer_meta.py:56-77`): two projected+normed streams concatenated
    then mixed down to d_model."""

    d_model: int
    logit_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, logits, initial_signal):
        a = nn.Dense(self.d_model, dtype=self.dtype, name="ff1")(logits)
        a = LayerNorm(self.d_model, name="ff1_norm")(a)
        b = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(initial_signal)
        b = LayerNorm(self.d_model, name="ff2_norm")(b)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(
            jnp.concatenate([a, b], axis=-1)
        )


class MetaDecoder(nn.Module):
    """norm → bias-free linear meta head (reference `sconformer_meta.py:34-53`)."""

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


META_PARAM_PREFIXES = ("meta_layers_", "meta_decoder", "combiner")


def meta_param_mask(params) -> Any:
    """Boolean pytree: True for the trainable meta-branch parameters
    (reference freezes everything else, `sconformer_meta.py:287-295`)."""
    return {
        top: jax.tree.map(
            lambda _: any(top.startswith(p) for p in META_PARAM_PREFIXES), sub
        )
        for top, sub in params.items()
    }


@register_model("SCConformerMeta")
class SCConformerMeta(nn.Module):
    """Conformer encoder + gradient-predicting meta branch.

    `__call__` returns the standard {'final_posteriors', 'length'} plus the
    meta tensors ('reprs', 'initial_signal', 'grad_pred'); the split methods
    `encode` / `decode_reprs` / `meta_predict` are the training/refinement
    API (see module docstring)."""

    vocab_size: int = 128
    feat_in: int = 80
    subsampling: str = "dw_striding"
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    subsampling_act: str = "silu"
    n_layers: int = 6
    d_model: int = 768
    n_heads: int = 6
    head_dim: int = 128
    expansion_factor: int = 4
    conv_kernel_size: int = 9
    conv_norm: str = "batch_renorm"
    decoder_norm: bool = False
    use_rotary: bool = False
    rotary_base_freq: float = 10000.0
    rotary_interpolation_factor: float = 1.0
    self_conditioning: bool = True
    default_norm: str = "layer_norm"
    sandwich_norm: bool = False
    bias_in_ff: bool = False
    transformer: bool = False
    legasee_double_norm: bool = True
    fourier_pos_enc: bool = False  # reference `sconformer_meta.py:121,193,415`
    window: Tuple[int, int] = (-1, -1)
    # meta branch (reference kwargs `:152-153,219,251-296`)
    n_meta_layers: int = 1
    codebook_classes: int = -1  # -1 → d_model (gradient prediction)
    inference_iterations: int = 10
    inference_lr: float = 0.05
    ema_decay: float = 0.99
    use_pallas: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.subsampling == "stacking":
            self.subsampling_mod = StackingSubsampling(
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                norm=True,
                dtype=self.dtype,
                name="subsampling",
            )
        else:
            self.subsampling_mod = ConvSubsampling(
                subsampling_factor=self.subsampling_factor,
                feat_in=self.feat_in,
                feat_out=self.d_model,
                conv_channels=(
                    self.subsampling_conv_channels
                    if self.subsampling_conv_channels != -1
                    else self.d_model
                ),
                activation=self.subsampling_act,
                dtype=self.dtype,
                name="subsampling",
            )
        if self.use_rotary:
            self.rotary_pos_emb = RotaryEmbedding(
                dim=self.head_dim,
                base=self.rotary_base_freq,
                interpolation_factor=self.rotary_interpolation_factor,
                name="rotary_pos_emb",
            )
        if self.fourier_pos_enc:
            from lcasr_tpu.models.positional import LearnableFourierPosEnc

            self.fourier_mod = LearnableFourierPosEnc(
                self.d_model, dtype=self.dtype, name="fourier_pos_enc"
            )

        def make_layer(name):
            return ConformerLayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                head_dim=self.head_dim,
                conv_kernel_size=self.conv_kernel_size,
                expansion_factor=self.expansion_factor,
                conv_norm=self.conv_norm,
                default_norm=self.default_norm,
                sandwich_norm=self.sandwich_norm,
                bias_in_ff=self.bias_in_ff,
                transformer=self.transformer,
                window=self.window,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=name,
            )

        self.layers = [make_layer(f"layers_{i}") for i in range(self.n_layers)]
        self.meta_layers = [
            make_layer(f"meta_layers_{i}") for i in range(self.n_meta_layers)
        ]
        self.decoder = ASRLinearSCDecoder(
            d_model=self.d_model,
            vocab_size=self.vocab_size,
            norm=self.decoder_norm,
            norm_type=self.default_norm,
            dtype=self.dtype,
            name="decoder",
        )
        classes = self.codebook_classes if self.codebook_classes > 0 else self.d_model
        self.meta_decoder = MetaDecoder(
            self.d_model, classes, dtype=self.dtype, name="meta_decoder"
        )
        self.combiner = Combiner(
            self.d_model, logit_dim=self.vocab_size + 1, dtype=self.dtype,
            name="combiner",
        )

    # -- encoder: audio → reprs (reference main_layers `:302-335` + `:444-446`)
    def encode(self, audio_signal, length=None, train: bool = False):
        x = jnp.swapaxes(audio_signal, 1, 2).astype(self.dtype)
        B = x.shape[0]
        have_lengths = length is not None
        if not have_lengths:
            length = jnp.full((B,), x.shape[1], dtype=jnp.int32)
        x, length = self.subsampling_mod(x, length)
        N = x.shape[1]
        lengths_arg = length if have_lengths else None
        pad_mask = (~length_mask(length, N)) if have_lengths else None
        rotary = (
            self.rotary_pos_emb(N, dtype=jnp.float32) if self.use_rotary else None
        )
        if self.fourier_pos_enc:
            # applied BEFORE the initial-signal capture, exactly as the
            # reference (`:415` then `:432`) — the meta branch sees the
            # position-encoded signal
            x = self.fourier_mod(x)
        initial_signal = x  # reference static_initial_signal `:433`
        for i, layer in enumerate(self.layers):
            x = layer(x, lengths_arg, pad_mask, rotary, train)
            if i != self.n_layers - 1 and self.self_conditioning:
                interim = self.decoder(x, logits=True)
                posts = jax.nn.softmax(interim.astype(jnp.float32), -1).astype(x.dtype)
                x = self.decoder.integrate_projections(
                    x, self.decoder.project_back(posts)
                )
        return {
            "reprs": x,
            "initial_signal": initial_signal,
            "length": length,
            "pad_mask": pad_mask,
            "lengths_arg": lengths_arg,
        }

    # -- head: reprs → logits / log-probs (reference `:448,554-556`)
    def decode_reprs(self, reprs, return_logits: bool = False):
        x = self.decoder.apply_norm(reprs) if self.legasee_double_norm else reprs
        return self.decoder(x, logits=return_logits)

    # -- meta branch: (logits, initial) → predicted d loss/d reprs
    #    (reference `:467-494`)
    def meta_predict(
        self, logits, initial_signal, length=None, train: bool = False
    ):
        x = self.combiner(logits, initial_signal)
        N = x.shape[1]
        pad_mask = (~length_mask(length, N)) if length is not None else None
        rotary = (
            self.rotary_pos_emb(N, dtype=jnp.float32) if self.use_rotary else None
        )
        for layer in self.meta_layers:
            x = layer(x, length, pad_mask, rotary, train)
        return self.meta_decoder(x)

    def __call__(self, audio_signal, length=None, train: bool = False,
                 return_logits: bool = False):
        enc = self.encode(audio_signal, length=length, train=train)
        logits = self.decode_reprs(enc["reprs"], return_logits=True)
        grad_pred = self.meta_predict(
            logits, enc["initial_signal"], length=enc["lengths_arg"], train=train
        )
        final = (
            logits
            if return_logits
            else jax.nn.log_softmax(logits.astype(jnp.float32), -1).astype(logits.dtype)
        )
        return {
            "final_posteriors": final,
            "length": enc["length"],
            "reprs": enc["reprs"],
            "initial_signal": enc["initial_signal"],
            "grad_pred": grad_pred,
        }


def refine_at_inference(
    model: SCConformerMeta,
    variables,
    audio_signal,
    length=None,
    iterations: Optional[int] = None,
    lr: Optional[float] = None,
):
    """Label-free test-time refinement: the meta branch's PREDICTED gradient
    stands in for the label-dependent true gradient —
    `reprs ← reprs − lr·EMA(grad_pred)`, then re-decode (reference
    `inference_iterations`/`inference_lr` `sconformer_meta.py:152-153` with
    EMAGradModule smoothing `:79-94`).  Requires codebook_classes == d_model
    (the default) so grad_pred lives in repr space."""
    iterations = iterations or model.inference_iterations
    lr = lr or model.inference_lr

    enc = model.apply(variables, audio_signal, length, method=SCConformerMeta.encode)
    reprs = enc["reprs"]

    @jax.jit
    def one_step(reprs, ema):
        logits = model.apply(
            variables, reprs, True, method=SCConformerMeta.decode_reprs
        )
        gp = model.apply(
            variables, logits, enc["initial_signal"], enc["lengths_arg"],
            method=SCConformerMeta.meta_predict,
        ).astype(reprs.dtype)
        ema = model.ema_decay * ema + (1.0 - model.ema_decay) * gp
        return reprs - lr * ema, ema

    ema = jnp.zeros_like(reprs)
    for i in range(iterations):
        if i == 0:
            # EMAGradModule seeds with the first gradient (reference `:88-89`)
            logits = model.apply(
                variables, reprs, True, method=SCConformerMeta.decode_reprs
            )
            ema = model.apply(
                variables, logits, enc["initial_signal"], enc["lengths_arg"],
                method=SCConformerMeta.meta_predict,
            ).astype(reprs.dtype)
            reprs = reprs - lr * ema
        else:
            reprs, ema = one_step(reprs, ema)
    final = model.apply(variables, reprs, method=SCConformerMeta.decode_reprs)
    return {"final_posteriors": final, "length": enc["length"]}

"""Attention-encoder-decoder (AED) conformer models with joint CTC loss.

Counterparts of reference `lcasr/models/enc_dec_sconformer.py:29-860` and
`enc_dec_sconformer_v2.py:30-1110`:

  * conformer encoder (same stack as SCConformerXL, incl. optional CTC head
    with self-conditioning when ctc_loss_weight > 0),
  * cross-attention transformer decoder: token embedding + learnable Fourier
    positions, N × [causal self-attn (rotary) → cross-attn over acoustic
    states → FF], normed output projection,
  * joint loss: ctc_loss_weight · CTC + (1 − w) · label-smoothing-free CE,
    with the reference's per-token normalizations (`:177-242`),
  * greedy `generate` as a single jitted `lax.while_loop` over a static
    max-length buffer (TPU-friendly: one compile, no growing shapes),
  * V2 (`EncDecSconformerV2`): cosine-similarity decoder attention with a
    learned temperature + DynamicPositionBias instead of rotary
    (reference v2 `:758-1026`), compatible with the LM beam-search API.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.models.decoder import ASRLinearSCDecoder
from lcasr_tpu.models.positional import DynamicPositionBias, LearnableFourierPosEnc
from lcasr_tpu.models.registry import register_model
from lcasr_tpu.models.sconformer_xl import ConformerLayer
from lcasr_tpu.ops.attention import NEG_INF, length_mask
from lcasr_tpu.ops.conv import ConvSubsampling
from lcasr_tpu.ops.mlp import ConformerFeedForward
from lcasr_tpu.ops.norms import get_norm
from lcasr_tpu.ops.rotary import RotaryEmbedding, apply_rotary, rotate_half


def init_decoder_cache(n_layers, n_heads, head_dim, batch, max_len, dtype=jnp.float32):
    """Zeroed per-layer self-attention (k, v) caches for incremental decoding."""
    shape = (batch, max_len, n_heads, head_dim)
    return tuple(
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(n_layers)
    )


def _masked_softmax_attention(q, k, v, mask, scale):
    """q (B,Tq,H,D), k/v (B,Tk,H,D), mask (B,1,Tq,Tk) bool True=keep."""
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


class DecoderSelfAttention(nn.Module):
    d_model: int
    n_heads: int
    head_dim: int
    bias: bool = False
    cosine: bool = False  # V2: cosine-sim attention with learned temperature
    quant_w8a8: bool = False  # int8 MXU projections (ops/qdense.py)
    dtype: Any = jnp.float32

    def _normalize(self, a):
        return a / (
            jnp.linalg.norm(a.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6
        ).astype(a.dtype)

    @nn.compact
    def __call__(self, x, rotary=None, pos_bias=None, cache=None):
        """Full causal pass (cache=None), or one cached incremental step.

        Cached step (reference `enc_dec_sconformer_v2.py:758-1026`, the
        CosineAttention cache-index path): x is (B, 1, d_model), cache is
        (k_cache, v_cache, t) with k/v (B, S, H, D) holding steps < t; the new
        key/value is written at index t and attention runs over columns <= t.
        Returns (out, (k_cache, v_cache)).
        """
        from lcasr_tpu.ops.qdense import quant_dot_general

        dg = quant_dot_general(self.quant_w8a8)
        B, T, _ = x.shape
        H, D = self.n_heads, self.head_dim
        qkv = nn.Dense(3 * H * D, use_bias=False, dtype=self.dtype,
                       dot_general=dg, name="qkv_proj")(x)
        q, k, v = (a.reshape(B, T, H, D) for a in jnp.split(qkv, 3, axis=-1))
        if self.cosine:
            # ONE shared scalar (reference enc_dec_sconformer_v2.py:790), not per-head
            temp = self.param("temperature", nn.initializers.constant(15.5), (), jnp.float32)

        if cache is not None:
            k_cache, v_cache, t = cache
            S = k_cache.shape[1]
            if rotary is not None:
                cos, sin = rotary  # (max_len, D) tables
                cos_t = jax.lax.dynamic_slice_in_dim(cos, t, 1, 0)[None, :, None, :]
                sin_t = jax.lax.dynamic_slice_in_dim(sin, t, 1, 0)[None, :, None, :]
                q = (q * cos_t) + (rotate_half(q) * sin_t)
                k = (k * cos_t) + (rotate_half(k) * sin_t)
            if self.cosine:
                q = self._normalize(q)
                k = self._normalize(k)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k.astype(k_cache.dtype), t, 1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v.astype(v_cache.dtype), t, 1)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32), k_cache.astype(jnp.float32)
            )  # (B, H, 1, S)
            scores = scores * (temp if self.cosine else D ** -0.5)
            if pos_bias is not None:
                scores = scores + pos_bias[None]  # (1, H, 1, S)
            valid = (jnp.arange(S) <= t)[None, None, None, :]
            scores = jnp.where(valid, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v_cache.astype(jnp.float32)).astype(x.dtype)
            out = out.reshape(B, T, H * D)
            out = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                           dot_general=dg, name="out_proj")(out)
            return out, (k_cache, v_cache)

        if rotary is not None:
            q, k = apply_rotary(q, k, *rotary)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        if self.cosine:
            q = self._normalize(q)
            k = self._normalize(k)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * temp
            if pos_bias is not None:
                scores = scores + pos_bias[None]
            scores = jnp.where(causal, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32)).astype(x.dtype)
        elif pos_bias is not None:
            # keep the full pass and the cached step the SAME model: the
            # bias must not silently drop on the training path
            scores = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * (D ** -0.5) + pos_bias[None]
            scores = jnp.where(causal, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32)).astype(x.dtype)
        else:
            out = _masked_softmax_attention(q, k, v, causal, D ** -0.5)
        out = out.reshape(B, T, H * D)
        return nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                        dot_general=dg, name="out_proj")(out)


class CrossAttention(nn.Module):
    """Text queries over acoustic keys/values (reference `:616-698`)."""

    d_model: int
    n_heads: int
    head_dim: int
    bias: bool = False
    quant_w8a8: bool = False  # int8 MXU projections (ops/qdense.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xq, xkv=None, kv_lengths=None, kv=None):
        """xq queries over keys/values from `xkv`, or from precomputed
        `kv=(k, v)` (incremental decoding: the acoustic K/V are projected once
        per recording, not once per emitted token).  Pass xq=None to return
        the projected (k, v) pair for caching."""
        from lcasr_tpu.ops.qdense import quant_dot_general

        dg = quant_dot_general(self.quant_w8a8)
        H, D = self.n_heads, self.head_dim
        if kv is None:
            Tk = xkv.shape[1]
            kv_flat = nn.Dense(2 * H * D, use_bias=False, dtype=self.dtype,
                               dot_general=dg, name="kv_proj")(xkv)
            k, v = (a.reshape(xkv.shape[0], Tk, H, D) for a in jnp.split(kv_flat, 2, axis=-1))
            if xq is None:
                return k, v
        else:
            k, v = kv
            Tk = k.shape[1]
        B, Tq, _ = xq.shape
        q = nn.Dense(H * D, use_bias=False, dtype=self.dtype,
                     dot_general=dg, name="q_proj")(xq).reshape(B, Tq, H, D)
        mask = None
        if kv_lengths is not None:
            mask = length_mask(kv_lengths, Tk)[:, None, None, :]
        out = _masked_softmax_attention(q, k, v, mask, D ** -0.5)
        out = out.reshape(B, Tq, H * D)
        return nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                        dot_general=dg, name="out_proj")(out)


class CrossAttnDecoder(nn.Module):
    """Transformer LM decoder with cross-attention (reference `:699-860`).

    Besides the full teacher-forced pass (`__call__`), exposes O(U)
    incremental decoding (reference `enc_dec_sconformer_v2.py:758-1026`):
    `precompute` projects the acoustic K/V once per recording and builds the
    rotary / position-bias tables; `step` consumes ONE new token with
    per-layer self-attention KV caches.
    """

    vocab_size: int
    n_layers: int = 3
    d_model: int = 768
    n_heads: int = 6
    head_dim: int = 128
    decoder_norm: bool = True
    use_rotary: bool = True
    rotary_base_freq: float = 10000.0
    default_norm: str = "rms_norm"
    bias_in_ff: bool = False
    cosine_attention: bool = False  # V2
    use_dynamic_pos_bias: bool = False  # V2
    use_acoustic_norm: bool = False  # reference v2:902 kwarg, default off
    # W8A8 policy: False | True | 'auto' | site names (ops/qdense.py);
    # self/cross-attention projections are site 'proj', FFs 'ff', the
    # vocab head 'lm_head'
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    def setup(self):
        from lcasr_tpu.ops.qdense import quant_site
        Norm = get_norm(self.default_norm)
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype, name="embed")
        # reference builds the decoder pos enc with an MLP head (hidden 64,
        # enc_dec_sconformer.py:86) and gates acoustic_norm behind a kwarg
        # defaulting OFF (v2:902)
        self.pos_enc = LearnableFourierPosEnc(
            self.d_model, hidden_dim=64, dtype=self.dtype, name="pos_enc"
        )
        self.acoustic_norm = (
            Norm(self.d_model, name="acoustic_norm")
            if self.use_acoustic_norm else (lambda v: v)
        )
        if self.use_rotary and not self.cosine_attention:
            self.rotary_pos_emb = RotaryEmbedding(
                dim=self.head_dim, base=self.rotary_base_freq, name="rotary_pos_emb"
            )
        if self.use_dynamic_pos_bias:
            self.dynamic_pos_bias = DynamicPositionBias(
                dim=64, heads=self.n_heads, name="dynamic_pos_bias"  # reference v2:947-952
            )
        self.self_norms = [Norm(self.d_model, name=f"self_norm_{i}") for i in range(self.n_layers)]
        self.self_attns = [
            DecoderSelfAttention(
                self.d_model, self.n_heads, self.head_dim,
                bias=self.bias_in_ff, cosine=self.cosine_attention,
                quant_w8a8=quant_site(self.quant_w8a8, "proj"),
                dtype=self.dtype, name=f"self_attn_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.cross_norms = [Norm(self.d_model, name=f"cross_norm_{i}") for i in range(self.n_layers)]
        self.cross_attns = [
            CrossAttention(
                self.d_model, self.n_heads, self.head_dim,
                bias=self.bias_in_ff,
                quant_w8a8=quant_site(self.quant_w8a8, "proj"),
                dtype=self.dtype, name=f"cross_attn_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.ff_norms = [Norm(self.d_model, name=f"ff_norm_{i}") for i in range(self.n_layers)]
        self.ffs = [
            ConformerFeedForward(
                self.d_model, bias1=self.bias_in_ff, bias2=self.bias_in_ff,
                quant_w8a8=quant_site(self.quant_w8a8, "ff"),
                dtype=self.dtype, name=f"ff_{i}",
            )
            for i in range(self.n_layers)
        ]
        if self.decoder_norm:
            self.out_norm = get_norm(self.default_norm)(self.d_model, name="out_norm")
        from lcasr_tpu.ops.qdense import quant_dot_general

        self.out_proj = nn.Dense(
            self.vocab_size, dtype=self.dtype,
            dot_general=quant_dot_general(quant_site(self.quant_w8a8, "lm_head")),
            name="out_proj",
        )

    def __call__(self, tokens, a_hidden, a_lengths):
        B, T = tokens.shape
        x = self.embed(tokens)
        x = self.pos_enc(x)
        a_hidden = self.acoustic_norm(a_hidden)

        rotary = None
        if self.use_rotary and not self.cosine_attention:
            rotary = self.rotary_pos_emb(T)
        pos_bias = None
        if self.use_dynamic_pos_bias:
            pos_bias = self.dynamic_pos_bias(T, T)

        for i in range(self.n_layers):
            h = self.self_norms[i](x)
            x = x + self.self_attns[i](h, rotary=rotary, pos_bias=pos_bias)
            h = self.cross_norms[i](x)
            x = x + self.cross_attns[i](h, a_hidden, kv_lengths=a_lengths)
            h = self.ff_norms[i](x)
            x = x + self.ffs[i](h)

        if self.decoder_norm:
            x = self.out_norm(x)
        return self.out_proj(x)

    def precompute(self, a_hidden, a_lengths, max_len: int):
        """Per-recording tables for incremental decoding: per-layer cross
        K/V over the normed acoustic states, rotary cos/sin over max_len,
        and the (H, max_len, max_len) dynamic position bias table."""
        a_hidden = self.acoustic_norm(a_hidden)
        cross_kv = tuple(self.cross_attns[i](None, a_hidden) for i in range(self.n_layers))
        rotary = None
        if self.use_rotary and not self.cosine_attention:
            rotary = self.rotary_pos_emb(max_len)
        pos_bias = None
        if self.use_dynamic_pos_bias:
            pos_bias = self.dynamic_pos_bias(max_len, max_len)
        return {"cross_kv": cross_kv, "rotary": rotary, "pos_bias": pos_bias}

    def step(self, token, t, caches, pre, a_lengths):
        """One incremental decode step.

        token: (B,) int32 — token at position t; caches: tuple of per-layer
        (k, v) buffers (B, S, H, D); pre: output of `precompute`.
        Returns (logits (B, vocab) for position t, updated caches).
        """
        B = token.shape[0]
        x = self.embed(token[:, None])  # (B, 1, d_model)
        x = self.pos_enc(x, offsets=jnp.full((B,), t, jnp.int32))

        pos_bias_row = None
        if pre["pos_bias"] is not None:
            H = self.n_heads
            S = pre["pos_bias"].shape[1]
            pos_bias_row = jax.lax.dynamic_slice(pre["pos_bias"], (0, t, 0), (H, 1, S))

        new_caches = []
        for i in range(self.n_layers):
            h = self.self_norms[i](x)
            sa_out, kv = self.self_attns[i](
                h, rotary=pre["rotary"], pos_bias=pos_bias_row,
                cache=(caches[i][0], caches[i][1], t),
            )
            new_caches.append(kv)
            x = x + sa_out
            h = self.cross_norms[i](x)
            x = x + self.cross_attns[i](h, kv_lengths=a_lengths, kv=pre["cross_kv"][i])
            h = self.ff_norms[i](x)
            x = x + self.ffs[i](h)

        if self.decoder_norm:
            x = self.out_norm(x)
        return self.out_proj(x)[:, 0], tuple(new_caches)


@register_model("EncDecSconformer")
class EncDecSconformer(nn.Module):
    """Conformer encoder + cross-attention decoder with joint CTC
    (reference `enc_dec_sconformer.py:29`)."""

    vocab_size: int = 4096
    feat_in: int = 80
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    subsampling_act: str = "silu"
    n_layers: int = 6
    d_model: int = 768
    n_heads: int = 6
    head_dim: int = 128
    # None couples the decoder depth to n_layers, as both references do
    # (they pass n_layers=n_layers to CrossAttnDecoder)
    decoder_layers: Optional[int] = None
    ctc_loss_weight: float = 0.5
    self_conditioning: bool = True
    default_norm: str = "layer_norm"
    conv_kernel_size: int = 9
    use_rotary: bool = True  # reference default (enc_dec_sconformer.py:52)
    rotary_base_freq: float = 10000.0
    bias_in_ff: bool = False
    cosine_attention: bool = False
    use_dynamic_pos_bias: bool = False
    use_pallas: bool = True
    # W8A8 policy: False | True | 'auto' | site names (ops/qdense.py)
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    def setup(self):
        from lcasr_tpu.ops.qdense import quant_site
        self.subsampling = ConvSubsampling(
            subsampling_factor=self.subsampling_factor,
            feat_in=self.feat_in,
            feat_out=self.d_model,
            conv_channels=self.subsampling_conv_channels,
            activation=self.subsampling_act,
            dtype=self.dtype,
        )
        self.layers = [
            ConformerLayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                head_dim=self.head_dim,
                conv_kernel_size=self.conv_kernel_size,
                default_norm=self.default_norm,
                bias_in_ff=self.bias_in_ff,
                use_pallas=self.use_pallas,
                quant_w8a8=self.quant_w8a8,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.use_ctc = self.ctc_loss_weight > 0
        if self.use_ctc:
            self.ctc_decoder = ASRLinearSCDecoder(
                d_model=self.d_model,
                vocab_size=self.vocab_size,
                norm=True,
                norm_type=self.default_norm,
                quant_w8a8=quant_site(self.quant_w8a8, "decoder"),
                dtype=self.dtype,
                name="decoder",
            )
        self.language_model_decoder = CrossAttnDecoder(
            vocab_size=self.vocab_size,
            n_layers=(self.decoder_layers
                      if self.decoder_layers is not None else self.n_layers),
            d_model=self.d_model,
            n_heads=self.n_heads,
            head_dim=self.head_dim,
            default_norm="rms_norm",
            bias_in_ff=self.bias_in_ff,
            use_rotary=True,
            rotary_base_freq=self.rotary_base_freq,
            cosine_attention=self.cosine_attention,
            use_dynamic_pos_bias=self.use_dynamic_pos_bias,
            quant_w8a8=self.quant_w8a8,
            dtype=self.dtype,
            name="language_model_decoder",
        )
        if self.use_rotary:
            self.rotary_pos_emb = RotaryEmbedding(
                dim=self.head_dim, base=self.rotary_base_freq, name="rotary_pos_emb"
            )
        # reference applies a fourier pos enc to the subsampled acoustic
        # features IN ADDITION to rotary (enc_dec_sconformer.py:86,322)
        self.encoder_pos_enc = LearnableFourierPosEnc(
            self.d_model, hidden_dim=64, dtype=self.dtype,
            name="encoder_pos_enc",
        )

    def encode(self, audio_signal, length=None, train: bool = False):
        from lcasr_tpu.ops.qdense import resolve_quant_policy

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
        x, length = self.subsampling(x, length)
        x = self.encoder_pos_enc(x)
        lengths_arg = length if have_lengths else None
        pad_mask = (~length_mask(length, x.shape[1])) if have_lengths else None
        rotary = self.rotary_pos_emb(x.shape[1]) if self.use_rotary else None

        ctc_posts = None
        for i, layer in enumerate(self.layers):
            x = layer(x, lengths_arg, pad_mask, rotary, train)
            if self.use_ctc and self.self_conditioning and i != self.n_layers - 1:
                interim = jax.nn.softmax(
                    self.ctc_decoder(x, logits=True).astype(jnp.float32), -1
                ).astype(x.dtype)
                x = self.ctc_decoder.integrate_projections(
                    x, self.ctc_decoder.project_back(interim)
                )
        if self.use_ctc:
            ctc_posts = self.ctc_decoder(self.ctc_decoder.apply_norm(x))
        return x, ctc_posts, length

    def __call__(
        self,
        audio_signal,
        text_sequence=None,
        length=None,
        train: bool = False,
    ):
        a_hidden, ctc_posts, length = self.encode(audio_signal, length, train)
        out = {
            "a_hidden": a_hidden,
            "final_posteriors_ctc": ctc_posts,
            "final_posteriors": ctc_posts,
            "length": length,
        }
        if text_sequence is not None:
            # guard the classic footgun: SCConformerXL's second positional
            # arg is `length`, but here (reference parity,
            # enc_dec_sconformer.py:271-275) it is `text_sequence`
            if text_sequence.ndim != 2:
                raise ValueError(
                    "text_sequence must be (B, U) token ids; got shape "
                    f"{text_sequence.shape} — pass lengths as length=..."
                )
            out["final_posteriors_lm"] = self.language_model_decoder(
                text_sequence, a_hidden, length
            )
        return out

    def generate_step(self, tokens, a_hidden, a_lengths):
        """One decoder pass over the full (static) token buffer → logits."""
        return self.language_model_decoder(tokens, a_hidden, a_lengths)

    def decoder_precompute(self, a_hidden, a_lengths, max_len: int):
        return self.language_model_decoder.precompute(a_hidden, a_lengths, max_len)

    def decoder_step(self, token, t, caches, pre, a_lengths):
        return self.language_model_decoder.step(token, t, caches, pre, a_lengths)


@register_model("EncDecSconformerV2")
class EncDecSconformerV2(EncDecSconformer):
    """V2: cosine-attention decoder + DynamicPositionBias (reference
    `enc_dec_sconformer_v2.py:30`); defaults flip the decoder attention."""

    cosine_attention: bool = True
    use_dynamic_pos_bias: bool = True


def calc_loss(
    model,
    variables,
    audio_signal,
    text_sequence,
    a_lengths,
    t_lengths,
    ctc_loss_weight: Optional[float] = None,
    bos_id: int = 0,
    eos_id: int = 0,
    train: bool = False,
):
    """Joint CTC + CE loss with the reference's normalizations
    (reference `enc_dec_sconformer.py:177-242`).

    ctc_loss_weight defaults to the MODEL's setting (the reference reads
    self.ctc_loss_weight) — a fixed local default could silently disagree
    with the architecture (e.g. half-weighting the LM loss of a CTC-free
    model).  train=True runs with mutable batch stats (the conv renorm
    writes its running statistics) and returns them under "batch_stats"."""
    from lcasr_tpu.ops.ctc import ctc_loss as ctc_loss_fn

    if ctc_loss_weight is None:
        ctc_loss_weight = model.ctc_loss_weight
    B, U = text_sequence.shape
    text_bos = jnp.pad(text_sequence, ((0, 0), (1, 0)), constant_values=bos_id)
    t_lengths_bos = t_lengths + 1

    new_stats = None
    if train:
        out, mutated = model.apply(
            variables, audio_signal, text_sequence=text_bos, length=a_lengths,
            train=True, mutable=["batch_stats"],
        )
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, audio_signal, text_sequence=text_bos, length=a_lengths)
    ctc_out, lm_out, a_len_out = (
        out["final_posteriors_ctc"],
        out["final_posteriors_lm"],
        out["length"],
    )

    if ctc_loss_weight > 0 and ctc_out is not None:
        nll = ctc_loss_fn(
            ctc_out.astype(jnp.float32), text_sequence, a_len_out, t_lengths
        )
        ctc_to_bwd = nll / (ctc_out.shape[0] * ctc_out.shape[1]) * 100
    else:
        ctc_to_bwd = 0.0

    # shifted targets with eos at the final position (reference :209-214)
    targets = jnp.concatenate(
        [text_bos[:, 1:], jnp.zeros((B, 1), text_bos.dtype)], axis=1
    )
    pos = jnp.arange(targets.shape[1])[None, :]
    targets = jnp.where(pos == (t_lengths_bos - 1)[:, None], eos_id, targets)
    valid = pos < t_lengths_bos[:, None]

    logp = jax.nn.log_softmax(lm_out.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    lm_loss = jnp.where(valid, ce, 0.0).sum()
    lm_to_bwd = lm_loss / (lm_out.shape[0] * lm_out.shape[1])

    loss = ctc_to_bwd * ctc_loss_weight + lm_to_bwd * (1 - ctc_loss_weight)
    result = {
        "loss": loss,
        "ctc_loss": ctc_to_bwd,
        "lm_loss": lm_to_bwd,
        "length": a_len_out,
    }
    if new_stats is not None:
        result["batch_stats"] = new_stats
    return result


def generate_greedy(
    model,
    variables,
    audio_signal,
    max_generate: int = 256,
    bos_id: int = 0,
    eos_id: int = 0,
):
    """Greedy AED decoding as one jitted while_loop over a static buffer
    (reference `enc_dec_sconformer.py:244-270`)."""
    run = _greedy_run(model, max_generate, bos_id, eos_id)
    tokens, t = run(variables, audio_signal)
    ids = list(map(int, tokens[0, 1 : int(t) + 1]))
    return [i for i in ids if i != eos_id]


@functools.lru_cache(maxsize=None)
def _greedy_run(model, max_generate: int, bos_id: int, eos_id: int):
    """Cached jitted greedy loop (a fresh per-call closure would retrace and
    recompile the whole encoder+decoder for every utterance)."""
    import jax

    @jax.jit
    def run(variables, audio_signal):
        out = model.apply(variables, audio_signal, method=model.encode)
        a_hidden, _, length = out

        tokens0 = jnp.full((1, max_generate), 0, jnp.int32)
        tokens0 = tokens0.at[0, 0].set(bos_id)

        def cond(state):
            t, tokens, done = state
            return (~done) & (t < max_generate - 1)

        def body(state):
            t, tokens, done = state
            logits = model.apply(
                variables, tokens, a_hidden, length, method=model.generate_step
            )
            nxt = jnp.argmax(logits[0, t], -1).astype(jnp.int32)
            tokens = tokens.at[0, t + 1].set(nxt)
            return t + 1, tokens, nxt == eos_id

        t, tokens, _ = jax.lax.while_loop(cond, body, (0, tokens0, False))
        return tokens, t

    return run


def generate_greedy_cached(
    model,
    variables,
    audio_signal,
    max_generate: int = 256,
    bos_id: int = 0,
    eos_id: int = 0,
):
    """O(U) greedy AED decoding with per-layer self-attention KV caches and
    precomputed cross-attention K/V (reference `enc_dec_sconformer_v2.py:
    758-1026`, the cache-index incremental path).  Emits the same ids as
    `generate_greedy` (which re-forwards the whole prefix per token, O(U²))."""
    run = _greedy_cached_run(model, max_generate, bos_id, eos_id)
    tokens, t = run(variables, audio_signal)
    ids = list(map(int, tokens[0, 1 : int(t) + 1]))
    return [i for i in ids if i != eos_id]


@functools.lru_cache(maxsize=None)
def _greedy_cached_run(model, max_generate: int, bos_id: int, eos_id: int):
    """Cached jitted KV-cached greedy loop (see _greedy_run)."""
    import jax

    @jax.jit
    def run(variables, audio_signal):
        a_hidden, _, length = model.apply(variables, audio_signal, method=model.encode)
        pre = model.apply(
            variables, a_hidden, length, max_generate, method=model.decoder_precompute
        )
        caches = init_decoder_cache(
            (model.decoder_layers
             if model.decoder_layers is not None else model.n_layers),
            model.n_heads, model.head_dim,
            batch=1, max_len=max_generate, dtype=model.dtype,
        )

        tokens0 = jnp.full((1, max_generate), 0, jnp.int32)
        tokens0 = tokens0.at[0, 0].set(bos_id)

        def cond(state):
            t, tokens, caches, done = state
            return (~done) & (t < max_generate - 1)

        def body(state):
            t, tokens, caches, done = state
            tok_t = jax.lax.dynamic_slice_in_dim(tokens, t, 1, 1)[:, 0]
            logits, caches = model.apply(
                variables, tok_t, t, caches, pre, length, method=model.decoder_step
            )
            nxt = jnp.argmax(logits[0], -1).astype(jnp.int32)
            tokens = tokens.at[0, t + 1].set(nxt)
            return t + 1, tokens, caches, nxt == eos_id

        t, tokens, _, _ = jax.lax.while_loop(cond, body, (0, tokens0, caches, False))
        return tokens, t

    return run


def ctc_beam_search(
    model,
    variables,
    audio_signal,
    tokenizer,
    beam_width: int = 25,
    alpha: float = 0.45,
    beta: float = 1.53,
    prune_less_than_val: Optional[float] = 8.0,
    top_am_threshold: float = -6.0,
    bos_id: int = 0,
):
    """The reference v2 model's internal-LM beam search
    (`enc_dec_sconformer_v2.py:281-329`): the model's OWN cross-attention
    decoder scores the frame-synchronous CTC beam search as the fusion LM
    over the encoder's CTC posteriors (bos 0, blank = len(tokenizer)).

    The decoder is adapted through `HistoryLM`: each emitting frame issues
    ONE batched full-prefix decoder pass over the live beams (the reference
    wraps its decoder the same way via fake_forward; prefix lengths are
    bucketed to bound recompiles).  Returns the best beam's text."""
    import numpy as np

    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM

    out = model.apply(variables, jnp.asarray(audio_signal))
    if out.get("final_posteriors_ctc") is None:
        raise ValueError("ctc_beam_search needs use_ctc=True (CTC posteriors)")
    a_hidden, a_length = out["a_hidden"], out["length"]
    ctc_lp = np.asarray(out["final_posteriors_ctc"][0], np.float32)
    score = _internal_lm_score(model)

    def fn(histories):
        n = len(histories)
        U = max(16, -(-max(len(h) for h in histories) // 16) * 16)
        toks = np.zeros((n, U), np.int32)
        lens = np.zeros((n,), np.int32)
        for i, h in enumerate(histories):
            toks[i, : len(h)] = h
            lens[i] = len(h)
        return np.asarray(score(
            variables, a_hidden, a_length, jnp.asarray(toks),
            jnp.asarray(lens),
        ))

    search = FrameSyncBeamSearch(
        lm=HistoryLM(fn, bos_id=bos_id),
        tokenizer=tokenizer,
        beam_width=beam_width,
        alpha=alpha,
        beta=beta,
        blank_id=tokenizer.vocab_size(),
        prune_less_than_val=prune_less_than_val,
        top_am_threshold=top_am_threshold,
        bos_id=bos_id,
    )
    return search.run_search(ctc_lp, decode=True)


@functools.lru_cache(maxsize=None)
def _internal_lm_score(model):
    """Cached jitted internal-LM scorer for ctc_beam_search: a fresh
    per-recording closure (with a_hidden baked in as a constant) would
    retrace and recompile the cross-attention decoder for EVERY recording
    — the same defect _greedy_run's lru_cache exists to avoid.  Takes the
    encoder output as arguments so one compile per (n, U, T) bucket serves
    all recordings."""
    import jax

    @jax.jit
    def score(variables, a_hidden, a_length, tokens, lengths):
        # (n, U), (n,) → (n, V) next-token log-probs
        n = tokens.shape[0]
        ah = jnp.broadcast_to(a_hidden, (n,) + a_hidden.shape[1:])
        al = jnp.broadcast_to(a_length, (n,))
        logits = model.apply(
            variables, tokens, ah, al, method=model.generate_step
        )
        row = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1
        )[:, 0]
        return jax.nn.log_softmax(row.astype(jnp.float32), -1)

    return score

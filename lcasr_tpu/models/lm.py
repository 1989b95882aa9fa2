"""Causal transformer language model for CTC beam-search fusion.

The reference's LM rescoring uses an EXTERNAL package (`lming`, reference
`eval/tedlium/tlm_beam.py:5-6`); this first-party equivalent makes the
rescoring pipeline self-contained: a pre-norm causal transformer over the
same BPE vocab, trainable on transcript text, adapted into the beam search
via `decoding.beam_search.FlaxLMScorer`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.models.registry import register_model
from lcasr_tpu.ops.attention import NEG_INF
from lcasr_tpu.ops.mlp import ConformerFeedForward
from lcasr_tpu.ops.norms import get_norm
from lcasr_tpu.ops.rotary import RotaryEmbedding, apply_rotary, rotate_half


@register_model("TransformerLM")
class TransformerLM(nn.Module):
    vocab_size: int = 4095
    d_model: int = 512
    n_layers: int = 6
    n_heads: int = 8
    head_dim: int = 64
    rotary_base_freq: float = 10000.0
    default_norm: str = "rms_norm"
    # W8A8 int8 MXU projections (ops/qdense.py) — inference-only policy:
    # False | True | 'auto' | site names.  Measured a WASH at the rescoring
    # regime (the cached step is KV-scatter-bound, not GEMM-bound —
    # RESULTS_w8a8.json); kept as an opt-in for larger LMs where the GEMMs
    # dominate.  Beam scores shift by the quantization error, so rescoring
    # WER should be re-certified per model (closed-loop pattern) before
    # serving with it.
    quant_w8a8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        train: bool = False,
        cache: Optional[jnp.ndarray] = None,  # (L, 2, B, H, Nmax, D)
        cache_lengths: Optional[jnp.ndarray] = None,  # (B,)
        write_mask: Optional[jnp.ndarray] = None,  # (B,) bool
        pos_row: Optional[jnp.ndarray] = None,  # (B, Nmax) int32
        write_rows: Optional[jnp.ndarray] = None,  # (B,) int32
    ):
        """tokens (B, U) → logits (B, U, vocab).

        Incremental decoding (the reference beam search's per-beam KV caches,
        `ctc_beam_search.py:287-317`): pass `cache`/`cache_lengths` and ONE
        new token per row (U == 1); returns
        (logits (B, 1, vocab), new_cache, new_cache_lengths).  The cache is a
        fixed-size buffer in the reference's (L, KV, B, H, N, D) layout; rows
        write at their own `cache_lengths` position with per-row rotary
        offsets, so every beam continues at its true absolute position.

        `write_mask` (default all-True) fuses the caller's "advance this row"
        select into the per-row scatter: masked-off rows keep their cache and
        length EXACTLY (their logits are junk — callers ignore them).  The
        update is a B-row scatter, not a full-buffer where, so a wide-beam
        cache (GBs for rescore_many) is touched once per step instead of
        three full copies (gather + new_cache + outer select) — the outer
        select in decoding.frame_sync used to OOM the 200-row 20-min cache.

        `pos_row` (optional, (B, Nmax) int32): per-position ROW indirection
        for beam search — attention reads K/V at position n of row b from
        physical row `pos_row[b, n]` instead of b.  This lets a beam-search
        driver share a parent's cached prefix across forked children without
        ever permuting the buffer (the gather-copy a `cache[:, :, parent]`
        produces cannot alias a scan carry, which made the on-device search
        copy the whole cache EVERY frame — `decoding/frame_sync_device.py`).

        `write_rows` (optional, (B,) int32): physical row for row b's k/v
        write (default: b).  The beam-search driver allocates each write an
        UNREFERENCED cell so shared prefixes are never clobbered.  All
        writes go through scatter mode="drop" with masked-off rows routed
        out of bounds — pure in-place updates, no read-modify-write.
        """
        from lcasr_tpu.ops.qdense import (
            quant_dot_general, quant_site, resolve_quant_policy,
        )

        if resolve_quant_policy(self.quant_w8a8) and train:
            raise ValueError(
                "quant_w8a8 is inference-only (rint blocks gradients); "
                "build the training model without it"
            )
        dg_qkv = quant_dot_general(quant_site(self.quant_w8a8, "qkv"))
        dg_out = quant_dot_general(quant_site(self.quant_w8a8, "attn_out"))
        dg_head = quant_dot_general(quant_site(self.quant_w8a8, "lm_head"))
        Norm = get_norm(self.default_norm)
        B, U = tokens.shape
        H, D = self.n_heads, self.head_dim
        cached = cache is not None
        if cached:
            assert U == 1, "cached decoding feeds one token per row"

        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype, name="embed")(tokens)

        # rotary tables; cached rows rotate at their absolute positions
        inv_freq = 1.0 / (
            self.rotary_base_freq ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
        )
        if cached:
            pos = cache_lengths.astype(jnp.float32)[:, None]  # (B, 1)
            freqs = pos[..., None] * inv_freq  # (B, 1, D/2)
            emb = jnp.concatenate([freqs, freqs], -1)
            cos_q, sin_q = jnp.cos(emb)[:, :, None, :], jnp.sin(emb)[:, :, None, :]
        else:
            rotary = RotaryEmbedding(dim=D, base=self.rotary_base_freq, name="rotary")(U)
            causal = jnp.tril(jnp.ones((U, U), bool))[None, None]

        if cached:
            Nmax = cache.shape[4]
            rows = jnp.arange(B)
            if write_mask is None:
                write_mask = jnp.ones((B,), bool)
            # CONTRACT (unchanged): at cache_lengths == Nmax the write drops
            # silently — callers must bound steps host-side, as
            # decoding.frame_sync.CachedTransformerLM does
            put = write_mask & (cache_lengths < Nmax)
            pos = jnp.minimum(cache_lengths, Nmax - 1)
            # masked-off rows route out of bounds and the scatter drops them
            # (pure in-place update — no read-modify-write, and a scan can
            # carry the buffer without copies)
            w_rows = rows if write_rows is None else write_rows
            w_rows = jnp.where(put, w_rows, B)

        for i in range(self.n_layers):
            h = Norm(self.d_model, name=f"attn_norm_{i}")(x)
            qkv = nn.Dense(3 * H * D, use_bias=False, dtype=self.dtype,
                           dot_general=dg_qkv, name=f"qkv_{i}")(h)
            q, k, v = (a.reshape(B, U, H, D) for a in jnp.split(qkv, 3, -1))
            if cached:
                q = q * cos_q + rotate_half(q) * sin_q
                k = k * cos_q + rotate_half(k) * sin_q
                # write the new k/v at each row's own cache position: a
                # (B, H, D) scatter, in place (masked rows dropped via the
                # out-of-bounds w_rows)
                cache = cache.at[i, 0, w_rows, :, pos].set(
                    k[:, 0].astype(cache.dtype), mode="drop"
                )
                cache = cache.at[i, 1, w_rows, :, pos].set(
                    v[:, 0].astype(cache.dtype), mode="drop"
                )
                if pos_row is not None:
                    idx = pos_row[:, None, :, None]
                    k_buf = jnp.take_along_axis(cache[i, 0], idx, axis=0)
                    v_buf = jnp.take_along_axis(cache[i, 1], idx, axis=0)
                else:
                    k_buf = cache[i, 0]
                    v_buf = cache[i, 1]
                s = jnp.einsum(
                    "bthd,bhsd->bhts",
                    q.astype(jnp.float32) * D ** -0.5,
                    k_buf.astype(jnp.float32),
                )
                visible = (
                    jnp.arange(Nmax)[None, :] <= cache_lengths[:, None]
                )[:, None, None, :]
                s = jnp.where(visible, s, NEG_INF)
                p = jax.nn.softmax(s, -1)
                o = jnp.einsum(
                    "bhts,bhsd->bthd", p, v_buf.astype(jnp.float32)
                ).astype(x.dtype)
            else:
                q, k = apply_rotary(q, k, *rotary)
                s = jnp.einsum(
                    "bthd,bshd->bhts", q.astype(jnp.float32) * D ** -0.5, k.astype(jnp.float32)
                )
                s = jnp.where(causal, s, NEG_INF)
                p = jax.nn.softmax(s, -1)
                o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32)).astype(x.dtype)
            x = x + nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                             dot_general=dg_out, name=f"out_{i}")(
                o.reshape(B, U, H * D)
            )
            h = Norm(self.d_model, name=f"ff_norm_{i}")(x)
            x = x + ConformerFeedForward(
                self.d_model,
                quant_w8a8=quant_site(self.quant_w8a8, "ff"),
                dtype=self.dtype,
                name=f"ff_{i}",
            )(h)

        x = Norm(self.d_model, name="norm_out")(x)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype, dot_general=dg_head,
                          name="lm_head")(x)
        if cached:
            return logits, cache, cache_lengths + write_mask.astype(cache_lengths.dtype)
        return logits


def lm_loss(model, variables, tokens: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
    """Next-token CE over valid positions; tokens include bos."""
    logits = model.apply(variables, tokens)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    if lengths is not None:
        valid = jnp.arange(targets.shape[1])[None, :] < (lengths - 1)[:, None]
        return jnp.where(valid, ce, 0.0).sum() / jnp.maximum(valid.sum(), 1)
    return ce.mean()


def make_lm_scorer(model, variables, bos_id: int = 2, pad_id: int = 0):
    """Build the batched `lm_scores` hook for BeamSearch."""
    import numpy as np

    from lcasr_tpu.decoding.beam_search import FlaxLMScorer

    variables = jax.device_put(variables)

    @jax.jit
    def fn(variables, tokens):
        return model.apply(variables, tokens)

    @jax.jit
    def fn_last(variables, tokens, last):
        logits = model.apply(variables, tokens)
        row = jnp.take_along_axis(
            logits, last[:, None, None], axis=1
        )[:, 0]  # (B, V): only the scored position leaves the device
        return jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)

    return FlaxLMScorer(
        lambda tokens: fn(variables, tokens),
        fn_last=lambda tokens, last: fn_last(variables, tokens, last),
        bos_id=bos_id, pad_id=pad_id,
    )

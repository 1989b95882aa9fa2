"""Attention ops: exact jnp reference implementation (the numerical oracle).

This mirrors the masking semantics of the reference's FlashAttention-2 usage
(reference `lcasr/components/attention.py:330-410` `attention_ref` and
`:448-551` `Attention`):

  * non-causal softmax attention, scale 1/sqrt(head_dim),
  * key-padding masking from per-sequence lengths,
  * optional local window (left, right) banding, where -1 = infinite;
    row i attends to columns j with  i - left <= j <= i + right
    (equal q/kv lengths — the only case this non-causal encoder uses),
  * fully-masked rows produce zeros (not NaN),
  * padded query rows are zeroed.

The Pallas flash-attention kernel (`lcasr_tpu.ops.flash_attention`) must match
this function; tests enforce allclose between the two.  fp32 softmax
statistics regardless of input dtype.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

NEG_INF = float(-1e30)


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool mask, True = valid."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def window_mask(
    seqlen_q: int, seqlen_k: int, window: Tuple[int, int]
) -> Optional[jnp.ndarray]:
    """(seqlen_q, seqlen_k) bool, True = inside the local window.

    window = (left, right), -1 meaning unbounded on that side.  Matches
    FlashAttention's `window_size` semantics for equal q/kv lengths
    (reference `attention.py:21-48` construct_local_mask with sk == sq).
    """
    left, right = window
    if left < 0 and right < 0:
        return None
    rows = jnp.arange(seqlen_q)[:, None]
    cols = jnp.arange(seqlen_k)[None, :]
    ok = jnp.ones((seqlen_q, seqlen_k), dtype=bool)
    if right >= 0:
        ok &= cols <= rows + right
    if left >= 0:
        ok &= cols >= rows - left
    return ok


def reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_lengths: Optional[jnp.ndarray] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    return_weights: bool = False,
):
    """Exact softmax attention oracle.

    q: (B, Tq, H, D); k, v: (B, Tk, H, D)  →  (B, Tq, H, D)
    """
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    out_dtype = q.dtype

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    scores = jnp.einsum("bthd,bshd->bhts", qf, kf)  # (B, H, Tq, Tk)

    valid = jnp.ones((B, 1, Tq, Tk), dtype=bool)
    if kv_lengths is not None:
        valid &= length_mask(kv_lengths, Tk)[:, None, None, :]
    wm = window_mask(Tq, Tk, window)
    if wm is not None:
        valid = valid & wm[None, None, :, :]

    scores = jnp.where(valid, scores, NEG_INF)
    # stable softmax; fully-masked rows → zeros
    m = scores.max(-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(valid, e, 0.0)
    denom = e.sum(-1, keepdims=True)
    probs = e / jnp.maximum(denom, 1e-37)

    out = jnp.einsum("bhts,bshd->bthd", probs, vf)
    if q_lengths is not None:
        qmask = length_mask(q_lengths, Tq)
        out = jnp.where(qmask[:, :, None, None], out, 0.0)
    out = out.astype(out_dtype)
    if return_weights:
        return out, probs
    return out

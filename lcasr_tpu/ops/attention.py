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

import jax
import jax.numpy as jnp

NEG_INF = float(-1e30)


def length_mask(lengths: jnp.ndarray, max_len: int, offset=0) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool mask, True = valid.

    `offset` shifts the positions (global coordinates of a sequence shard
    under context parallelism)."""
    return (offset + jnp.arange(max_len))[None, :] < lengths[:, None]


def window_mask(
    seqlen_q: int, seqlen_k: int, window: Tuple[int, int], q_offset=0
) -> Optional[jnp.ndarray]:
    """(seqlen_q, seqlen_k) bool, True = inside the local window.

    window = (left, right), -1 meaning unbounded on that side.  Matches
    FlashAttention's `window_size` semantics for equal q/kv lengths
    (reference `attention.py:21-48` construct_local_mask with sk == sq).
    `q_offset` places the query rows at global coordinates (context-parallel
    query shards against full-length keys).
    """
    left, right = window
    if left < 0 and right < 0:
        return None
    rows = q_offset + jnp.arange(seqlen_q)[:, None]
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
    q_offset=0,
):
    """Exact softmax attention oracle.

    q: (B, Tq, H, D); k, v: (B, Tk, H, D)  →  (B, Tq, H, D)
    `q_offset`: global index of query row 0 (context-parallel shards).
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
    wm = window_mask(Tq, Tk, window, q_offset=q_offset)
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
        qmask = length_mask(q_lengths, Tq, offset=q_offset)
        out = jnp.where(qmask[:, :, None, None], out, 0.0)
    out = out.astype(out_dtype)
    if return_weights:
        return out, probs
    return out


def banded_attention_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_lengths: Optional[jnp.ndarray] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (0, 0),
    softmax_scale: Optional[float] = None,
    q_offset=0,
    chunk: int = 512,
) -> jnp.ndarray:
    """Windowed attention with O(chunk · band) score memory.

    Exact non-Pallas path for LONG banded sequences (the jnp oracle
    materializes the full (Tq, Tk) score matrix — infeasible at 45k+ tokens).
    Queries are processed in `chunk`-row blocks via `lax.map`; each block
    attends only to its dynamically-sliced KV band.  Matches
    `reference_attention` exactly inside the band; requires a finite window
    on both sides.
    """
    left, right = window
    assert left >= 0 and right >= 0, "banded path needs a finite window"
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    chunk = min(chunk, Tq)
    n_chunks = -(-Tq // chunk)
    Tq_pad = n_chunks * chunk
    if Tq_pad != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tq_pad - Tq), (0, 0), (0, 0)))
    band = left + right + chunk  # kv slice length per q chunk
    band = min(band, Tk)
    q_off = jnp.asarray(q_offset, jnp.int32)

    def one_chunk(ci):
        qs = jax.lax.dynamic_slice_in_dim(q, ci * chunk, chunk, axis=1)
        g0 = q_off + ci * chunk  # global row index of this chunk's row 0
        k0 = jnp.clip(g0 - left, 0, Tk - band)
        ks = jax.lax.dynamic_slice_in_dim(k, k0, band, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(v, k0, band, axis=1)
        # global coords: rows at g0+r, cols at k0+c
        qf = qs.astype(jnp.float32) * (
            softmax_scale if softmax_scale is not None else D ** -0.5
        )
        scores = jnp.einsum("bthd,bshd->bhts", qf, ks.astype(jnp.float32))
        rows = g0 + jnp.arange(chunk)[:, None]
        cols = k0 + jnp.arange(band)[None, :]
        valid = (cols <= rows + right) & (cols >= rows - left)
        if kv_lengths is not None:
            valid = valid[None] & (cols[None] < kv_lengths[:, None, None])
            valid = valid[:, None]  # (B, 1, chunk, band)
        else:
            valid = valid[None, None]
        scores = jnp.where(valid, scores, NEG_INF)
        m = scores.max(-1, keepdims=True)
        e = jnp.where(valid, jnp.exp(scores - m), 0.0)
        probs = e / jnp.maximum(e.sum(-1, keepdims=True), 1e-37)
        out = jnp.einsum("bhts,bshd->bthd", probs, vs.astype(jnp.float32))
        if q_lengths is not None:
            qmask = rows[None] < q_lengths[:, None, None]  # (B, chunk, 1)
            out = jnp.where(qmask[..., None], out, 0.0)
        return out

    outs = jax.lax.map(one_chunk, jnp.arange(n_chunks))  # (n, B, chunk, H, D)
    out = jnp.moveaxis(outs, 0, 1).reshape(B, Tq_pad, H, D)[:, :Tq]
    return out.astype(q.dtype)

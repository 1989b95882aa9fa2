"""Pallas TPU flash attention: non-causal, length-masked, optionally windowed.

This is the TPU-native replacement for FlashAttention-2 as the reference uses
it (reference `lcasr/components/attention.py:167-257,448-551`):

  * exact softmax attention, O(T) memory, bidirectional (non-causal),
  * per-sequence key/query length masking replacing the unpad/cu_seqlens
    varlen path (reference `:527-530`) — padded positions never contribute
    and padded query rows return zeros (same contract as the jnp oracle),
  * local window banding `(left, right)` for the windowed-attention eval mode
    (reference `:321-328,466-475`), with out-of-band KV blocks skipped
    entirely (block-sparse compute skip),
  * fp32 online-softmax statistics, bf16/fp32 inputs,
  * full custom-VJP backward (dq via kv-loop kernel, dk/dv via q-loop kernel),
    exact at 120k+ query lengths.

Grid layout: (batch, heads, q_blocks, kv_blocks) with the kv axis innermost
("arbitrary" semantics) accumulating into VMEM scratch — q/kv tiles stream
HBM→VMEM via the pallas pipeline, the (BQ, BK) score tile lives only in
VMEM, and the MXU sees [BQ,D]x[D,BK] + [BQ,BK]x[BK,D] matmuls.  The log-sum-
exp residual is stored compactly as (B, H, nQ, BQ) (one fp32 per query row).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# tuned on v5e at 46k tokens, D=128 (benchmarks/RESULTS_r2_kernels.jsonl):
# (512, 1024) gives 134 TFLOP/s fwd / 92 bwd vs 78/70 at (512, 512);
# (1024, 1024) exceeds the 16 MB VMEM scoped limit
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fit_blocks(block_q: int, block_k: int, D: int) -> Tuple[int, int]:
    """Scale the default block sizes down for head dims past the tuned
    D=128: the kernel working set grows linearly in D (q/k/v/do tiles plus
    fp32 scratch), and (512, 1024) already sits near the 16 MB VMEM scoped
    limit at D=128.  Keeps multiples of 128 for MXU/lane alignment."""
    if D > 128:
        shrink = _cdiv(D, 128)  # ceil: D=192 must shrink like D=256, not keep
        # the full near-VMEM-limit blocks tuned for D=128
        block_k = max(128, (block_k // shrink) // 128 * 128)
        block_q = max(128, (block_q // shrink) // 128 * 128)
    return block_q, block_k


def _block_in_band(q_start, k_start, block_q, block_k, window, q_hi, kv_hi):
    """Whole-tile skip predicate (block-sparse window skip).

    `q_hi` / `kv_hi` are the GLOBAL bounds on valid rows / columns — already
    clamped to the local (unpadded) extents by the callers, so zero-padded
    rows/columns of a mid-ring shard never pass even when their global index
    is below the sequence length."""
    left, right = window
    in_band = k_start < kv_hi
    in_band = jnp.logical_and(in_band, q_start < q_hi)
    if left >= 0:
        in_band = jnp.logical_and(in_band, k_start + block_k - 1 >= q_start - left)
    if right >= 0:
        in_band = jnp.logical_and(in_band, k_start <= q_start + block_q - 1 + right)
    return in_band


def _apply_score_masks(s, q_start, k_start, block_q, block_k, window, kv_hi):
    """Masking as ADDITIVE biases on the fp32 score tile — no boolean mask
    tensors, no data-dependent branching (an in-kernel `lax.cond` was
    measured to halve throughput by blocking Mosaic's pipeline):

      * column validity: a (1, BK) bias broadcast-added (cols ≥ kv_hi →
        NEG_INF),
      * window banding: the relative-position tile is a CONSTANT iota plus
        the scalar (q_start − k_start), so the band costs ~3 vector ops.

    Row validity is handled by the callers (a (BQ, 1) multiplier / select),
    NOT here — biased scores on invalid rows stay finite and are zeroed
    after the exp."""
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    s = s + jnp.where(cols < kv_hi, 0.0, NEG_INF)
    left, right = window
    if left >= 0 or right >= 0:
        rel = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            - jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            + (q_start - k_start)
        )  # rows − cols in global coordinates
        band = None
        if right >= 0:
            band = rel >= -right
        if left >= 0:
            cond = rel <= left
            band = cond if band is None else jnp.logical_and(band, cond)
        s = s + jnp.where(band, 0.0, NEG_INF)
    return s


def _row_valid(q_start, block_q, q_len):
    """(BQ, 1) bool: global query row < q_len."""
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    return rows < q_len


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel_db(
    lengths_ref,  # scalar-prefetch SMEM (B,)
    qoff_ref,  # scalar-prefetch SMEM (2,)
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D)
    v_ref,  # (1, 1, BK, D)
    o_ref,  # (1, 1, BQ, D)
    lse_ref,  # (1, 1, BQ, 128)
    acc_ref,  # VMEM (BQ, D) f32
    m_ref,  # VMEM (BQ, 128) f32
    l_ref,  # VMEM (BQ, 128) f32
    s_scr,  # VMEM (2*BQ, BK) f32 — ping-pong RAW score tiles
    v_scr,  # VMEM (2*BK, D) — ping-pong v tiles
    *,
    block_q: int,
    block_k: int,
    window: Tuple[int, int],
    num_k_blocks: int,  # REAL kv blocks; the grid runs num_k_blocks + 1 steps
    q_extent: int = 0,
    kv_extent: int = 0,
):
    """Cross-step double-buffered forward (non-banded path): grid step ki
    ISSUES tile ki's q·kᵀ on the MXU and (in the same body) runs the VPU
    softmax chain + p·v for tile ki−1 from VMEM scratch — so the serial
    s→exp→p·v dependency never stalls the MXU between steps (the r2 kernel
    only overlapped the two HALVES of one tile).  One extra grid step drains
    the pipeline.  Scratch is PING-PONG (slot = ki & 1) so the stage-A write
    and the stage-B read never alias and Mosaic is free to overlap them.
    In-band blocks form a CONTIGUOUS RANGE of the kv loop (a prefix when
    unwindowed), and the ping-pong schedule works for any subset: a tile is
    processed at step ki iff it was issued at step ki−1, under the same
    band predicate."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * block_q + qoff_ref[0]
    q_len = lengths_ref[b]
    kv_hi = jnp.minimum(q_len, qoff_ref[1] + kv_extent)
    q_hi = jnp.minimum(q_len, qoff_ref[0] + q_extent)

    # the FULL band predicate (incl. the window limbs), same as _fwd_kernel:
    # a fully out-of-band tile must be SKIPPED, not processed — processing
    # one feeds an all-NEG_INF score tile to the online softmax, whose
    # running max then makes exp(s - m) = 1 at the masked maximum and the
    # tile contributes garbage instead of nothing
    cur_k_start = ki * block_k + qoff_ref[1]
    cur_in_band = jnp.logical_and(
        ki < num_k_blocks,
        _block_in_band(q_start, cur_k_start, block_q, block_k, window, q_hi, kv_hi),
    )
    prev_k_start = cur_k_start - block_k
    prev_in_band = jnp.logical_and(
        ki >= 1,
        _block_in_band(q_start, prev_k_start, block_q, block_k, window, q_hi, kv_hi),
    )
    cur_slot = jax.lax.rem(ki, 2)
    prev_slot = 1 - cur_slot

    # stage B (VPU + one MXU matmul): the PREVIOUS tile's softmax, from the
    # other ping-pong slot
    @pl.when(prev_in_band)
    def _process():
        s = _apply_score_masks(
            s_scr[pl.ds(prev_slot * block_q, block_q)],
            q_start, prev_k_start, block_q, block_k, window, kv_hi,
        )
        vp = v_scr[pl.ds(prev_slot * block_k, block_k)]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        row_ok = _row_valid(q_start, block_q, q_hi).astype(jnp.float32)
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        p = jnp.exp(s - m_new) * row_ok
        corr = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = l_prev * corr + p.sum(axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, 0:1] = m_new

    # stage A (MXU): this tile's raw scores into its slot — no data
    # dependency on stage B, different slot → freely overlappable
    @pl.when(cur_in_band)
    def _issue():
        s_scr[pl.ds(cur_slot * block_q, block_q)] = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v_scr[pl.ds(cur_slot * block_k, block_k)] = v_ref[0, 0]

    @pl.when(ki == num_k_blocks)
    def _finalize():
        l = l_ref[:, 0:1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        out = jnp.where(l > 0.0, acc_ref[:] / safe_l, 0.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:, 0:1] + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, 128))


def _fwd_kernel(
    lengths_ref,  # scalar-prefetch SMEM (B,)
    qoff_ref,  # scalar-prefetch SMEM (2,): [q-row offset, kv-col offset]
    q_ref,  # (1, 1, BQ, D)
    k_ref,  # (1, 1, BK, D)
    v_ref,  # (1, 1, BK, D)
    o_ref,  # (1, 1, BQ, D)
    lse_ref,  # (1, 1, BQ, 128) row-broadcast LSE (layout matches jax's own
              # pallas flash attention l/m residuals: MIN_BLOCK_SIZE lanes)
    acc_ref,  # VMEM scratch (BQ, D) f32
    m_ref,  # VMEM scratch (BQ, 128) f32
    l_ref,  # VMEM scratch (BQ, 128) f32
    *,
    block_q: int,
    block_k: int,
    window: Tuple[int, int],
    num_k_blocks: int,
    banded: bool = False,
    q_extent: int = 0,  # local UNPADDED q length; bounds valid rows
    kv_extent: int = 0,  # local UNPADDED KV length; bounds valid columns
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * block_q + qoff_ref[0]
    if banded:
        # kv grid iterates only the window band; recover the VIRTUAL global
        # block index (matches the index_map).  Virtual indices past the
        # local KV extent get a clamped DMA — the extent check below rejects
        # them so a duplicate block never contributes.
        left = window[0]
        start_blk = jnp.maximum(0, q_start - left - qoff_ref[1]) // block_k
        k_start = (start_blk + ki) * block_k + qoff_ref[1]
    else:
        k_start = ki * block_k + qoff_ref[1]
    q_len = lengths_ref[b]
    # bounds clamped to the UNPADDED local extents unconditionally: under a
    # nonzero kv/q offset (ring / context parallel) zero-padded local
    # rows/columns land at globally-valid indices, so the global length
    # alone would let padded keys into the softmax (and padded NEG_INF-lse
    # q rows NaN-poison the backward)
    kv_hi = jnp.minimum(q_len, qoff_ref[1] + kv_extent)
    q_hi = jnp.minimum(q_len, qoff_ref[0] + q_extent)

    @pl.when(_block_in_band(q_start, k_start, block_q, block_k, window, q_hi, kv_hi))
    def _compute():
        # matmuls run in the INPUT dtype (bf16 on the training path) with fp32
        # accumulation — the MXU's native mode.  q arrives PRE-SCALED by the
        # softmax scale (folded in once outside the kernel), so the score tile
        # needs no per-element multiply.  Softmax statistics stay fp32.
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]

        m_prev = m_ref[:, 0:1]  # (BQ, 1)
        l_prev = l_ref[:, 0:1]
        # the kv tile is processed as independent HALVES: the VPU softmax of
        # one half overlaps the MXU matmuls of the other (measured ~+10% —
        # within a half the s→exp→p·v chain serializes MXU and VPU phases)
        n_split = 2 if block_k >= 512 else 1
        half = block_k // n_split
        row_ok = _row_valid(q_start, block_q, q_hi).astype(jnp.float32)

        ss = []
        for j in range(n_split):
            sj = jax.lax.dot_general(
                q, k[j * half : (j + 1) * half], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, half) f32
            ss.append(_apply_score_masks(
                sj, q_start, k_start + j * half, block_q, half, window, kv_hi
            ))
        m_new = m_prev
        for sj in ss:
            m_new = jnp.maximum(m_new, sj.max(axis=1, keepdims=True))
        # invalid query rows keep FINITE biased scores; the (BQ, 1) row
        # multiplier zeroes their p so l stays 0 → zero output rows + -inf lse
        ps = [jnp.exp(sj - m_new) * row_ok for sj in ss]
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr
        acc = acc_ref[:] * corr
        for j, pj in enumerate(ps):
            l_new = l_new + pj.sum(axis=1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                pj.astype(v.dtype), v[j * half : (j + 1) * half],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc
        # single-lane stores (writing all 128 lanes costs ~128 vreg writes
        # per step — measurable at 1 step/µs)
        m_ref[:, 0:1] = m_new
        l_ref[:, 0:1] = l_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_ref[:, 0:1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        out = jnp.where(l > 0.0, acc_ref[:] / safe_l, 0.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:, 0:1] + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, 128))


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention_bhtd(
    q: jnp.ndarray,  # (B, H, Tq, D), Tq a multiple of the block sizes
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32 global kv lengths
    q_offset: jnp.ndarray,  # (2,) int32 [q-row offset, kv-col offset] (context parallel)
    window: Tuple[int, int],
    scale: float,
    block_q: int,
    block_k: int,
    q_extent: int,  # UNPADDED local q length (static)
    kv_extent: int,  # UNPADDED local kv length (static)
) -> jnp.ndarray:
    o, _ = _fwd(q, k, v, lengths, q_offset, window, scale, block_q, block_k,
                q_extent, kv_extent)
    return o


def _fwd(q, k, v, lengths, q_offset, window, scale, block_q, block_k,
         q_extent=None, kv_extent=None):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    if q_extent is None:
        q_extent = Tq
    if kv_extent is None:
        kv_extent = Tk
    nQ, nK = Tq // block_q, Tk // block_k
    # fold the softmax scale into q once (saves a per-element multiply on
    # every (BQ, BK) score tile inside the kernel); the backward recomputes
    # scores from the SAME scaled q so fwd/bwd see identical logits
    q = q * jnp.asarray(scale, q.dtype)

    left, right = window
    banded = left >= 0 and right >= 0
    if banded:
        # only iterate kv blocks that can intersect the band — DMA skip,
        # O(T·band) traffic instead of O(T²/block)
        nK_band = min(nK, _cdiv(left + right + block_q, block_k) + 1)
    else:
        nK_band = nK

    import os

    # cross-step double buffering (VERDICT r2 #9 stretch): measured 70.7 ms
    # = 92 TF/s at 46k tokens vs the production kernel's 57.7 ms / 113 TF/s
    # in the same amortized harness — the full (BQ, BK) f32 score tile's
    # round trip through VMEM scratch costs more than the cross-step overlap
    # buys (the production kernel's register-resident half-split overlap
    # wins).  Kept as an opt-in experiment; default OFF.
    use_db = (
        not banded
        and os.environ.get("LCASR_ATTN_FWD_DB", "0") == "1"
    )
    if use_db:
        # cross-step double-buffered kernel: one extra (drain) grid step,
        # kv index clamped on it
        kernel = functools.partial(
            _fwd_kernel_db,
            block_q=block_q,
            block_k=block_k,
            window=window,
            num_k_blocks=nK,
            q_extent=q_extent,
            kv_extent=kv_extent,
        )
        grid = (B, H, nQ, nK + 1)

        def kv_index(b, h, qi, ki, *s):
            return (b, h, jnp.minimum(ki, nK - 1), 0)

        scratch = [
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((2 * block_q, block_k), jnp.float32),
            pltpu.VMEM((2 * block_k, D), v.dtype),
        ]
    else:
        kernel = functools.partial(
            _fwd_kernel,
            block_q=block_q,
            block_k=block_k,
            window=window,
            num_k_blocks=nK_band,
            banded=banded,
            q_extent=q_extent,
            kv_extent=kv_extent,
        )
        grid = (B, H, nQ, nK_band)
        if banded:
            def kv_index(b, h, qi, ki, lens, offs):
                start_blk = jnp.maximum(0, qi * block_q + offs[0] - left - offs[1]) // block_k
                return (b, h, jnp.minimum(start_blk + ki, nK - 1), 0)
        else:
            def kv_index(b, h, qi, ki, *s):
                return (b, h, ki, 0)
        scratch = [
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]

    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *s: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *s: (b, h, qi, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, 128), lambda b, h, qi, ki, *s: (b, h, qi, 0)
                ),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lengths, q_offset, q, k, v)
    return o, lse  # lse kept in (B, H, Tq, 128) residual layout


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(
    lengths_ref,
    qoff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *,
    block_q: int,
    block_k: int,
    window: Tuple[int, int],
    num_k_blocks: int,
    banded: bool = False,
    q_extent: int = 0,
    kv_extent: int = 0,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = qi * block_q + qoff_ref[0]
    if banded:
        left = window[0]
        start_blk = jnp.maximum(0, q_start - left - qoff_ref[1]) // block_k
        k_start = (start_blk + ki) * block_k + qoff_ref[1]
    else:
        k_start = ki * block_k + qoff_ref[1]
    # two DISTINCT bounds (mirroring the forward), BOTH clamped to the
    # unpadded local extents: the column bound rejects zero-padded keys at
    # globally-valid indices (and clamped virtual band blocks); the row bound
    # rejects zero-padded NEG_INF-lse q rows of a mid-ring shard whose global
    # index is still < q_len (exp(s+1e30) = inf would NaN-poison dq).
    q_len = lengths_ref[b]
    kv_hi = jnp.minimum(q_len, qoff_ref[1] + kv_extent)
    q_hi = jnp.minimum(q_len, qoff_ref[0] + q_extent)

    @pl.when(_block_in_band(q_start, k_start, block_q, block_k, window, q_hi, kv_hi))
    def _compute():
        # bf16 MXU matmuls with fp32 accumulation; q arrives pre-scaled
        # (dq therefore needs a final *scale OUTSIDE the kernel — done by
        # _bwd_rule), interior tiles skip masking (see _fwd_kernel notes)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]  # (BQ, 1)
        delta = delta_ref[0, 0][:, 0:1]

        row_ok = _row_valid(q_start, block_q, q_hi)
        # invalid rows carry lse = NEG_INF → exp overflows to +inf there; a
        # SELECT (not a multiply) discards it without inf·0=NaN.  n_split=1:
        # the fwd-style kv-half overlap split measured SLOWER here (128→141 ms
        # at 46k tokens) — bwd is already matmul-dense enough that the extra
        # mask/exp passes cost more than the overlap buys
        n_split = 1
        half = block_k // n_split
        dq = dq_acc[:]
        for j in range(n_split):
            kj = k[j * half : (j + 1) * half]
            s = jax.lax.dot_general(
                q, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = _apply_score_masks(
                s, q_start, k_start + j * half, block_q, half, window, kv_hi
            )
            p = jnp.where(row_ok, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                do, v[j * half : (j + 1) * half], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, half)
            ds = p * (dp - delta)
            dq = dq + jax.lax.dot_general(
                ds.astype(kj.dtype), kj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dq_acc[:] = dq

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lengths_ref,
    qoff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    block_q: int,
    block_k: int,
    window: Tuple[int, int],
    num_q_blocks: int,
    banded: bool = False,
    q_extent: int = 0,
    kv_extent: int = 0,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k_start = ki * block_k + qoff_ref[1]
    if banded:
        # q band reachable from this kv block: [k_start - right, ...]
        right = window[1]
        start_blk = jnp.maximum(0, k_start - right - qoff_ref[0]) // block_q
        q_start = (start_blk + qi) * block_q + qoff_ref[0]
    else:
        q_start = qi * block_q + qoff_ref[0]
    kv_len = lengths_ref[b]
    # q-row bound clamped to the unpadded local q extent unconditionally:
    # banded mode needs it because kqspec_q_band clamps out-of-extent virtual
    # q-block indices to nQ-1 (duplicate data would pollute dk/dv), and ANY
    # mode needs it under a nonzero q offset, where zero-padded NEG_INF-lse
    # q rows land at globally-valid indices (exp → inf → NaN).  The column
    # bound is symmetric (padded key columns are merely wasted work here —
    # their dk/dv rows are sliced off — but the clamp keeps them maskless).
    q_hi = jnp.minimum(kv_len, qoff_ref[0] + q_extent)
    kv_hi = jnp.minimum(kv_len, qoff_ref[1] + kv_extent)

    @pl.when(_block_in_band(q_start, k_start, block_q, block_k, window, q_hi, kv_hi))
    def _compute():
        # bf16 MXU matmuls with fp32 accumulation; q arrives pre-scaled, so
        # dk = ds^T @ (scale*q) is ALREADY the true gradient (no epilogue);
        # interior tiles skip masking (see _fwd_kernel notes)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]  # (BQ, 1)
        delta = delta_ref[0, 0][:, 0:1]

        # the row select also guards lse=-inf rows (inf·0=NaN).  n_split=1:
        # q-half overlap split measured slower here (see _bwd_dq_kernel note)
        n_split = 1
        half = block_q // n_split
        dk = dk_acc[:]
        dv = dv_acc[:]
        for j in range(n_split):
            qj = q[j * half : (j + 1) * half]
            doj = do[j * half : (j + 1) * half]
            lsej = lse[j * half : (j + 1) * half]
            deltaj = delta[j * half : (j + 1) * half]
            s = jax.lax.dot_general(
                qj, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (half, BK)
            s = _apply_score_masks(
                s, q_start + j * half, k_start, half, block_k, window, kv_hi
            )
            p = jnp.where(
                _row_valid(q_start + j * half, half, q_hi),
                jnp.exp(s - lsej), 0.0,
            )
            dv = dv + jax.lax.dot_general(
                p.astype(doj.dtype), doj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BK, D)
            dp = jax.lax.dot_general(
                doj, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - deltaj)
            dk = dk + jax.lax.dot_general(
                ds.astype(qj.dtype), qj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BK, D)
        dk_acc[:] = dk
        dv_acc[:] = dv

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    lengths_ref,
    qoff_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dqi_ref,
    dqo_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    block_q: int,
    block_k: int,
    window: Tuple[int, int],
    num_q_blocks: int,
    q_extent: int = 0,
    kv_extent: int = 0,
):
    """One-pass backward (non-banded path): s/p/dp/ds computed ONCE per
    (kv, q) tile and consumed by all three gradients — 5 MXU matmuls per tile
    instead of the 7 the split dq/dkv kernels pay (each recomputes s, and dp
    is computed twice).  dk/dv accumulate in VMEM scratch over the inner q
    loop; dq accumulates in fp32 HBM through an input/output-aliased buffer
    (the gmm "existing_out" pattern) — each dq block is revisited once per kv
    block, nQ grid steps apart, so the write-back of visit ki completes long
    before the prefetch for visit ki+1 (callers guard nQ >= 4 AND verify the
    read-after-write property once per process on this hardware/compiler —
    see _fused_bwd_safe)."""
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k_start = ki * block_k + qoff_ref[1]
    q_start = qi * block_q + qoff_ref[0]
    kv_len = lengths_ref[b]
    # both bounds clamped to the unpadded local extents (see _bwd_dq_kernel)
    q_hi = jnp.minimum(kv_len, qoff_ref[0] + q_extent)
    kv_hi = jnp.minimum(kv_len, qoff_ref[1] + kv_extent)
    in_band = _block_in_band(q_start, k_start, block_q, block_k, window, q_hi, kv_hi)

    @pl.when(in_band)
    def _compute():
        # bf16 MXU matmuls, fp32 accumulation; q arrives pre-scaled (dk is
        # therefore exact as-is, dq needs *scale outside — see _bwd_impl)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, 0:1]  # (BQ, 1)
        delta = delta_ref[0, 0][:, 0:1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        s = _apply_score_masks(s, q_start, k_start, block_q, block_k, window, kv_hi)
        # the row SELECT also guards lse=-inf rows (exp→+inf; inf·0=NaN)
        p = jnp.where(_row_valid(q_start, block_q, q_hi), jnp.exp(s - lse), 0.0)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dqo_ref[0, 0] = dqi_ref[0, 0] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_not(in_band))
    def _carry():
        # the out window is written back unconditionally when its block
        # index changes — forward the accumulator or it reverts to garbage
        dqo_ref[0, 0] = dqi_ref[0, 0]

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _fwd_rule(q, k, v, lengths, q_offset, window, scale, block_q, block_k,
              q_extent, kv_extent):
    o, lse = _fwd(q, k, v, lengths, q_offset, window, scale, block_q, block_k,
                  q_extent, kv_extent)
    return o, (q, k, v, lengths, q_offset, o, lse)


def _bwd_rule(window, scale, block_q, block_k, q_extent, kv_extent, residuals, do):
    q, k, v, lengths, q_offset, o, lse = residuals
    return _bwd_impl(
        q, k, v, lengths, q_offset, o, lse, do, window, scale, block_q, block_k,
        q_extent, kv_extent,
    ) + (None, None)


# -- fused-backward safety gate ---------------------------------------------
# The one-pass fused kernel accumulates dq through an input/output-aliased
# HBM buffer: correctness relies on the write-back of a dq block (revisit
# distance nQ grid steps) completing before the pipeline prefetches it for
# the next visit.  That is an empirical property of Mosaic's pipeline depth,
# not an API guarantee (the interpreter demonstrably lacks read-your-writes
# through the alias), so we VERIFY it once per process on the actual
# hardware/compiler: a small nK>1 case is run through both the fused and the
# split kernels and compared; any future Mosaic prefetch change flips the
# gate to the (guaranteed-safe) split kernels instead of silently corrupting
# gradients.  LCASR_FUSED_ATTN_BWD=0 forces the split kernels outright.
_FUSED_BWD_STATE = {"checked": False, "ok": True}


def _fused_bwd_safe() -> bool:
    import os

    if os.environ.get("LCASR_FUSED_ATTN_BWD", "1") == "0":
        return False
    st = _FUSED_BWD_STATE
    if not st["checked"]:
        st["checked"] = True  # set first: the probe itself calls _bwd_impl
        try:
            st["ok"] = _probe_fused_bwd()
        except Exception as e:  # pragma: no cover - defensive
            print(f"flash_attention: fused-bwd probe failed ({e}); using split kernels")
            st["ok"] = False
        if not st["ok"]:
            print(
                "flash_attention: fused one-pass backward FAILED the aliased-"
                "accumulator read-after-write probe on this compiler — "
                "falling back to the split dq/dkv kernels"
            )
    return st["ok"]


def _probe_fused_bwd() -> bool:
    """Compare fused vs split backward on a tiny nK=4/nQ=4 case (one-time,
    ~100 ms including compile).

    The probe fires lazily — inside the first jit TRACE whose shapes take
    the fused path — so it must not stage into the enclosing trace: under
    omnistaging its jnp ops would become tracers and the comparisons raise
    ConcretizationTypeError, which the defensive except in
    `_fused_bwd_safe` used to swallow as "probe failed" — silently
    degrading every jitted training step to the split kernels.  Neither an
    inner `jax.jit` (inlined into the active trace) nor
    `ensure_compile_time_eval` (op-by-op eval; cannot run pallas_call)
    escapes a live trace, so the probe runs on a FRESH THREAD — JAX trace
    contexts are thread-local, and dispatch is thread-safe (regression
    test: tests/test_flash_attention.py::
    test_fused_bwd_probe_runs_inside_trace)."""
    import threading

    import numpy as np

    box: dict = {}

    def run():
        try:
            errs = np.asarray(jax.jit(_probe_fused_bwd_errs)())
            box["ok"] = bool(np.isfinite(errs).all() and (errs < 1e-3).all())
        except Exception as e:  # surfaced by the caller's except
            box["exc"] = e

    t = threading.Thread(target=run, name="lcasr-fused-bwd-probe")
    t.start()
    t.join()
    if "exc" in box:
        raise box["exc"]
    return box["ok"]


def _probe_fused_bwd_errs():
    """Relative fused-vs-split gradient errors on a tiny nK=4/nQ=4 case."""
    bq = bk = 128
    T = 4 * bk
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (3, 1, 1, T, 128), jnp.float32)
    q, k, v = qkv[0], qkv[1], qkv[2]
    lengths = jnp.full((1,), T, jnp.int32)
    qoff = jnp.zeros((2,), jnp.int32)
    o, lse = _fwd(q, k, v, lengths, qoff, (-1, -1), 1.0, bq, bk, T, T)
    do = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.float32)
    args = (q, k, v, lengths, qoff, o, lse, do, (-1, -1), 1.0, bq, bk, T, T)
    fused = _bwd_impl(*args, _mode="fused")
    split = _bwd_impl(*args, _mode="split")
    return jnp.stack([
        jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-6)
        for a, b in zip(fused, split)
    ])


def _bwd_impl(q, k, v, lengths, q_offset, o, lse, do, window, scale, block_q,
              block_k, q_extent=None, kv_extent=None, _mode="auto"):
    """Flash-attention backward on (B, H, T, D) blocks with an EXTERNAL
    (o, lse) pair — reused by the custom VJP and by ring attention, whose
    merged global lse makes per-KV-block gradient contributions exact."""
    # kernels recompute scores from the pre-scaled q (matching the forward);
    # dk comes out exact, dq needs the chain-rule *scale applied at the end
    q = q * jnp.asarray(scale, q.dtype)
    B, H, T, D = q.shape
    Tk = k.shape[2]
    if q_extent is None:
        q_extent = T
    if kv_extent is None:
        kv_extent = Tk
    nQ, nK = T // block_q, Tk // block_k
    left, right = window
    banded = left >= 0 and right >= 0
    nK_band = min(nK, _cdiv(left + right + block_q, block_k) + 1) if banded else nK
    nQ_band = min(nQ, _cdiv(left + right + block_k, block_q) + 1) if banded else nQ

    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1)  # (B,H,T)
    lse_q = lse  # already (B, H, T, 128)
    delta_q = jnp.broadcast_to(delta[..., None], (B, H, T, 128))

    use_fused = (
        not banded
        and not _interpret()
        and (
            _mode == "fused"
            or (_mode == "auto" and (nK == 1 or (nQ >= 4 and _fused_bwd_safe())))
        )
        and _mode != "split"
    )
    if use_fused:
        # one-pass fused kernel (see _bwd_fused_kernel); the banded path
        # keeps the split kernels — its clamped virtual q-block indices can
        # revisit a dq block on CONSECUTIVE steps, racing the aliased
        # accumulator (and the windowed backward is cheap anyway).  nK == 1
        # is always safe: every dq block is visited exactly once, so the
        # aliased accumulator is never revisited at all; with nK > 1 the
        # revisit distance is nQ grid steps and nQ >= 4 keeps the write-back
        # of visit ki strictly ahead of the prefetch for visit ki+1.  The
        # pallas INTERPRETER is also excluded: it re-reads the aliased dq
        # input from the original (zero) buffer on every visit instead of
        # the written-back output, so the accumulation silently drops all
        # but the last kv block (verified empirically; real-TPU pipelining
        # gives exact results — T=8192 oracle parity to 3e-4)
        fspec_q = lambda b, h, ki, qi, *s: (b, h, qi, 0)
        fspec_k = lambda b, h, ki, qi, *s: (b, h, ki, 0)
        dq32, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel,
                block_q=block_q, block_k=block_k, window=window,
                num_q_blocks=nQ, q_extent=q_extent, kv_extent=kv_extent,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, H, nK, nQ),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, D), fspec_q),
                    pl.BlockSpec((1, 1, block_k, D), fspec_k),
                    pl.BlockSpec((1, 1, block_k, D), fspec_k),
                    pl.BlockSpec((1, 1, block_q, D), fspec_q),
                    pl.BlockSpec((1, 1, block_q, 128), fspec_q),
                    pl.BlockSpec((1, 1, block_q, 128), fspec_q),
                    pl.BlockSpec((1, 1, block_q, D), fspec_q),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, block_q, D), fspec_q),
                    pl.BlockSpec((1, 1, block_k, D), fspec_k),
                    pl.BlockSpec((1, 1, block_k, D), fspec_k),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, D), jnp.float32),
                    pltpu.VMEM((block_k, D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
                jax.ShapeDtypeStruct((B, H, Tk, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, Tk, D), q.dtype),
            ],
            # dq accumulator: input 8 (2 scalar-prefetch + 6 tensors before
            # it) donated to output 0
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
            ),
            interpret=_interpret(),
        )(
            lengths, q_offset, q, k, v, do, lse_q, delta_q,
            jnp.zeros((B, H, T, D), jnp.float32),
        )
        dq = (dq32 * scale).astype(q.dtype)
        return dq, dk, dv

    qspec = lambda b, h, qi, ki, *s: (b, h, qi, 0)
    kspec = lambda b, h, qi, ki, *s: (b, h, ki, 0)
    qspec128 = lambda b, h, qi, ki, *s: (b, h, qi, 0)

    if banded:
        def kspec_band(b, h, qi, ki, lens, offs):
            start_blk = jnp.maximum(0, qi * block_q + offs[0] - left - offs[1]) // block_k
            return (b, h, jnp.minimum(start_blk + ki, nK - 1), 0)
    else:
        kspec_band = kspec

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            block_q=block_q, block_k=block_k, window=window,
            num_k_blocks=nK_band, banded=banded,
            q_extent=q_extent, kv_extent=kv_extent,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nQ, nK_band),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), qspec),
                pl.BlockSpec((1, 1, block_k, D), kspec_band),
                pl.BlockSpec((1, 1, block_k, D), kspec_band),
                pl.BlockSpec((1, 1, block_q, D), qspec),
                pl.BlockSpec((1, 1, block_q, 128), qspec128),
                pl.BlockSpec((1, 1, block_q, 128), qspec128),
            ],
            out_specs=[pl.BlockSpec((1, 1, block_q, D), qspec)],
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, T, D), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lengths, q_offset, q, k, v, do, lse_q, delta_q)[0]
    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype)

    kqspec_q = lambda b, h, ki, qi, *s: (b, h, qi, 0)
    kqspec_k = lambda b, h, ki, qi, *s: (b, h, ki, 0)
    kqspec128 = lambda b, h, ki, qi, *s: (b, h, qi, 0)
    if banded:
        def kqspec_q_band(b, h, ki, qi, lens, offs):
            start_blk = jnp.maximum(0, ki * block_k + offs[1] - right - offs[0]) // block_q
            return (b, h, jnp.minimum(start_blk + qi, nQ - 1), 0)
    else:
        kqspec_q_band = kqspec_q

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            block_q=block_q, block_k=block_k, window=window,
            num_q_blocks=nQ_band, banded=banded,
            q_extent=q_extent, kv_extent=kv_extent,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nK, nQ_band),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), kqspec_q_band),
                pl.BlockSpec((1, 1, block_k, D), kqspec_k),
                pl.BlockSpec((1, 1, block_k, D), kqspec_k),
                pl.BlockSpec((1, 1, block_q, D), kqspec_q_band),
                pl.BlockSpec((1, 1, block_q, 128), kqspec_q_band),
                pl.BlockSpec((1, 1, block_q, 128), kqspec_q_band),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D), kqspec_k),
                pl.BlockSpec((1, 1, block_k, D), kqspec_k),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tk, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tk, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lengths, q_offset, q, k, v, do, lse_q, delta_q)

    return dq, dk, dv


_flash_attention_bhtd.defvjp(_fwd_rule, _bwd_rule)


def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D) — Tk may exceed Tq (context parallel)
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    q_offset: Optional[jnp.ndarray] = None,
    kv_offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Public entry: (B, Tq, H, D) in, (B, Tq, H, D) out.

    Pads T up to a block multiple; padded keys AND padded query rows are
    masked via `lengths` (padded queries return zeros, matching
    `lcasr_tpu.ops.attention.reference_attention` with q_lengths=kv_lengths).

    `q_offset` (traced scalar) is the GLOBAL index of local row 0 — used by
    sequence-sharded (context-parallel) attention where each shard holds a
    slice of queries against the gathered K/V; window banding and length
    masks are evaluated in global coordinates.
    """
    B, T, H, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D ** -0.5

    # shrink blocks for short sequences (min 128 for MXU/lane alignment)
    block_q, block_k = _fit_blocks(block_q, block_k, D)
    t_pow2 = max(128, 1 << (max(T, k.shape[1]) - 1).bit_length())
    block_q = min(block_q, t_pow2)
    block_k = min(block_k, t_pow2)

    if lengths is None:
        lengths_arr = jnp.full((B,), k.shape[1], dtype=jnp.int32)
    else:
        lengths_arr = lengths.astype(jnp.int32)

    qt = jnp.swapaxes(q, 1, 2)  # (B, H, Tq, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    blk = max(block_q, block_k)
    T_pad = _cdiv(T, blk) * blk
    Tk = k.shape[1]
    Tk_pad = _cdiv(Tk, blk) * blk
    if T_pad != T:
        qt = _pad_to(qt, 2, T_pad)
    if Tk_pad != Tk:
        kt = _pad_to(kt, 2, Tk_pad)
        vt = _pad_to(vt, 2, Tk_pad)

    qo = jnp.zeros((), jnp.int32) if q_offset is None else jnp.asarray(q_offset, jnp.int32).reshape(())
    ko = jnp.zeros((), jnp.int32) if kv_offset is None else jnp.asarray(kv_offset, jnp.int32).reshape(())
    qoff = jnp.stack([qo, ko])

    out = _flash_attention_bhtd(
        qt, kt, vt, lengths_arr, qoff, window, scale, block_q, block_k, T, Tk
    )
    out = out[:, :, :T]
    return jnp.swapaxes(out, 1, 2)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    q_offset: Optional[jnp.ndarray] = None,
    kv_offset: Optional[jnp.ndarray] = None,
):
    """Forward-only variant returning (out, lse (B, H, Tq)) for cross-shard
    online-softmax merging (ring attention).  lse = -inf for fully-masked
    rows, so partial results combine exactly."""
    B, T, H, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    block_q, block_k = _fit_blocks(block_q, block_k, D)
    t_pow2 = max(128, 1 << (max(T, k.shape[1]) - 1).bit_length())
    block_q = min(block_q, t_pow2)
    block_k = min(block_k, t_pow2)
    if lengths is None:
        lengths_arr = jnp.full((B,), k.shape[1], dtype=jnp.int32)
    else:
        lengths_arr = lengths.astype(jnp.int32)
    qt, kt, vt = (jnp.swapaxes(a, 1, 2) for a in (q, k, v))
    blk = max(block_q, block_k)
    T_pad = _cdiv(T, blk) * blk
    Tk_pad = _cdiv(k.shape[1], blk) * blk
    if T_pad != T:
        qt = _pad_to(qt, 2, T_pad)
    if Tk_pad != k.shape[1]:
        kt = _pad_to(kt, 2, Tk_pad)
        vt = _pad_to(vt, 2, Tk_pad)
    qo = jnp.zeros((), jnp.int32) if q_offset is None else jnp.asarray(q_offset, jnp.int32).reshape(())
    ko = jnp.zeros((), jnp.int32) if kv_offset is None else jnp.asarray(kv_offset, jnp.int32).reshape(())
    o, lse128 = _fwd(
        qt, kt, vt, lengths_arr, jnp.stack([qo, ko]), window, scale,
        block_q, block_k, T, k.shape[1],
    )
    out = jnp.swapaxes(o[:, :, :T], 1, 2)
    return out, lse128[:, :, :T, 0]


def flash_attention_probs(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    rows: Optional[Tuple] = None,  # (start, n_rows); None = all rows
    q_offset: Optional[jnp.ndarray] = None,
    kv_offset: Optional[jnp.ndarray] = None,
    lse: Optional[jnp.ndarray] = None,  # (B, H, Tq) — reuse across row blocks
):
    """Row-blocked attention probabilities from the PRODUCTION kernel
    (VERDICT r4 #5; the TPU counterpart of the reference's
    CollectFlashAttentionProbs softmax reconstruction,
    `lcasr/components/attention.py:259-318`).

    The Pallas forward already emits its online-softmax log-sum-exp; the
    global probabilities of any query-row slice are then exactly
    ``p = exp(s − lse)`` with ``s`` recomputed for those rows only — the
    same scaled-q bf16 MXU product and the same global-coordinate
    column/window masks the kernel applies.  Memory is O(n_rows · Tk) per
    call, never O(T²): stream row blocks (pass ``lse`` back in to skip the
    kernel re-run) to analyze arbitrarily long sequences.

    Returns (B, H, n_rows, Tk) fp32 probabilities (rows past `lengths` are
    all-zero, matching `reference_attention(..., return_weights=True)`).
    `rows[0]` may be a traced scalar (scan-friendly); `rows[1]` is static.
    """
    B, T, H, D = q.shape
    Tk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    if lengths is None:
        lengths_arr = jnp.full((B,), Tk, dtype=jnp.int32)
    else:
        lengths_arr = lengths.astype(jnp.int32)
    if lse is None:
        _, lse = flash_attention_with_lse(
            q, k, v, lengths=lengths_arr, window=window, softmax_scale=scale,
            q_offset=q_offset, kv_offset=kv_offset,
        )
    start, n = rows if rows is not None else (0, T)
    qo = jnp.zeros((), jnp.int32) if q_offset is None else jnp.asarray(q_offset, jnp.int32).reshape(())
    ko = jnp.zeros((), jnp.int32) if kv_offset is None else jnp.asarray(kv_offset, jnp.int32).reshape(())

    qr = jax.lax.dynamic_slice_in_dim(q, start, n, axis=1)
    lse_r = jax.lax.dynamic_slice_in_dim(lse, start, n, axis=2)
    # the kernel folds the softmax scale into q IN q.dtype before the MXU
    # product (fp32 accumulation) — mirror both for numerical agreement
    qs = qr * jnp.asarray(scale, qr.dtype)
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", qs, k, preferred_element_type=jnp.float32
    )

    g_rows = qo + start + jnp.arange(n)  # global query coordinates
    g_cols = ko + jnp.arange(Tk)
    valid = (g_cols[None, None, None, :] < lengths_arr[:, None, None, None])
    valid &= (g_rows[None, None, :, None] < lengths_arr[:, None, None, None])
    left, right = window
    rel = g_rows[:, None] - g_cols[None, :]
    if right >= 0:
        valid &= (rel >= -right)[None, None]
    if left >= 0:
        valid &= (rel <= left)[None, None]
    # fully-masked rows carry lse = NEG_INF — exp(s − NEG_INF) would
    # overflow, and those rows must be all-zero anyway
    live_row = lse_r > NEG_INF / 2
    p = jnp.where(
        valid & live_row[..., None],
        jnp.exp(s - jnp.where(live_row, lse_r, 0.0)[..., None]),
        0.0,
    )
    return p


def flash_attention_bwd(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,
    o: jnp.ndarray,  # (B, Tq, H, D) — the MERGED output (e.g. across ring steps)
    lse: jnp.ndarray,  # (B, H, Tq) — merged log-sum-exp (NEG_INF on masked rows)
    do: jnp.ndarray,  # (B, Tq, H, D)
    lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    q_offset: Optional[jnp.ndarray] = None,
    kv_offset: Optional[jnp.ndarray] = None,
):
    """Backward pass with an external (o, lse) pair: returns (dq, dk, dv).

    Because p = exp(s − lse) is the GLOBAL attention probability when lse is
    the cross-block merged log-sum-exp, calling this once per KV block with
    the same merged (o, lse, do) yields exact per-block dk/dv and summable dq
    contributions — the ring-attention backward."""
    B, T, H, D = q.shape
    Tk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    block_q, block_k = _fit_blocks(block_q, block_k, D)
    t_pow2 = max(128, 1 << (max(T, Tk) - 1).bit_length())
    block_q = min(block_q, t_pow2)
    block_k = min(block_k, t_pow2)
    if lengths is None:
        lengths_arr = jnp.full((B,), Tk, dtype=jnp.int32)
    else:
        lengths_arr = lengths.astype(jnp.int32)

    qt, kt, vt, ot, dot_ = (jnp.swapaxes(a, 1, 2) for a in (q, k, v, o, do))
    blk = max(block_q, block_k)
    T_pad = _cdiv(T, blk) * blk
    Tk_pad = _cdiv(Tk, blk) * blk
    lse128 = jnp.broadcast_to(lse[..., None], (B, H, T, 128)).astype(jnp.float32)
    if T_pad != T:
        qt, ot, dot_ = (_pad_to(a, 2, T_pad) for a in (qt, ot, dot_))
        # padded q rows must carry NEG_INF lse so p stays 0 there
        lse128 = jnp.pad(lse128, ((0, 0), (0, 0), (0, T_pad - T), (0, 0)), constant_values=NEG_INF)
    if Tk_pad != Tk:
        kt = _pad_to(kt, 2, Tk_pad)
        vt = _pad_to(vt, 2, Tk_pad)

    qo = jnp.zeros((), jnp.int32) if q_offset is None else jnp.asarray(q_offset, jnp.int32).reshape(())
    ko = jnp.zeros((), jnp.int32) if kv_offset is None else jnp.asarray(kv_offset, jnp.int32).reshape(())
    dq, dk, dv = _bwd_impl(
        qt, kt, vt, lengths_arr, jnp.stack([qo, ko]), ot, lse128, dot_,
        window, scale, block_q, block_k, T, Tk,
    )
    dq = jnp.swapaxes(dq[:, :, :T], 1, 2)
    dk = jnp.swapaxes(dk[:, :, :Tk], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :Tk], 1, 2)
    return dq, dk, dv

"""Fused Pallas dw-striding conv-subsampling (the 8× front end).

TPU-native fusion of the reference's `ConvSubsampling` dw_striding chain
(reference `lcasr/components/subsampling.py:219-363`): one full 3×3
stride-2 conv to `conv_channels`, then two stages of [3×3 stride-2
depthwise → 1×1 pointwise], activation per stage.

Why a kernel: as separate XLA convs the chain is inter-op HBM-traffic
bound — stage 0 alone writes/rereads a (B, T/2, F/2, C) tensor (2.7 GB at
the 20-min decode shape (16, 16384, 80) bf16), ~17-23 ms measured on v5e
(PERFORMANCE.md).  Fused, the only HBM traffic is the (B, T, F) input and
the (B, T/8, F/8, C) output (~0.2 GB): everything between lives in VMEM.

Kernel design (one grid step = `To` output frames of one batch row).  The
governing constraint is MOSAIC RELAYOUTS: any reshape/stack that moves
data between the lane and sublane dims of a big intermediate costs more
than the convolution math (a first version built stage 0 as an im2col
stack of 9 tap planes — 9 minor-dim relayouts per tile — and measured
2.3× SLOWER than the XLA chain; strided minor-dim slices are equally
hostile, which is also why a pure-XLA tap rewrite measured 5.6× worse).
So the kernel is arranged to touch data only through contiguous slices
and matmuls:

  * the input tile arrives as (TW/4, 4, F+2) — time split into mod-4
    rows by FREE dim-splitting reshapes on the host (row-major order is
    preserved; nothing moves) — so each stage-0 tap is a contiguous
    row-slice of one of the four phase planes,
  * stage 0 (1→C channels) is SIX dense matmuls on the MXU — (rows, F+2)
    @ (F+2, 42·C) per (output-row parity × dt) — against a
    sparse-structured weight built from the 3×3 kernel outside the
    Pallas call: output column (f', c) holds k0[dt, φ−2f', c] at input
    row φ.  The weight's columns are ordered [freq-even | freq-odd] and
    include the stage-1 zero-pad freqs as all-zero columns, so the
    stage-1 depthwise taps become contiguous LANE-RANGE slices of the
    flat stage-0 output — no reshape of the big tensor at all.  The
    zero-pad columns stay exactly zero through bias+activation (bias is
    a flat row with zeros there; silu/relu/gelu all map 0→0),
  * the depthwise stages are 9 broadcast-FMAs on the VPU with
    lane-tiled weights (depthwise has no channel contraction, so the
    MXU can't help); the pointwise stages are (M, C)@(C, C) MXU GEMMs
    with fp32 accumulation,
  * stage 2 is 16× smaller than stage 0, so it uses plain pad +
    dim-split views; the residual relayouts there are on tiny tensors.

Halo math: output frame j needs input frames [8j−7, 8j+7], so a tile of
`To` output frames reads 8·To+14 input frames; tiles are cut with an
8-frame (phase-preserving) halo on each side, materialized host-side by
stacked contiguous slices (~6% input duplication at To=32).

Stage outputs at globally-negative rows are forced to zero in-kernel —
they are the next stage's left zero padding in the global chain, and zero
input does not mean zero activation (biases).  Only tile 0 has such rows.

The backward is a `jax.custom_vjp` that recomputes through the pure-lax
conv chain (`dw_striding_chain_lax`, shared with the non-Pallas module
path) — exact standard conv gradients; the fused kernel is a
forward/decode optimization.

Numerics vs the lax chain: fp32 accumulation for every conv and fp32
activations — parity within bf16 tolerance (tests/test_subsampling_fused.py).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from lcasr_tpu.ops.conv import halo_exchange

_ACTS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": lambda v: jax.nn.gelu(v, approximate=False),
    "none": lambda v: v,
}


# ---------------------------------------------------------------------------
# Pure-lax dw-striding chain (shared by the non-Pallas module path and the
# fused kernel's backward)
# ---------------------------------------------------------------------------
def _conv2d(h, kernel, bias, strides, padding, groups=1):
    out = jax.lax.conv_general_dilated(
        h,
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + bias


def dw_striding_chain_lax(
    h: jnp.ndarray,  # (B, T, F, 1)
    params: Sequence[jnp.ndarray],  # (k0, b0, [kd, bd, kp, bp] × stages)
    act: str,
    t_pad: Tuple[int, int] = (1, 1),
    f_pad: Tuple[int, int] = (1, 1),
    cp_axis: Any = None,
) -> jnp.ndarray:
    """The dw_striding conv chain as XLA convs (reference
    `subsampling.py:219-286` semantics: full 3×3 s2 conv → act →
    [dw 3×3 s2 → pw 1×1 → act] per remaining stage).  Under context
    parallelism each stride-2 stage left-pads via halo exchange instead of
    zero padding (see `ConvSubsampling`)."""
    f = _ACTS[act]
    k0, b0 = params[0], params[1]
    C = k0.shape[-1]

    def strided(x):
        if cp_axis is None:
            return x, [t_pad, f_pad]
        # see ConvSubsampling.strided: odd local T silently misaligns the
        # stride-2 windows at every shard boundary — fail at trace time
        assert x.shape[1] % 2 == 0, (
            f"context parallel needs an even local T per stride-2 stage, "
            f"got {x.shape[1]}"
        )
        x = halo_exchange(x, cp_axis, left=t_pad[0], right=0, axis=1)
        return x, [(0, 0), f_pad]

    n_stages = (len(params) - 2) // 4
    # long-context memory guard (r4): XLA's conv BACKWARDS at hour-scale T
    # are workspace monsters — measured 11.1 GB temp for this chain's grad
    # at (1, 120000, 80, 1) (stage-0 wgrad 4.6 GB, dw-stage 2.8 GB), fully
    # remat-independent, and THE single-chip blocker for 360k-frame
    # training.  Above the threshold the chain evaluates in time chunks
    # under lax.scan with per-chunk remat: workspace drops to one chunk's
    # (~0.2 GB at K=2048) while the outputs stay IDENTICAL (VALID-conv
    # arithmetic + boundary masks reproduce the padded chain bit-for-bit;
    # tests/test_subsampling_chunked.py).
    if (
        cp_axis is None
        and n_stages == 2
        and t_pad == (1, 1)
        and h.shape[1] >= _CHUNK_THRESHOLD_T
    ):
        return _dw_striding_chain_chunked(h, params, act, f_pad)

    h, pad2d = strided(h)
    h = f(_conv2d(h, k0, b0, (2, 2), pad2d))
    for i in range(n_stages):
        kd, bd, kp, bp = params[2 + 4 * i : 6 + 4 * i]
        h, pad2d = strided(h)
        h = _conv2d(h, kd, bd, (2, 2), pad2d, groups=C)
        h = _conv2d(h, kp, bp, (1, 1), [(0, 0), (0, 0)])
        h = f(h)
    return h


# T threshold above which the chain switches to the chunked-scan
# formulation (the conv-backward workspace at 64k frames is ~6 GB; below
# that the plain chain's workspace is tolerable and avoids scan overhead)
_CHUNK_THRESHOLD_T = int(os.environ.get("LCASR_SUB_CHUNK_THRESHOLD", 65536))


def _dw_striding_chain_chunked(
    h: jnp.ndarray,  # (B, T, F, 1)
    params: Sequence[jnp.ndarray],
    act: str,
    f_pad: Tuple[int, int],
    chunk_out: int = 2048,  # output rows per chunk (= 8·chunk_out inputs)
) -> jnp.ndarray:
    """The 3-stage dw_striding chain evaluated in time chunks.

    Derivation (1-D over T; F handled per-stage with its normal (1,1) pad):
    with per-stage T-pad (1,1), stage-s output row g reads stage-(s-1)
    rows [2g-1, 2g+2).  Backtracking a final chunk [iK, (i+1)K):
      stage-1 rows [2iK-1, 2(i+1)K)        (count 2K+1)
      stage-0 rows [4iK-3, 4(i+1)K)        (count 4K+3)
      input  rows [8iK-7, 8(i+1)K)         (count 8K+7)
    Each stage then runs with VALID T-padding on the slice (the counts
    telescope exactly: (8K+7-3)//2+1 = 4K+3, etc.), and rows whose GLOBAL
    index falls outside the true stage extent are zeroed after the
    activation — reproducing the padded chain's literal zero pads (zero
    input does NOT mean zero output: biases).  The result is exactly the
    unchunked chain's rows [iK, (i+1)K).

    The chunk body is wrapped in jax.checkpoint inside lax.scan: the
    backward recomputes one chunk at a time, so the conv-grad workspace is
    O(chunk) instead of O(T).
    """
    f = _ACTS[act]
    k0, b0 = params[0], params[1]
    kd1, bd1, kp1, bp1, kd2, bd2, kp2, bp2 = params[2:10]
    C = k0.shape[-1]
    B, T, F, _ = h.shape
    S0 = (T - 1) // 2 + 1
    S1 = (S0 - 1) // 2 + 1
    S2 = (S1 - 1) // 2 + 1
    K = chunk_out
    n_chunks = -(-S2 // K)

    # zero-extended input: 7 left zeros + right zeros to cover the last
    # chunk's [8iK-7, 8(i+1)K) read
    padded = jnp.zeros((B, 7 + 8 * K * n_chunks, F, 1), h.dtype)
    padded = jax.lax.dynamic_update_slice_in_dim(padded, h, 7, axis=1)

    fp = [f_pad]

    def mask_rows(x, g_start, extent):
        g = g_start + jnp.arange(x.shape[1])
        keep = (g >= 0) & (g < extent)
        return jnp.where(keep[None, :, None, None], x, jnp.zeros((), x.dtype))

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim(padded, 8 * K * i, 8 * K + 7, axis=1)
        # stage 0: full 3x3 s2 (VALID on T), rows global [4iK-3, ...)
        x = f(jax.lax.conv_general_dilated(
            sl, k0, window_strides=(2, 2), padding=[(0, 0)] + fp,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0)
        x = mask_rows(x, 4 * K * i - 3, S0)
        # stage 1: dw 3x3 s2 + pw + act, rows global [2iK-1, ...)
        x = jax.lax.conv_general_dilated(
            x, kd1, window_strides=(2, 2), padding=[(0, 0)] + fp,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C) + bd1
        x = f(jax.lax.conv_general_dilated(
            x, kp1, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp1)
        x = mask_rows(x, 2 * K * i - 1, S1)
        # stage 2: rows global [iK, (i+1)K)
        x = jax.lax.conv_general_dilated(
            x, kd2, window_strides=(2, 2), padding=[(0, 0)] + fp,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C) + bd2
        x = f(jax.lax.conv_general_dilated(
            x, kp2, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp2)
        return carry, x  # (B, K, F2, C)

    _, chunks = jax.lax.scan(
        jax.checkpoint(body), None, jnp.arange(n_chunks))
    # (n, B, K, F2, C) -> (B, n*K, F2, C) -> crop the padded tail
    out = jnp.moveaxis(chunks, 0, 1).reshape(
        B, n_chunks * K, chunks.shape[3], C)
    return out[:, :S2]


# ---------------------------------------------------------------------------
# Stage-0 dense-weight construction (outside the Pallas call)
# ---------------------------------------------------------------------------
def _stage0_dense(k0: jnp.ndarray, b0: jnp.ndarray, F: int):
    """Build the stage-0 matmul weights.

    W0[dt]: (F+2, 2·H0·C) with output column (par, h, c) ↔ stage-1 input
    freq f' (even block: f' = 2h; odd block: f' = 2h−1, so h=0 is the
    f' = −1 zero pad and even h = F0/2 is the f' = F0 zero pad), holding
    k0[dt, φ−2f', 0, c] at input row φ (the freq-padded mel bin).  b0f is
    the matching flat bias row with zeros at the pad columns."""
    C = k0.shape[-1]
    F0 = F // 2
    H0 = F0 // 2 + 1
    f = np.arange(F0)
    blk = f % 2  # even f' -> block 0
    hh = np.where(blk == 0, f // 2, (f + 1) // 2)
    W0 = jnp.zeros((3, F + 2, 2, H0, C), k0.dtype)
    for df in range(3):
        W0 = W0.at[:, 2 * f + df, blk, hh, :].set(k0[:, df, 0, :][:, None, :])
    b0f = jnp.zeros((2, H0, C), b0.dtype).at[blk, hh, :].set(b0[None, :])
    return W0.reshape(3, F + 2, 2 * H0 * C), b0f.reshape(1, 2 * H0 * C)


def _lane_tiled(k: jnp.ndarray, reps: int) -> jnp.ndarray:
    """(3, 3, 1, C) depthwise kernel -> (16, reps·C): tap rows (dt-major,
    zero-padded 9→16) tiled across the flat (freq, channel) lane dim."""
    C = k.shape[-1]
    flat = jnp.tile(k.reshape(9, 1, C), (1, reps, 1)).reshape(9, reps * C)
    return jnp.pad(flat, ((0, 7), (0, 0)))


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------
def _fused_kernel(
    x_ref,               # (1, TW4, 4, F+2): row m of the tile at [m//4, m%4]
    w0a, w0b, w0c, b0f,  # (F+2, 2·H0·C) × 3 (per dt), (1, 2·H0·C)
    wd1, bd1, wp1, bp1,  # (16, F1·C), (1, F1·C), (C, C), (1, C)
    wd2, bd2, wp2, bp2,  # (16, C), (1, C), (C, C), (1, C)
    o_ref,               # (1, To, F8, C)
    *,
    To: int,
    F0: int,
    act: str,
    n_tiles: int,
):
    f = _ACTS[act]
    C = o_ref.shape[-1]
    F1, F8 = F0 // 2, F0 // 4
    H0 = F0 // 2 + 1
    T1 = 2 * To + 1  # stage-1 rows needed: global [2j0-1, 2j0+2To-1]
    Ue = 2 * To + 2  # stage-0 rows per parity
    dtype = o_ref.dtype
    j = pl.program_id(0) % n_tiles
    w0 = (w0a, w0b, w0c)

    # phase planes: x[m] = xq[m%4][m//4]; contiguous row slices from here on
    xq = [x_ref[0, :, q, :] for q in range(4)]

    # ---- stage 0 on the MXU: s0[a, f'] reads x rows m = 2a+dt+1 ----
    # even rows a = 2u: m = 4u + (dt+1); odd rows a = 2u+1: m = 4u + (dt+3)
    s0e = jax.lax.dot_general(
        xq[1][0:Ue], w0a[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for q, w in ((2, w0b), (3, w0c)):
        s0e += jax.lax.dot_general(
            xq[q][0:Ue], w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s0o = jax.lax.dot_general(
        xq[3][0:Ue], w0a[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for q, w in ((0, w0b), (1, w0c)):
        s0o += jax.lax.dot_general(
            xq[q][1 : 1 + Ue], w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # bias + act (pad columns stay 0: zero bias there, act(0) = 0), then
    # zero rows at globally-negative stage-0 indices (left boundary)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Ue, 1), 0)
    base = 4 * j * To - 3
    s0e = jnp.where(rows * 2 + base >= 0, f(s0e + b0f[...]), 0).astype(dtype)
    s0o = jnp.where(rows * 2 + base + 1 >= 0, f(s0o + b0f[...]), 0).astype(dtype)

    # ---- stage 1: depthwise taps = contiguous lane-range slices ----
    # row b reads stage-0 row n = 2b+dt -> parity dt%2 plane, row b+dt//2;
    # freq f' = 2e+df-1 -> df=0: odd block cols e..e+F1-1, df=1: even
    # block e.., df=2: odd block e+1..
    lane0 = (0, H0 * C, H0 * C + C)  # df=1 -> even base 0; df=0/2 -> odd
    acc = jnp.zeros((T1, F1 * C), jnp.float32)
    for dt in range(3):
        src = s0e if dt % 2 == 0 else s0o
        r0 = dt // 2
        for df in range(3):
            l0 = lane0[1] if df == 0 else (lane0[0] if df == 1 else lane0[2])
            sl = src[r0 : r0 + T1, l0 : l0 + F1 * C]
            acc = acc + sl.astype(jnp.float32) * wd1[dt * 3 + df, :]
    h1 = (acc + bd1[...]).astype(dtype).reshape(T1 * F1, C)
    s1 = jax.lax.dot_general(
        h1, wp1[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s1 = f(s1 + bp1[...]).astype(dtype).reshape(T1, F1, C)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (T1, 1, 1), 0)
    s1 = jnp.where(rows1 + (2 * j * To - 1) >= 0, s1, 0)
    # stage-2 is 16× smaller than stage-0: plain pad + dim-split views
    s1 = jnp.pad(s1, ((0, 1), (1, 1), (0, 0)))  # rows -> 2To+2, freq pad
    s1 = s1.reshape(To + 1, 2, (F1 + 2) // 2, 2, C)

    # ---- stage 2: output rows j0..j0+To ----
    acc2 = jnp.zeros((To, F8, C), jnp.float32)
    for dt in range(3):
        i0, pt = dt // 2, dt % 2
        for df in range(3):
            h0, pf = df // 2, df % 2
            sl = s1[i0 : i0 + To, pt, h0 : h0 + F8, pf, :]
            acc2 = acc2 + sl.astype(jnp.float32) * wd2[dt * 3 + df, :]
    h2 = (acc2 + bd2[...]).astype(dtype).reshape(To * F8, C)
    s2 = jax.lax.dot_general(
        h2, wp2[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s2 = f(s2 + bp2[...])
    o_ref[0] = s2.astype(dtype).reshape(To, F8, C)


def _tap16(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 1, C) conv kernel -> (16, C): taps flattened dt-major and
    zero-padded to a lane-friendly 16-row K."""
    C = k.shape[-1]
    return jnp.pad(k.reshape(9, C), ((0, 7), (0, 0)))


def _fused_impl(
    x: jnp.ndarray,  # (B, T, F)
    params: Sequence[jnp.ndarray],
    act: str,
    To: int,
    interpret: bool,
) -> jnp.ndarray:
    B, T, F = x.shape
    k0, b0, kd1, bd1, kp1, bp1, kd2, bd2, kp2, bp2 = params
    C = k0.shape[-1]
    F0, F1, F8 = F // 2, F // 4, F // 8
    T8 = T // 8
    n = -(-T8 // To)
    Tp = n * To * 8

    # pad: freq (1,1) like the global conv; time left 8 (halo + the global
    # left pad), right up to the tile multiple + 8 — all zeros, exactly the
    # zero frames the stride-2 chain's own padding would produce, so rows
    # [0, T/8) match the lax chain and rows beyond are dropped below
    xg = jnp.pad(x, ((0, 0), (8, Tp - T + 8), (1, 1)))
    # time mod-4 phase split: a FREE dim-splitting reshape (row-major
    # order preserved), then overlapping tiles as stacked contiguous slices
    xg = xg.reshape(B, (Tp + 16) // 4, 4, F + 2)
    TW4 = 2 * To + 4
    tiles = jnp.stack(
        [xg[:, 2 * To * j : 2 * To * j + TW4] for j in range(n)], 1
    ).reshape(B * n, TW4, 4, F + 2)

    W0, b0f = _stage0_dense(k0, b0, F)
    wspec = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape))
    row = lambda b: b.reshape(1, C)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, To=To, F0=F0, act=act, n_tiles=n),
        grid=(B * n,),
        in_specs=[pl.BlockSpec((1, TW4, 4, F + 2), lambda g: (g, 0, 0, 0))]
        + [
            wspec((F + 2, 2 * (F0 // 2 + 1) * C)),    # w0a
            wspec((F + 2, 2 * (F0 // 2 + 1) * C)),    # w0b
            wspec((F + 2, 2 * (F0 // 2 + 1) * C)),    # w0c
            wspec((1, 2 * (F0 // 2 + 1) * C)),        # b0f
            wspec((16, F1 * C)), wspec((1, F1 * C)),  # dw1 lane-tiled
            wspec((C, C)), wspec((1, C)),             # pw1
            wspec((16, C)), wspec((1, C)),            # dw2
            wspec((C, C)), wspec((1, C)),             # pw2
        ],
        out_specs=pl.BlockSpec((1, To, F8, C), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * n, To, F8, C), x.dtype),
        interpret=interpret,
    )(
        tiles,
        W0[0], W0[1], W0[2], b0f,
        _lane_tiled(kd1, F1),
        jnp.tile(bd1.reshape(1, 1, C), (1, F1, 1)).reshape(1, F1 * C),
        kp1.reshape(C, C), row(bp1),
        _tap16(kd2), row(bd2),
        kp2.reshape(C, C), row(bp2),
    )
    return out.reshape(B, n * To, F8, C)[:, :T8]


# ---------------------------------------------------------------------------
# custom_vjp: fused forward, exact lax-chain backward (recompute)
# ---------------------------------------------------------------------------
def _tile_size() -> int:
    # 24 is the largest tile fitting the 16 MB scoped-VMEM limit at
    # F=80, C=256 (32 exceeds it by 80 KB) and the fastest measured
    return int(os.environ.get("LCASR_SUB_TILE", "24"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_dw_striding(
    x: jnp.ndarray,  # (B, T, F); T % (8*tile) handled by internal padding
    params: Tuple[jnp.ndarray, ...],
    act: str,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused subsampling forward: (B, T, F) -> (B, T/8, F/8, C).

    Requires T % 8 == 0 and F % 8 == 0 (the even-halving regime where
    zero-tail padding is exactly equivalent to the lax chain's per-stage
    (1,1) padding — callers gate on this) and C % 128 == 0.  The backward
    recomputes through `dw_striding_chain_lax` (standard conv gradients).
    """
    return _fused_impl(x, params, act, _tile_size(), interpret)


def _fused_fwd(x, params, act, interpret):
    return fused_dw_striding(x, params, act, interpret), (x, params)


def _fused_bwd(act, interpret, res, g):
    x, params = res

    def chain(x_, params_):
        return dw_striding_chain_lax(x_[..., None], params_, act)

    _, vjp = jax.vjp(chain, x, params)
    dx, dparams = vjp(g)
    return dx, dparams


fused_dw_striding.defvjp(_fused_fwd, _fused_bwd)


def fused_subsampling_enabled() -> bool:
    """Module-level gate: OPT-IN (`LCASR_FUSED_SUB=1`), TPU only.

    Default OFF — measured SLOWER than the XLA conv chain on v5e at the
    20-min decode shape (16, 16384, 80)→C256: fused 25.2 ms (To=24; To=32
    exceeds the 16 MB scoped-VMEM limit by 80 KB) vs lax 16.0 ms in the
    same amortized harness (benchmarks/RESULTS_subsampling.json).  The
    dense-matmul stage-0 formulation that avoids Mosaic relayouts inflates
    stage-0 FLOPs ~27× ((F+2)-row weight vs 3 live taps/column), putting
    its MXU floor (~6 ms) plus pipeline overheads above XLA's already
    inter-op-fused chain.  Kept as a tested experiment (interpret-mode
    parity + grads in tests/test_subsampling_fused.py)."""
    return (
        os.environ.get("LCASR_FUSED_SUB", "0") == "1"
        and jax.default_backend() == "tpu"
    )

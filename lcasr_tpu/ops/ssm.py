"""Selective state-space scan (Mamba) ops.

TPU-native replacement for the `mamba_ssm` CUDA/Triton selective-scan and
`causal_conv1d` kernels (reference `lcasr/components/bidirectional_mamba.py:
17-35`, SURVEY §2.8 #7): the recurrence

    h_t = exp(Δ_t ⊙ A) h_{t-1} + (Δ_t ⊙ B_t) x_t
    y_t = C_t · h_t + D ⊙ x_t

is a first-order linear recurrence in (gain, bias) form, with TWO
evaluation paths:

  * a Pallas SEQUENTIAL kernel (TPU forward default): the (D, N) state
    lives in VMEM across the whole sequence and the (B, L, D, N)
    gain/bias tensors are never materialized — the associative-scan
    evaluation moves ~2 × B·L·D·N fp32 per level × log2(L) levels through
    HBM (≈1 GB per level at B8·L2048·D1024·N16), making it HBM-bound,
  * `jax.lax.associative_scan` — log-depth, differentiable — used on CPU
    and under vmap batching rules.

The Pallas path's BACKWARD is a native reverse-recurrence kernel
(`_scan_bwd_kernel`): the adjoint λ_t = C_t⊗g_t + a_{t+1}∘λ_{t+1} walks the
blocks in reverse, restarting each block's h from the forward kernel's
block-exit checkpoints — like the CUDA selective-scan backward, h is
recomputed in fast memory and the (B, L, D, N) tensors never exist.
Measured (v5e, B8·L2048·D1024·N16 bf16, amortized): fwd 8.2 ms;
fwd+bwd 10.7 ms native vs 70.8 ms via the associative recompute (6.6×).
`LCASR_NATIVE_SSM_BWD=0` falls back to the associative VJP.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def causal_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Depthwise causal conv.  x: (B, L, C); kernel: (K, C) → (B, L, C)."""
    K, C = kernel.shape
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :],
        window_strides=(1,),
        padding=[(K - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    if bias is not None:
        out = out + bias
    return out


def _selective_scan_ref(x, delta, A, B, C):
    """Associative-scan reference (log-depth, differentiable); f32 out."""
    xf = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    # discretize: gain (B, L, D, N), bias (B, L, D, N)
    dA = jnp.exp(delta[..., None] * A[None, None])  # exp(Δ A)
    dBx = delta[..., None] * Bf[:, :, None, :] * xf[..., None]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)  # h: (B, L, D, N)
    return jnp.einsum("bln,bldn->bld", Cf, h)


def _scan_kernel(
    x_ref,  # (1, TL, D)
    delta_ref,  # (1, TL, D)
    at_ref,  # (N, D) f32, pre-transposed A
    b_ref,  # (1, TL, N)
    c_ref,  # (1, TL, N)
    y_ref,  # (1, TL, D) f32
    *rest,  # [hout_ref (1, 1, N, D) f32 — state AFTER this block (backward
            # residual), only when emit_states] + h_scr VMEM (N, D) f32 —
            # the recurrence state, resident ALL sequence
    block_l: int,
    emit_states: bool = True,
):
    h_scr = rest[-1]
    hout_ref = rest[0] if emit_states else None
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    at = at_ref[...]  # (N, D)
    G = 16  # row group: dynamic sublane slices must be tile-aligned
            # (Mosaic: "index in dimension 1 must be a multiple of 8/16"),
            # so the sequential loop runs per GROUP with a static unroll
            # inside — which also gives Mosaic straight-line code to pipeline

    def group(gi, h):
        base = gi * G
        xg = x_ref[0, pl.ds(base, G)].astype(jnp.float32)  # (G, D)
        dg = delta_ref[0, pl.ds(base, G)].astype(jnp.float32)
        # one lane→sublane transpose per GROUP (not per step)
        bgt = jnp.swapaxes(b_ref[0, pl.ds(base, G)].astype(jnp.float32), 0, 1)
        cgt = jnp.swapaxes(c_ref[0, pl.ds(base, G)].astype(jnp.float32), 0, 1)
        rows = []
        for j in range(G):  # static → lax.slice on values (supported)
            d = dg[j][None, :]  # (1, D)
            dA = jnp.exp(at * d)  # (N, D): N on sublanes, D on lanes
            h = dA * h + (d * xg[j][None, :]) * bgt[:, j][:, None]
            rows.append((h * cgt[:, j][:, None]).sum(axis=0))
        y_ref[0, pl.ds(base, G)] = jnp.stack(rows, axis=0)
        return h

    h_scr[:] = jax.lax.fori_loop(0, block_l // G, group, h_scr[:])
    if emit_states:
        # checkpoint the state AFTER this block (= the next block's entry;
        # the backward reads checkpoint[li-1], block 0 starts from zeros).
        # Written at the END so the store doesn't serialize against the
        # block's compute pipeline (an entry-time store measured 4x slower
        # fwd).  Skipped entirely for forward-only calls (inference) — no
        # HBM allocation, no per-block stores.
        hout_ref[0, 0] = h_scr[:]


def _scan_pallas(x, delta, A, B, C, block_l: int = 512, return_states: bool = False):
    Bt, L, D = x.shape
    N = A.shape[1]
    block_l = min(block_l, -(-L // 16) * 16)  # multiple of the 16-row group
    pad = (-L) % block_l
    if pad:
        # padding rows carry Δ = 0 → gain exp(0) = 1, bias 0: the state
        # passes through unchanged (padding is only ever at the tail)
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        x, delta, B, C = zpad(x), zpad(delta), zpad(B), zpad(C)
    nL = (L + pad) // block_l
    at = jnp.swapaxes(A.astype(jnp.float32), 0, 1)  # (N, D)

    out_specs = [pl.BlockSpec((1, block_l, D), lambda b, l: (b, l, 0))]
    out_shape = [jax.ShapeDtypeStruct((Bt, L + pad, D), jnp.float32)]
    if return_states:
        out_specs.append(
            pl.BlockSpec((1, 1, at.shape[0], D), lambda b, l: (b, l, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((Bt, nL, N, D), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_scan_kernel, block_l=block_l, emit_states=return_states),
        grid=(Bt, nL),
        in_specs=[
            pl.BlockSpec((1, block_l, D), lambda b, l: (b, l, 0)),
            pl.BlockSpec((1, block_l, D), lambda b, l: (b, l, 0)),
            pl.BlockSpec((at.shape[0], D), lambda b, l: (0, 0)),
            pl.BlockSpec((1, block_l, N), lambda b, l: (b, l, 0)),
            pl.BlockSpec((1, block_l, N), lambda b, l: (b, l, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((at.shape[0], D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, delta, at, B, C)
    if return_states:
        y, states = outs
        return y[:, :L], states
    return outs[0][:, :L]


def _scan_bwd_kernel(
    x_ref,  # (1, TL, D)
    delta_ref,  # (1, TL, D)
    at_ref,  # (N, D) f32
    b_ref,  # (1, TL, N)
    c_ref,  # (1, TL, N)
    g_ref,  # (1, TL, D) f32 — dL/dy
    h0_ref,  # (1, 1, N, D) f32 — PREVIOUS block's exit state (== this
             # block's entry; garbage for the first block, zeroed below)
    dx_ref,  # (1, TL, D) f32
    dd_ref,  # (1, TL, D) f32
    db_ref,  # (1, TL, N) f32
    dc_ref,  # (1, TL, N) f32
    da_ref,  # (1, N, D) f32 — per-batch dA partial
    lam_scr,  # VMEM (N, D) f32 — λ = dL/dh carried BACKWARD across blocks
    da_scr,  # VMEM (N, D) f32 — dA accumulator across this batch's blocks
    gstate_scr,  # VMEM (nG*N, D) f32 — state at each GROUP's entry
    *,
    block_l: int,
    num_l_blocks: int,
):
    """Reverse-recurrence selective-scan backward (native counterpart of the
    CUDA selective-scan backward, reference `bidirectional_mamba.py:17-30`):

        λ_t = C_t ⊗ g_t + a_{t+1} ∘ λ_{t+1}          (reverse adjoint)
        dx_t = Δ_t · Σ_n λ_t B_t ;  dB_t = Σ_d λ_t Δ_t x_t
        dΔ_t = Σ_n λ_t (B_t x_t + A a_t h_{t-1}) ;  dC_t = Σ_d g_t h_t
        dA  += Σ_t λ_t Δ_t a_t h_{t-1}

    The grid walks L blocks in REVERSE (index maps flip li); h_{t-1} is
    recomputed forward within each block from the fwd kernel's block-entry
    checkpoint — state stays in VMEM, the (B, L, D, N) gain/bias tensors are
    never materialized (the whole point vs the associative-scan backward)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _init():
        lam_scr[:] = jnp.zeros_like(lam_scr)
        da_scr[:] = jnp.zeros_like(da_scr)

    at = at_ref[...]  # (N, D)
    N = at.shape[0]
    G = 16
    nG = block_l // G

    # phase 1: forward within the block from the checkpointed entry state,
    # saving each group's entry state
    def fwd_group(gi, h):
        gstate_scr[pl.ds(gi * N, N)] = h
        base = gi * G
        xg = x_ref[0, pl.ds(base, G)].astype(jnp.float32)
        dg = delta_ref[0, pl.ds(base, G)].astype(jnp.float32)
        bgt = jnp.swapaxes(b_ref[0, pl.ds(base, G)].astype(jnp.float32), 0, 1)
        for j in range(G):
            d = dg[j][None, :]
            dA = jnp.exp(at * d)
            h = dA * h + (d * xg[j][None, :]) * bgt[:, j][:, None]
        return h

    # block 0 (the LAST reverse grid step) starts from the zero state
    h_entry = h0_ref[0, 0] * jnp.where(li == num_l_blocks - 1, 0.0, 1.0)
    jax.lax.fori_loop(0, nG, fwd_group, h_entry)

    # phase 2: reverse sweep, group by group from the end
    def bwd_group(gi_rev, lam):
        gi = nG - 1 - gi_rev
        base = gi * G
        xg = x_ref[0, pl.ds(base, G)].astype(jnp.float32)  # (G, D)
        dg = delta_ref[0, pl.ds(base, G)].astype(jnp.float32)
        bgt = jnp.swapaxes(b_ref[0, pl.ds(base, G)].astype(jnp.float32), 0, 1)  # (N, G)
        cgt = jnp.swapaxes(c_ref[0, pl.ds(base, G)].astype(jnp.float32), 0, 1)
        gg = g_ref[0, pl.ds(base, G)].astype(jnp.float32)  # (G, D)

        # recompute the group's states; keep h_{t-1} AND a_t per row
        h = gstate_scr[pl.ds(gi * N, N)]
        h_prevs, gains, hs = [], [], []
        for j in range(G):
            d = dg[j][None, :]
            a_t = jnp.exp(at * d)
            h_prevs.append(h)
            gains.append(a_t)
            h = a_t * h + (d * xg[j][None, :]) * bgt[:, j][:, None]
            hs.append(h)

        dx_rows, dd_rows, db_rows, dc_rows = [], [], [], []
        da_acc = da_scr[:]
        for j in range(G - 1, -1, -1):
            lam_t = lam + cgt[:, j][:, None] * gg[j][None, :]
            lam_b = lam_t * bgt[:, j][:, None]  # λ·B  (N, D)
            sum_lam_b = lam_b.sum(axis=0)  # (D,)
            gain_term = lam_t * gains[j] * h_prevs[j]  # λ·a·h_prev
            dx_rows.append(dg[j] * sum_lam_b)
            dd_rows.append(
                xg[j] * sum_lam_b + (gain_term * at).sum(axis=0)
            )
            db_rows.append((lam_t * (dg[j] * xg[j])[None, :]).sum(axis=1))
            dc_rows.append((hs[j] * gg[j][None, :]).sum(axis=1))
            da_acc = da_acc + gain_term * dg[j][None, :]
            lam = lam_t * gains[j]
        da_scr[:] = da_acc

        dx_ref[0, pl.ds(base, G)] = jnp.stack(dx_rows[::-1], axis=0)
        dd_ref[0, pl.ds(base, G)] = jnp.stack(dd_rows[::-1], axis=0)
        db_ref[0, pl.ds(base, G)] = jnp.stack(db_rows[::-1], axis=0)
        dc_ref[0, pl.ds(base, G)] = jnp.stack(dc_rows[::-1], axis=0)
        return lam

    lam_scr[:] = jax.lax.fori_loop(0, nG, bwd_group, lam_scr[:])

    @pl.when(li == num_l_blocks - 1)
    def _finalize():
        da_ref[0] = da_scr[:]


def _scan_bwd_pallas(x, delta, A, B, C, states, g, block_l: int = 512):
    """Native selective-scan backward.  Returns (dx, ddelta, dA, dB, dC)
    in fp32; caller casts.  block_l must equal the forward's (the kernel
    restarts each block from the fwd checkpoint); the raised vmem limit
    covers the 5 streamed (TL, D) f32 buffers + the nG·N group-state
    scratch at D=1024."""
    Bt, L, D = x.shape
    N = A.shape[1]
    # the backward block size MUST equal the forward's: the kernel restarts
    # each block from the fwd kernel's block-entry checkpoint
    block_l = min(block_l, -(-L // 16) * 16)
    pad = (-L) % block_l
    if pad:
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        x, delta, B, C, g = zpad(x), zpad(delta), zpad(B), zpad(C), zpad(g)
    Lp = L + pad
    nL = Lp // block_l
    assert states.shape[1] == nL, (states.shape, nL, block_l)
    at = jnp.swapaxes(A.astype(jnp.float32), 0, 1)

    rev = lambda b, l: (b, nL - 1 - l, 0)
    revN = lambda b, l: (b, nL - 1 - l, 0)
    dx, dd, db, dc, da = pl.pallas_call(
        functools.partial(
            _scan_bwd_kernel, block_l=block_l, num_l_blocks=nL
        ),
        grid=(Bt, nL),
        in_specs=[
            pl.BlockSpec((1, block_l, D), rev),
            pl.BlockSpec((1, block_l, D), rev),
            pl.BlockSpec((N, D), lambda b, l: (0, 0)),
            pl.BlockSpec((1, block_l, N), revN),
            pl.BlockSpec((1, block_l, N), revN),
            pl.BlockSpec((1, block_l, D), rev),
            # checkpoint[li-1]: the PREVIOUS block's exit state == this
            # block's entry (clamped at 0; the kernel zeroes it for block 0)
            pl.BlockSpec(
                (1, 1, N, D), lambda b, l: (b, jnp.maximum(nL - 2 - l, 0), 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, D), rev),
            pl.BlockSpec((1, block_l, D), rev),
            pl.BlockSpec((1, block_l, N), revN),
            pl.BlockSpec((1, block_l, N), revN),
            pl.BlockSpec((1, N, D), lambda b, l: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bt, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bt, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bt, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bt, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bt, N, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM(((block_l // 16) * N, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # 5 streamed (block_l, D) f32 buffers + group-entry states push
            # past the 16 MB default scoped limit at D=1024; v5e has 128 MB
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, delta, at, B, C, g, states)
    dA = jnp.swapaxes(da.sum(axis=0), 0, 1)  # (N, D) → (D, N)
    return dx[:, :L], dd[:, :L], dA, db[:, :L], dc[:, :L]


@jax.custom_vjp
def _selective_scan_fast(x, delta, A, B, C):
    return _scan_pallas(x, delta, A, B, C)


def _ssf_fwd(x, delta, A, B, C):
    y, states = _scan_pallas(x, delta, A, B, C, return_states=True)
    return y, (x, delta, A, B, C, states)


def _ssf_bwd(res, g):
    import os

    x, delta, A, B, C, states = res
    flag = os.environ.get("LCASR_NATIVE_SSM_BWD", "1")
    # "force" runs the native kernel even off-TPU (pallas interpreter) —
    # used by the CPU gradient-parity test; "0" disables it everywhere
    if flag == "force" or (jax.default_backend() == "tpu" and flag != "0"):
        # native reverse-recurrence kernel (block size = the forward's, so
        # the block-entry checkpoints line up)
        dx, dd, dA, dB, dC = _scan_bwd_pallas(
            x, delta, A, B, C, states, g.astype(jnp.float32),
        )
        return (
            dx.astype(x.dtype),
            dd.astype(delta.dtype),
            dA.astype(A.dtype),
            dB.astype(B.dtype),
            dC.astype(C.dtype),
        )
    # fallback: backward through the associative-scan reference — the
    # recurrence is recomputed like the CUDA kernel, but the (B, L, D, N)
    # gain/bias tensors hit HBM ~log2(L) times
    _, vjp = jax.vjp(_selective_scan_ref, x, delta, A, B, C)
    return vjp(g)


_selective_scan_fast.defvjp(_ssf_fwd, _ssf_bwd)


def selective_scan(
    x: jnp.ndarray,  # (B, L, D)   input sequence
    delta: jnp.ndarray,  # (B, L, D)   timestep (post-softplus)
    A: jnp.ndarray,  # (D, N)      negative-real diagonal state matrix
    B: jnp.ndarray,  # (B, L, N)   input gate
    C: jnp.ndarray,  # (B, L, N)   output gate
    D: Optional[jnp.ndarray] = None,  # (D,) skip
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Selective scan.  Returns y (B, L, D).

    `use_pallas=None` → the sequential Pallas kernel on TPU, the
    associative-scan reference elsewhere (the kernel's interpret mode is
    orders slower than the reference on CPU — tests opt in explicitly)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if x.shape[1] < 16:  # kernel's 16-row group floor
        use_pallas = False
    if use_pallas:
        y = _selective_scan_fast(x, delta, A, B, C)
    else:
        y = _selective_scan_ref(x, delta, A, B, C)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None] * x.astype(jnp.float32)
    return y.astype(x.dtype)


def flip_with_lengths(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse each sequence within its valid region, keeping padding at the
    end (reference `bidirectional_mamba.py:138-152` flip_with_mask)."""
    if lengths is None:
        return jnp.flip(x, axis=1)
    B, L = x.shape[:2]
    idx = jnp.arange(L)[None, :]  # (1, L)
    src = lengths[:, None] - 1 - idx  # reversed position within valid region
    src = jnp.where(src >= 0, src, idx)  # padding keeps identity position
    return jnp.take_along_axis(x, src[..., None].astype(jnp.int32), axis=1)

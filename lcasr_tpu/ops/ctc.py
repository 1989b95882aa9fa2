"""CTC loss (log-semiring forward over the interleaved-blank lattice) + WCTC.

TPU-native replacement for the reference's cuDNN-backed
`torch.nn.CTCLoss(blank=num_classes-1, reduction='sum')`
(reference `exp/train.py:104`) and the pure-python wildcard CTC
(reference `lcasr/losses/wctc.py:7-74`).

Implementation: the standard alpha recursion over the augmented label
sequence z = [b, y1, b, y2, ..., yU, b] (blank interleaved), scanned over
time with `lax.scan`, all in fp32 log-space, vmapped over the batch.
Blank can be ANY class id (the lcasr convention is blank = LAST id).

The backward is a CUSTOM VJP using the exact Graves gradient — a beta
recursion (reverse scan, same cost as the forward) giving the state
posteriors gamma_t(s) = exp(alpha + beta - ll), scattered into the class
axis:  d(-ll)/d logp[t, c] = -sum_{s: z_s = c} gamma_t(s).  Autodiff
through the forward scan was measured ~9x the forward cost at the 5.5-min
training config (16.6 ms vs 1.8) — transposing a 4096-step scan plus the
hoisted-gather scatter dominates; the analytic backward is ~2 scans total.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


def _ctc_alpha_single(
    log_probs: jnp.ndarray,  # (T, C) log-probs
    labels: jnp.ndarray,  # (U,) padded label ids
    input_length: jnp.ndarray,  # ()
    label_length: jnp.ndarray,  # ()
    blank_id: int,
) -> jnp.ndarray:
    """Negative log-likelihood for one sequence."""
    T, C = log_probs.shape
    U = labels.shape[0]
    S = 2 * U + 1

    # augmented sequence z: even positions = blank, odd = labels
    z = jnp.full((S,), blank_id, dtype=jnp.int32)
    z = z.at[1::2].set(labels.astype(jnp.int32))

    # allowed skip transition: z[s] != blank and z[s] != z[s-2]
    prev2 = jnp.concatenate([jnp.full((2,), -1, jnp.int32), z[:-2]])
    can_skip = (z != blank_id) & (z != prev2)

    valid_s = jnp.arange(S) < (2 * label_length + 1)

    # hoist the emission gather out of the scan: one (T, S) gather instead of
    # T sequential (S,) gathers — the scan body becomes pure elementwise work
    emissions = log_probs[:, z]  # (T, S)

    # init: alpha_0 = [logp(blank), logp(y1), -inf, ...]; a fully-padded
    # slot (input_length == 0) has no valid frame 0 → all -inf so the loss
    # is the documented +inf-ish value, not a finite emissions[0] artifact
    alpha0 = jnp.where(jnp.arange(S) < 2, emissions[0], _NEG_INF)
    alpha0 = jnp.where(valid_s & (input_length > 0), alpha0, _NEG_INF)

    def step(alpha, te):
        t, emit = te
        a_stay = alpha
        a_prev = jnp.concatenate([jnp.array([_NEG_INF]), alpha[:-1]])
        a_skip = jnp.where(
            can_skip,
            jnp.concatenate([jnp.full((2,), _NEG_INF), alpha[:-2]]),
            _NEG_INF,
        )
        stacked = jnp.stack([a_stay, a_prev, a_skip])
        m = stacked.max(0)
        new = m + jnp.log(jnp.exp(stacked - m).sum(0))
        new = jnp.where(m <= _NEG_INF / 2, _NEG_INF, new) + emit
        new = jnp.where(valid_s, new, _NEG_INF)
        # time masking: past input_length, carry alpha unchanged
        new = jnp.where(t < input_length, new, alpha)
        return new, None

    alpha_T, _ = jax.lax.scan(step, alpha0, (jnp.arange(1, T), emissions[1:]))

    # ll = logsumexp(alpha_T at final blank and final label positions)
    end1 = 2 * label_length  # final blank
    end2 = 2 * label_length - 1  # final label
    a1 = alpha_T[end1]
    a2 = jnp.where(label_length > 0, alpha_T[jnp.maximum(end2, 0)], _NEG_INF)
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    # degenerate: empty label → path of all blanks ends at end1 only (covered)
    nll = -ll
    # impossible alignments (T < required length) give the FINITE ~1e30
    # lattice sentinel — deliberately NOT inf (torch returns inf with
    # zero_infinity=False): the trainer's non-finite skip must not fire for
    # this class; it filters rows at nll >= 1e29 instead (trainer.py).  Do
    # not "fix" this to inf.
    return nll


def _lattice(labels, label_length, blank_id, S):
    """Augmented sequence z, skip mask, and state-validity mask."""
    z = jnp.full((S,), blank_id, dtype=jnp.int32)
    z = z.at[1::2].set(labels.astype(jnp.int32))
    prev2 = jnp.concatenate([jnp.full((2,), -1, jnp.int32), z[:-2]])
    can_skip = (z != blank_id) & (z != prev2)
    valid_s = jnp.arange(S) < (2 * label_length + 1)
    return z, can_skip, valid_s


def _alpha_all(log_probs, labels, input_length, label_length, blank_id):
    """Forward recursion keeping every alpha row: (nll, alphas (T, S), z)."""
    T, C = log_probs.shape
    S = 2 * labels.shape[0] + 1
    z, can_skip, valid_s = _lattice(labels, label_length, blank_id, S)
    emissions = log_probs[:, z]  # (T, S) hoisted gather

    alpha0 = jnp.where(jnp.arange(S) < 2, emissions[0], _NEG_INF)
    alpha0 = jnp.where(valid_s & (input_length > 0), alpha0, _NEG_INF)

    def step(alpha, te):
        t, emit = te
        a_prev = jnp.concatenate([jnp.array([_NEG_INF]), alpha[:-1]])
        a_skip = jnp.where(
            can_skip,
            jnp.concatenate([jnp.full((2,), _NEG_INF), alpha[:-2]]),
            _NEG_INF,
        )
        stacked = jnp.stack([alpha, a_prev, a_skip])
        m = stacked.max(0)
        new = m + jnp.log(jnp.exp(stacked - m).sum(0))
        new = jnp.where(m <= _NEG_INF / 2, _NEG_INF, new) + emit
        new = jnp.where(valid_s, new, _NEG_INF)
        new = jnp.where(t < input_length, new, alpha)
        return new, new

    alpha_T, alpha_rest = jax.lax.scan(
        step, alpha0, (jnp.arange(1, T), emissions[1:])
    )
    alphas = jnp.concatenate([alpha0[None], alpha_rest], axis=0)  # (T, S)

    end1 = 2 * label_length
    end2 = 2 * label_length - 1
    a1 = alpha_T[end1]
    a2 = jnp.where(label_length > 0, alpha_T[jnp.maximum(end2, 0)], _NEG_INF)
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    return -ll, alphas


def _ctc_grad_single(
    log_probs, labels, input_length, label_length, alphas, nll, blank_id
):
    """Exact gradient d nll / d log_probs via the beta recursion.

    beta_t(s) = log-prob of completing the alignment from state s AFTER the
    emission at t (so beta = 0 at the end states of frame input_length-1);
    gamma_t(s) = exp(alpha_t(s) + beta_t(s) + nll) are the state posteriors
    and the class gradient is the negative scatter-sum over z."""
    T, C = log_probs.shape
    S = 2 * labels.shape[0] + 1
    z, can_skip, valid_s = _lattice(labels, label_length, blank_id, S)
    emissions = log_probs[:, z]  # (T, S)

    end1 = 2 * label_length
    end2 = jnp.maximum(2 * label_length - 1, 0)
    s_idx = jnp.arange(S)
    beta_final = jnp.where(
        (s_idx == end1) | ((s_idx == end2) & (label_length > 0)), 0.0, _NEG_INF
    )
    # skip INTO s+2 is allowed when can_skip[s+2] (destination-indexed)
    skip_ok_from = jnp.concatenate([can_skip[2:], jnp.zeros((2,), bool)])

    def step(beta_next, te):
        t, emit_next = te  # emissions at t+1
        b = emit_next + beta_next
        b_next = jnp.concatenate([b[1:], jnp.array([_NEG_INF])])
        b_skip = jnp.where(
            skip_ok_from,
            jnp.concatenate([b[2:], jnp.full((2,), _NEG_INF)]),
            _NEG_INF,
        )
        stacked = jnp.stack([b, b_next, b_skip])
        m = stacked.max(0)
        new = m + jnp.log(jnp.exp(stacked - m).sum(0))
        new = jnp.where(m <= _NEG_INF / 2, _NEG_INF, new)
        new = jnp.where(valid_s, new, _NEG_INF)
        # t is the LAST emitted frame of this sequence → restart at the
        # final states; t beyond the sequence → carry (masked out later)
        new = jnp.where(t == input_length - 1, beta_final, new)
        new = jnp.where(t < input_length, new, beta_next)
        return new, new

    # reverse scan over t = T-2 .. 0 consuming emissions at t+1; the final
    # frame's beta is beta_final (t = T-1 == input_length-1 when unpadded)
    _, betas_rev = jax.lax.scan(
        step,
        jnp.where(input_length == T, beta_final, jnp.full((S,), _NEG_INF)),
        (jnp.arange(T - 2, -1, -1), emissions[jnp.arange(T - 1, 0, -1)]),
    )
    betas = jnp.concatenate(
        [
            betas_rev[::-1],
            jnp.where(input_length == T, beta_final, _NEG_INF)[None],
        ],
        axis=0,
    )  # (T, S)

    # posteriors; ll = -nll.  Impossible alignments (ll ~ -inf) and padded
    # frames get exactly zero gradient.
    ok = nll < -_NEG_INF / 2
    gamma = jnp.exp(
        jnp.clip(alphas + betas + nll, _NEG_INF, 0.0)
    ) * ok.astype(jnp.float32)
    gamma = gamma * (jnp.arange(T)[:, None] < input_length).astype(jnp.float32)
    grad = jnp.zeros((T, C), jnp.float32).at[:, z].add(-gamma)
    return grad


def _alpha_step(alpha, t, emit, can_skip, valid_s, input_length):
    """One forward lattice step (identical fp ops to `_alpha_all`'s body),
    with t == 0 handled uniformly so a scan can start from a virtual -inf
    carry — this is what lets the segmented backward recompute any segment
    from its entry checkpoint, including the first."""
    S = alpha.shape[0]
    a_prev = jnp.concatenate([jnp.array([_NEG_INF]), alpha[:-1]])
    a_skip = jnp.where(
        can_skip,
        jnp.concatenate([jnp.full((2,), _NEG_INF), alpha[:-2]]),
        _NEG_INF,
    )
    stacked = jnp.stack([alpha, a_prev, a_skip])
    m = stacked.max(0)
    new = m + jnp.log(jnp.exp(stacked - m).sum(0))
    new = jnp.where(m <= _NEG_INF / 2, _NEG_INF, new) + emit
    new = jnp.where(valid_s, new, _NEG_INF)
    new = jnp.where(t < input_length, new, alpha)
    alpha0 = jnp.where(jnp.arange(S) < 2, emit, _NEG_INF)
    alpha0 = jnp.where(valid_s & (input_length > 0), alpha0, _NEG_INF)
    return jnp.where(t == 0, alpha0, new)


def _beta_step(
    beta_next, t, emit_next, skip_ok_from, valid_s, beta_final, input_length
):
    """One reverse lattice step (identical fp ops to `_ctc_grad_single`'s
    body), uniform from a virtual -inf carry past the last frame."""
    b = emit_next + beta_next
    b_next = jnp.concatenate([b[1:], jnp.array([_NEG_INF])])
    b_skip = jnp.where(
        skip_ok_from,
        jnp.concatenate([b[2:], jnp.full((2,), _NEG_INF)]),
        _NEG_INF,
    )
    stacked = jnp.stack([b, b_next, b_skip])
    m = stacked.max(0)
    new = m + jnp.log(jnp.exp(stacked - m).sum(0))
    new = jnp.where(m <= _NEG_INF / 2, _NEG_INF, new)
    new = jnp.where(valid_s, new, _NEG_INF)
    new = jnp.where(t == input_length - 1, beta_final, new)
    new = jnp.where(t < input_length, new, beta_next)
    return new


def _alpha_segments(lp_pad, labels, input_length, label_length, blank_id, K):
    """Segmented forward: nll + segment-entry alpha checkpoints (n_seg, S).

    Memory: O((T/K)·S) checkpoints + O(K·S) working set, vs the monolithic
    `_alpha_all`'s (T, S) alphas AND (T, S) hoisted emissions — the 1-hour
    budget's dominant line (docs/MEMORY_BUDGET_1H.md "CTC lattice").  The
    emission gather happens per segment inside the scan, so only (K, S) of
    it is ever live."""
    Tp, C = lp_pad.shape
    n_seg = Tp // K
    S = 2 * labels.shape[0] + 1
    z, can_skip, valid_s = _lattice(labels, label_length, blank_id, S)
    lp_seg = lp_pad.reshape(n_seg, K, C)

    def outer(alpha, seg):
        t0, lps = seg
        em = lps[:, z]  # (K, S) — per-segment gather

        def inner(a, te):
            t, e = te
            return _alpha_step(a, t, e, can_skip, valid_s, input_length), None

        alpha_out, _ = jax.lax.scan(
            inner, alpha, (t0 + jnp.arange(K), em)
        )
        return alpha_out, alpha  # checkpoint = carry ENTERING this segment

    alpha_T, ckpts = jax.lax.scan(
        outer,
        jnp.full((S,), _NEG_INF),
        (jnp.arange(n_seg) * K, lp_seg),
    )

    end1 = 2 * label_length
    end2 = 2 * label_length - 1
    a1 = alpha_T[end1]
    a2 = jnp.where(
        label_length > 0, alpha_T[jnp.maximum(end2, 0)], _NEG_INF
    )
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    return -ll, ckpts


def _grad_segments(
    lp_pad, labels, input_length, label_length, ckpts, nll, blank_id, K
):
    """Segmented exact CTC gradient: reverse scan over segments carrying
    beta (S,); inside each segment the K alphas are RECOMPUTED from the
    entry checkpoint while the K betas run backwards, so only (K, S)-sized
    alpha/beta/gamma blocks are ever live (vs four (T, S) tensors in the
    monolithic `_ctc_grad_single`)."""
    Tp, C = lp_pad.shape
    n_seg = Tp // K
    S = 2 * labels.shape[0] + 1
    z, can_skip, valid_s = _lattice(labels, label_length, blank_id, S)
    skip_ok_from = jnp.concatenate([can_skip[2:], jnp.zeros((2,), bool)])

    end1 = 2 * label_length
    end2 = jnp.maximum(2 * label_length - 1, 0)
    s_idx = jnp.arange(S)
    beta_final = jnp.where(
        (s_idx == end1) | ((s_idx == end2) & (label_length > 0)), 0.0, _NEG_INF
    )

    lp_seg = lp_pad.reshape(n_seg, K, C)
    # the beta step at t consumes emissions[t + 1]; a segment's last step
    # (t = t0 + K - 1) needs row t0 + K = the NEXT segment's first row
    nxt0 = jnp.concatenate(
        [lp_seg[1:, 0, :], jnp.zeros((1, C), lp_pad.dtype)], axis=0
    )  # (n_seg, C)
    ok = (nll < -_NEG_INF / 2).astype(jnp.float32)

    def outer(beta_carry, seg):
        t0, lps, nxt = seg[0], seg[1], seg[2]
        ckpt = seg[3]
        em = lps[:, z]  # (K, S) rows t0 .. t0+K-1
        em_next_last = nxt[z]  # (S,) row t0+K

        def ia(a, te):
            t, e = te
            na = _alpha_step(a, t, e, can_skip, valid_s, input_length)
            return na, na

        _, alphas = jax.lax.scan(ia, ckpt, (t0 + jnp.arange(K), em))

        em_shift = jnp.concatenate([em[1:], em_next_last[None]], axis=0)

        def ib(bn, te):
            t, e_next = te
            nb = _beta_step(
                bn, t, e_next, skip_ok_from, valid_s, beta_final, input_length
            )
            return nb, nb

        _, betas_rev = jax.lax.scan(
            ib, beta_carry, (t0 + K - 1 - jnp.arange(K), em_shift[::-1])
        )
        betas = betas_rev[::-1]

        gamma = jnp.exp(jnp.clip(alphas + betas + nll, _NEG_INF, 0.0)) * ok
        gamma = gamma * (
            (t0 + jnp.arange(K))[:, None] < input_length
        ).astype(jnp.float32)
        gseg = jnp.zeros((K, C), jnp.float32).at[:, z].add(-gamma)
        return betas[0], gseg

    _, grads_rev = jax.lax.scan(
        outer,
        jnp.full((S,), _NEG_INF),
        (
            jnp.arange(n_seg)[::-1] * K,
            lp_seg[::-1],
            nxt0[::-1],
            ckpts[::-1],
        ),
    )
    return grads_rev[::-1].reshape(Tp, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_nll_seg(
    log_probs, labels, input_lengths, label_lengths, blank_id, segment_size
):
    """Per-sequence CTC nll with the SEGMENTED analytic backward: only
    segment-entry alpha checkpoints are saved; each segment's alphas are
    recomputed during the beta recursion.  Residual memory O((T/K + K)·S)
    instead of O(T·S) — the lever named in docs/MEMORY_BUDGET_1H.md for
    1-hour lattices (45k × 18k fp32 ≈ 3.2 GB per (T, S) tensor)."""
    nll, _ = jax.vmap(_alpha_segments, in_axes=(0, 0, 0, 0, None, None))(
        log_probs, labels, input_lengths, label_lengths, blank_id, segment_size
    )
    return nll


def _ctc_nll_seg_fwd(
    log_probs, labels, input_lengths, label_lengths, blank_id, segment_size
):
    nll, ckpts = jax.vmap(_alpha_segments, in_axes=(0, 0, 0, 0, None, None))(
        log_probs, labels, input_lengths, label_lengths, blank_id, segment_size
    )
    return nll, (log_probs, labels, input_lengths, label_lengths, ckpts, nll)


def _ctc_nll_seg_bwd(blank_id, segment_size, res, g):
    log_probs, labels, input_lengths, label_lengths, ckpts, nll = res
    grad = jax.vmap(
        _grad_segments, in_axes=(0, 0, 0, 0, 0, 0, None, None)
    )(
        log_probs,
        labels,
        input_lengths,
        label_lengths,
        ckpts,
        nll,
        blank_id,
        segment_size,
    )
    grad = grad * g[:, None, None]
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (grad, f0(labels), f0(input_lengths), f0(label_lengths))


_ctc_nll_seg.defvjp(_ctc_nll_seg_fwd, _ctc_nll_seg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_nll(log_probs, labels, input_lengths, label_lengths, blank_id):
    """Per-sequence CTC nll, batched, with the analytic backward."""
    return jax.vmap(_ctc_alpha_single, in_axes=(0, 0, 0, 0, None))(
        log_probs, labels, input_lengths, label_lengths, blank_id
    )


def _ctc_nll_fwd(log_probs, labels, input_lengths, label_lengths, blank_id):
    nll, alphas = jax.vmap(_alpha_all, in_axes=(0, 0, 0, 0, None))(
        log_probs, labels, input_lengths, label_lengths, blank_id
    )
    return nll, (log_probs, labels, input_lengths, label_lengths, alphas, nll)


def _ctc_nll_bwd(blank_id, res, g):
    log_probs, labels, input_lengths, label_lengths, alphas, nll = res
    grad = jax.vmap(_ctc_grad_single, in_axes=(0, 0, 0, 0, 0, 0, None))(
        log_probs, labels, input_lengths, label_lengths, alphas, nll, blank_id
    )
    grad = grad * g[:, None, None]
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (grad, f0(labels), f0(input_lengths), f0(label_lengths))


_ctc_nll.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss(
    log_probs: jnp.ndarray,  # (B, T, C) log-probs (model output)
    labels: jnp.ndarray,  # (B, U) int labels, padded
    input_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: Optional[int] = None,
    reduction: str = "sum",
    segment_size: Optional[int] = None,
) -> jnp.ndarray:
    """CTC negative log-likelihood.  blank defaults to the LAST class
    (the lcasr convention: vocab 4095 + blank = class 4095).

    segment_size: when set, use the segmented backward — residual memory
    O((T/K + K)·S) instead of O(T·S), at the cost of one extra alpha pass
    (recompute) in the backward.  Pick K ≈ √T (e.g. 256 for the 1-hour
    T_sub = 45,000 lattice, where the monolithic residuals are ~3.2 GB per
    (T, S) tensor).  Gradients match the monolithic path (same fp ops)."""
    if blank_id is None:
        blank_id = log_probs.shape[-1] - 1
    lp = log_probs.astype(jnp.float32)
    if segment_size is not None and segment_size > 0:
        T = lp.shape[1]
        K = int(segment_size)
        Tp = ((T + K - 1) // K) * K
        if Tp != T:
            # padded rows are inert: alpha/beta carry past input_length and
            # gamma is masked by t < input_length, so zeros are fine
            lp = jnp.pad(lp, ((0, 0), (0, Tp - T), (0, 0)))
        nll = _ctc_nll_seg(
            lp,
            labels,
            input_lengths.astype(jnp.int32),
            label_lengths.astype(jnp.int32),
            blank_id,
            K,
        )
    else:
        nll = _ctc_nll(
            lp,
            labels,
            input_lengths.astype(jnp.int32),
            label_lengths.astype(jnp.int32),
            blank_id,
        )
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        # torch CTCLoss 'mean': per-sample loss / target_length, then batch
        # mean (zero-length targets divide by 1, as torch clamps)
        return (nll / jnp.maximum(label_lengths, 1)).mean()
    return nll


def wctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: Optional[int] = None,
    mode: str = "soft",
    reduction: str = "sum",
) -> jnp.ndarray:
    """Wild-card CTC — faithful to reference `lcasr/losses/wctc.py:7-68`:

      * the augmented lattice carries a WILDCARD column pinned to log-prob 0
        at EVERY time step, feeding the first blank/label states — so the
        alignment may BEGIN at any frame for free (untranscribed prefix),
      * the two end states are read out at EVERY time step, and the per-time
        end log-likelihoods combine by mode (untranscribed suffix):
          'soft'     — softmax-over-time expectation Σ_t p_t·y_t,
          'max_prob' — max_t y_t,
          'sum_prob' — logsumexp_t y_t.

    The reference runs the recursion over the full (unbatched) T and never
    consults input_lengths; here batch rows are padded, so frames at
    t >= input_length are excluded from the per-time readout (identical to
    the reference on unpadded inputs)."""
    if blank_id is None:
        blank_id = log_probs.shape[-1] - 1
    lp = log_probs.astype(jnp.float32)

    def single(lpb, lab, il, ll):
        T, C = lpb.shape
        lab = lab.astype(jnp.int32)
        lab_ext = jnp.concatenate([lab, lab[:1]])  # (U+1,)
        tgt = jnp.stack(
            [jnp.full_like(lab_ext, blank_id), lab_ext], axis=-1
        ).reshape(-1)  # (2U+2,): [b, l1, b, l2, ..., b, lU, b, l1]
        tgt = jnp.where(tgt < 0, blank_id, tgt)
        S = tgt.shape[0]
        diff = jnp.concatenate(
            [jnp.array([False, True]), tgt[2:] != tgt[:-2]]
        )  # reference diff_labels: the first LABEL may skip in from the
        #    wildcard at any time
        emissions = lpb[:, tgt]  # (T, S)

        def end_ll(alpha):
            # reference gathers at augmented cols (zp+2L-1, zp+2L); doing the
            # take on [NEG, wildcard] + alpha reproduces the L == 0 edge too
            aug = jnp.concatenate([jnp.array([_NEG_INF, 0.0]), alpha])
            pair = jnp.take(aug, jnp.array([1, 2]) + 2 * ll)
            m = pair.max()
            return m + jnp.log(jnp.exp(pair - m).sum())

        alpha0 = (
            jnp.full((S,), _NEG_INF)
            .at[0].set(lpb[0, blank_id])
            .at[1].set(lpb[0, tgt[1]])
        )

        def step(alpha, emit):
            # augmented left/skip sources: col 0's left neighbour and col 1's
            # skip source are the PERMANENT wildcard (log-prob 0)
            from_left = jnp.concatenate([jnp.array([0.0]), alpha[:-1]])
            from_skip = jnp.concatenate([jnp.array([_NEG_INF, 0.0]), alpha[:-2]])
            stacked = jnp.stack(
                [alpha, from_left, jnp.where(diff, from_skip, _NEG_INF)]
            )
            m = stacked.max(0)
            new = m + jnp.log(jnp.exp(stacked - m).sum(0)) + emit
            return new, end_ll(new)

        alpha_last, ys = jax.lax.scan(step, alpha0, emissions[1:])
        ys = jnp.concatenate([end_ll(alpha0)[None], ys])  # (T,)
        valid_t = jnp.arange(T) < il
        ys_masked = jnp.where(valid_t, ys, _NEG_INF)
        if mode == "soft":
            p = jax.nn.softmax(ys_masked)
            sigma = (p * jnp.where(valid_t, ys, 0.0)).sum()
        elif mode == "max_prob":
            sigma = ys_masked.max()
        elif mode == "sum_prob":
            m = ys_masked.max()
            sigma = m + jnp.log(jnp.exp(ys_masked - m).sum())
        else:
            raise ValueError(f"unknown wctc mode {mode!r}")
        return -sigma

    nll = jax.vmap(single)(lp, labels, input_lengths, label_lengths)
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        return nll.mean()
    return nll

"""CTC loss (log-semiring forward over the interleaved-blank lattice) + WCTC.

TPU-native replacement for the reference's cuDNN-backed
`torch.nn.CTCLoss(blank=num_classes-1, reduction='sum')`
(reference `exp/train.py:104`) and the pure-python wildcard CTC
(reference `lcasr/losses/wctc.py:7-74`).

Implementation: the standard alpha recursion over the augmented label
sequence z = [b, y1, b, y2, ..., yU, b] (blank interleaved), scanned over
time with `lax.scan`, all in fp32 log-space, vmapped over the batch.
Blank can be ANY class id (the lcasr convention is blank = LAST id).
Gradients flow through the scan via autodiff — XLA fuses the per-step
logsumexp into a tight loop, so no custom backward is needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

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
    # guard: impossible alignments (T < required length) give +inf-ish loss;
    # torch returns inf there as well with zero_infinity=False
    return nll


def ctc_loss(
    log_probs: jnp.ndarray,  # (B, T, C) log-probs (model output)
    labels: jnp.ndarray,  # (B, U) int labels, padded
    input_lengths: jnp.ndarray,  # (B,)
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: Optional[int] = None,
    reduction: str = "sum",
) -> jnp.ndarray:
    """CTC negative log-likelihood.  blank defaults to the LAST class
    (the lcasr convention: vocab 4095 + blank = class 4095)."""
    if blank_id is None:
        blank_id = log_probs.shape[-1] - 1
    lp = log_probs.astype(jnp.float32)
    nll = jax.vmap(_ctc_alpha_single, in_axes=(0, 0, 0, 0, None))(
        lp, labels, input_lengths, label_lengths, blank_id
    )
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        return nll.mean()
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
    """Wild-card CTC (reference `lcasr/losses/wctc.py`): tolerant to
    untranscribed prefixes/suffixes by letting the alignment start at any
    label position with a free "wildcard" prefix row.

    Implemented as the standard lattice but with the initial alpha allowing
    every augmented position (mode='soft': uniform prior over start states).
    """
    if blank_id is None:
        blank_id = log_probs.shape[-1] - 1
    lp = log_probs.astype(jnp.float32)

    def single(lpb, lab, il, ll):
        T, C = lpb.shape
        U = lab.shape[0]
        S = 2 * U + 1
        z = jnp.full((S,), blank_id, dtype=jnp.int32)
        z = z.at[1::2].set(lab.astype(jnp.int32))
        prev2 = jnp.concatenate([jnp.full((2,), -1, jnp.int32), z[:-2]])
        can_skip = (z != blank_id) & (z != prev2)
        valid_s = jnp.arange(S) < (2 * ll + 1)
        emissions = lpb[:, z]  # (T, S) hoisted gather
        # wildcard start: any state may begin the path (il == 0 → no valid
        # frame 0 → all -inf, same contract as ctc_loss)
        alpha0 = jnp.where(valid_s & (il > 0), emissions[0], _NEG_INF)

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
            new = jnp.where(t < il, new, alpha)
            return new, None

        alpha_T, _ = jax.lax.scan(step, alpha0, (jnp.arange(1, T), emissions[1:]))
        # wildcard end: sum over all end states (suffix may be untranscribed)
        masked = jnp.where(valid_s, alpha_T, _NEG_INF)
        if mode == "max_prob":
            ll_val = masked.max()
        else:  # soft / sum_prob
            m = masked.max()
            ll_val = m + jnp.log(jnp.exp(masked - m).sum())
        return -ll_val

    nll = jax.vmap(single)(lp, labels, input_lengths, label_lengths)
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        return nll.mean()
    return nll

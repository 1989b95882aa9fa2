"""CTC beam search with optional language-model fusion.

Counterpart of reference `lcasr/decoding/ctc_beam_search.py:18-322` (and the
pyctcdecode usage in `lcasr/eval/utils.py:14-43`): frame-synchronous prefix
beam search over CTC posteriors, score = AM + α·LM + β·|tokens|, with
  * top-AM candidate pruning per frame (`logit > max + threshold`,
    reference `:224-228`),
  * merging of prefixes (logsumexp over blank/non-blank AM mass),
  * batched LM scoring: all beams needing LM probabilities are evaluated in
    ONE call per frame (reference `:287-317`) — the LM hook receives the
    full prefix batch and returns next-token log-probs.

The LM is any callable `lm_scores(prefixes: List[List[int]]) -> np.ndarray
(n_prefixes, vocab)` of next-token log-probs; `FlaxLMScorer` adapts a jitted
causal LM.  With `lm_scores=None` this is plain CTC prefix beam search (the
pyctcdecode-equivalent path).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

LOG0 = -1e30
# reference default (`ctc_beam_search.py` top_am_threshold); shared with the
# serving layer's device-side above-threshold count
DEFAULT_TOP_AM_THRESHOLD = -6.0


def _logsumexp(a: float, b: float) -> float:
    if a <= LOG0 / 2:
        return b
    if b <= LOG0 / 2:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


@dataclass
class Beam:
    prefix: Tuple[int, ...] = ()
    p_blank: float = 0.0  # log prob of prefix ending in blank
    p_non_blank: float = LOG0  # log prob of prefix ending in its last token
    lm_score: float = 0.0  # cumulative α·LM + β·len bonus
    frames: Tuple[int, ...] = ()  # first-emission frame per token (timestamps)
    best_contrib: float = LOG0  # strongest merged-in path mass (for frames)

    @property
    def am_score(self) -> float:
        return _logsumexp(self.p_blank, self.p_non_blank)

    @property
    def score(self) -> float:
        return self.am_score + self.lm_score


class BeamSearch:
    def __init__(
        self,
        tokenizer=None,
        beam_width: int = 25,
        blank_id: Optional[int] = None,
        alpha: float = 0.45,
        beta: float = 1.53,
        # beam-score prune margin (reference prune_less_than_val, a POSITIVE
        # value like 8.0: beams below best - val are dropped); None = off
        prune_less_than_val: Optional[float] = None,
        top_am_threshold: float = DEFAULT_TOP_AM_THRESHOLD,
        lm_scores: Optional[Callable[[List[List[int]]], np.ndarray]] = None,
        # > 0: truncate the LM context to the last n tokens (reference
        # trim_cache semantics, within one token for a stateless scorer)
        max_cache_length: int = -1,
        # lcasr convention: id 0 is pad/unk and never proposed (reference
        # :224, frame_sync :252).  None = every id is a candidate (generic
        # vocabularies).
        pad_id: Optional[int] = None,
    ):
        self.tokenizer = tokenizer
        self.beam_width = beam_width
        self.blank_id = blank_id
        self.alpha = alpha
        self.beta = beta
        self.top_am_threshold = top_am_threshold
        self.lm_scores = lm_scores
        self.prune_less_than_val = prune_less_than_val
        self.max_cache_length = max_cache_length
        self.pad_id = pad_id
        self.reset()

    def reset(self) -> None:
        """Clear search state; advance() continues from a fresh empty beam.
        (run_search = reset + advance + best; advance() alone supports
        streaming callers — `serving` feeds finalized logit blocks as they
        exist, reference semantics unchanged.)"""
        self._beams: Dict[Tuple[int, ...], Beam] = {(): Beam()}
        # per-prefix LM memo: a prefix's next-token distribution is
        # frame-independent, so only NEWLY-created prefixes ever need a
        # forward (pruned each frame to the live beam set)
        self._lm_memo: Dict[Tuple[int, ...], np.ndarray] = {}

    def run_search(self, log_probs: np.ndarray, decode: bool = True):
        """log_probs: (T, C) CTC log posteriors → best transcript (or ids)."""
        self.reset()
        self.advance(log_probs)
        best = self.best()
        ids = list(best.prefix)
        if decode and self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return ids

    def best(self) -> Beam:
        """Highest-scoring live beam (also cached as self._best)."""
        best = max(self._beams.values(), key=lambda b: b.score)
        self._best = best
        return best

    def live_prefixes(self) -> List[Tuple[int, ...]]:
        """Live beam prefixes, best first (for streaming common-prefix
        emission)."""
        ranked = sorted(self._beams.values(), key=lambda b: -b.score)
        return [b.prefix for b in ranked]

    def advance(self, log_probs: np.ndarray, t0: int = 0) -> None:
        """Advance the search over a block of frames.  `t0` is the GLOBAL
        index of the block's first frame, so timestamps stay global across
        streamed blocks.

        No-LM searches route through the C++ block advance when available
        (native/beam_native.cpp — exact same semantics, ~10x the Python
        loop at trained-model peakiness, more when flat); the Python path
        below is the parity oracle and the LM-fused path."""
        T, C = log_probs.shape
        blank = self.blank_id if self.blank_id is not None else C - 1
        # gated on float32 input: the candidate threshold compares in the
        # input dtype (NEP-50 weak promotion), so a float64 caller must take
        # the python path for bit-identical pruning
        if self.lm_scores is None and T > 0 and (
            log_probs.dtype == np.float32
        ) and not getattr(self, "_force_python", False):
            from lcasr_tpu.native import load_beam_native

            mod = load_beam_native()
            if mod is not None:
                res = mod.advance(
                    [(b.prefix, b.p_blank, b.p_non_blank, b.frames)
                     for b in self._beams.values()],
                    np.ascontiguousarray(log_probs, np.float32),
                    T,
                    C,
                    t0,
                    blank,
                    -1 if (self.pad_id is None or self.pad_id == blank)
                    else self.pad_id,
                    float(self.top_am_threshold),
                    self.beam_width,
                    float("nan") if self.prune_less_than_val is None
                    else float(self.prune_less_than_val),
                )
                self._beams = {
                    p: Beam(p, pb, pnb, 0.0, fr)
                    for p, pb, pnb, fr in res
                }
                return
        beams = self._beams
        lm_memo = self._lm_memo

        for t_local in range(T):
            t = t0 + t_local
            frame = log_probs[t_local]
            # top-AM pruning (reference :224-228); the configured pad id is
            # never a candidate unless it IS blank
            keep = np.where(frame > frame.max() + self.top_am_threshold)[0]
            if self.pad_id is not None and blank != self.pad_id:
                keep = keep[keep != self.pad_id]
            if keep.size == 0:
                # no candidate survived (pad was the sole above-threshold
                # class, or a non-negative threshold excluded even the
                # argmax): carry the beams unchanged rather than emptying
                # the beam set for all remaining frames (frame_sync.py has
                # the same guard; beam_native.cpp mirrors this)
                continue

            # one batched LM call per frame for prefixes not already scored
            lm_next: Optional[Dict[Tuple[int, ...], np.ndarray]] = None
            if self.lm_scores is not None and any(k != blank for k in keep):
                missing = [p for p in beams if p not in lm_memo]
                if missing:
                    mcl = self.max_cache_length
                    ctx = [
                        list(p)[-mcl:] if mcl > 0 else list(p)
                        for p in missing
                    ]
                    scores = self.lm_scores(ctx)
                    for i, p in enumerate(missing):
                        lm_memo[p] = scores[i]
                lm_next = lm_memo

            new_beams: Dict[Tuple[int, ...], Beam] = {}

            def upd(prefix, lm_score, frames, p_blank=LOG0, p_non_blank=LOG0):
                b = new_beams.get(prefix)
                if b is None:
                    b = Beam(prefix, LOG0, LOG0, lm_score, frames)
                    new_beams[prefix] = b
                b.p_blank = _logsumexp(b.p_blank, p_blank)
                b.p_non_blank = _logsumexp(b.p_non_blank, p_non_blank)
                b.lm_score = lm_score  # deterministic per prefix
                # timestamps follow the STRONGEST merged-in path, not
                # whichever was iterated first
                contrib = _logsumexp(p_blank, p_non_blank)
                if contrib > b.best_contrib:
                    b.best_contrib = contrib
                    b.frames = frames

            for prefix, beam in beams.items():
                last = prefix[-1] if prefix else None
                for c in keep:
                    p = float(frame[c])
                    if c == blank:
                        upd(prefix, beam.lm_score, beam.frames,
                            p_blank=beam.am_score + p)
                    elif c == last:
                        # repeat collapses into same prefix...
                        upd(prefix, beam.lm_score, beam.frames,
                            p_non_blank=beam.p_non_blank + p)
                        # ...or extends after an explicit blank
                        new_prefix = prefix + (int(c),)
                        lm_add = self._lm_add(lm_next, prefix, c)
                        upd(new_prefix, beam.lm_score + lm_add,
                            beam.frames + (t,), p_non_blank=beam.p_blank + p)
                    else:
                        new_prefix = prefix + (int(c),)
                        lm_add = self._lm_add(lm_next, prefix, c)
                        upd(new_prefix, beam.lm_score + lm_add,
                            beam.frames + (t,), p_non_blank=beam.am_score + p)

            ranked = sorted(new_beams.values(), key=lambda b: -b.score)
            ranked = ranked[: self.beam_width]
            if self.prune_less_than_val is not None and ranked:
                cut = ranked[0].score - self.prune_less_than_val
                ranked = [b for b in ranked if b.score >= cut]
            beams = {b.prefix: b for b in ranked}
            if self.lm_scores is not None:
                lm_memo = {p: v for p, v in lm_memo.items() if p in beams}

        self._beams = beams
        self._lm_memo = lm_memo

    def decode_beams(
        self,
        log_probs: np.ndarray,
        ds_factor: float = 8.0,
        frames_per_second: float = 100.0,
    ):
        """Beam search with word-level timestamps.

        Counterpart of the reference's pyctcdecode `decode_beams_lm` usage
        (reference `lcasr/eval/utils.py:14-43`): returns
        {'text', 'frames': [{'word','start','end'} in seconds], 'am_score'}.
        Word boundaries come from the tokenizer's ▁ pieces; start/end frames
        are the first/last piece-emission frames scaled by the subsampling
        factor.
        """
        from lcasr_tpu.decoding.timestamps import words_from_ids

        self.run_search(log_probs, decode=False)
        beams_best = self._best
        ids, frames = list(beams_best.prefix), list(beams_best.frames)
        out_words = (
            words_from_ids(self.tokenizer, ids, frames, ds_factor,
                           frames_per_second)
            if self.tokenizer else []
        )
        return {
            "text": self.tokenizer.decode(ids) if self.tokenizer else ids,
            "frames": out_words,
            "am_score": beams_best.am_score,
            "score": beams_best.score,
        }

    def _lm_add(self, lm_next, prefix, c) -> float:
        if lm_next is None:
            return 0.0
        return self.alpha * float(lm_next[prefix][int(c)]) + self.beta

    # reference-compatible alias
    __call__ = run_search


class FlaxLMScorer:
    """Adapt a jitted causal LM `fn(tokens (B, U)) -> logits (B, U, V)` into
    the batched `lm_scores` hook (prefixes padded to a shared bucket; one
    forward per frame, mirroring the reference's stacked-KV batching)."""

    def __init__(self, fn: Callable, bos_id: int = 2, pad_id: int = 0,
                 bucket: int = 32, fn_last: Optional[Callable] = None,
                 batch_bucket: int = 8):
        self.fn = fn
        # fn_last(tokens (B, U), last (B,)) -> (B, V) next-token LOG-PROBS,
        # gathered + log-softmaxed ON DEVICE (transfers B·V instead of
        # B·U·V per call)
        self.fn_last = fn_last
        self.bos_id = bos_id
        self.pad_id = pad_id
        self.bucket = bucket
        # the batch dim is bucketed too: live-beam counts fluctuate frame to
        # frame and each distinct (n, U) shape is a separate XLA compile
        self.batch_bucket = batch_bucket

    def __call__(self, prefixes: List[List[int]]) -> np.ndarray:
        n = len(prefixes)
        nb = -(-n // self.batch_bucket) * self.batch_bucket
        max_len = max(len(p) for p in prefixes) + 1  # + bos
        U = -(-max_len // self.bucket) * self.bucket
        tokens = np.full((nb, U), self.pad_id, np.int32)
        tokens[:, 0] = self.bos_id  # padding rows stay valid inputs
        last = np.zeros((nb,), np.int32)
        for i, p in enumerate(prefixes):
            tokens[i, 1 : 1 + len(p)] = p
            last[i] = len(p)
        if self.fn_last is not None:
            return np.asarray(self.fn_last(tokens, last))[:n]
        logits = np.asarray(self.fn(tokens))
        out = logits[np.arange(n), last[:n]]
        m = out.max(-1, keepdims=True)  # stable log-softmax
        return out - (m + np.log(np.exp(out - m).sum(-1, keepdims=True)))

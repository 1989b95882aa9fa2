"""Frame-synchronous LM-fused CTC beam search — the reference algorithm.

Exact re-implementation of reference `lcasr/decoding/ctc_beam_search.py:18-322`
(the `tlm_beam.py` rescoring decoder), alongside the prefix-beam formulation
in `decoding/beam_search.py`:

  * beams carry an `am_sequence` WITH collapsed blanks (a blank is appended
    once after a non-blank; repeats collapse) and an `lm_sequence`
    (bos + emitted tokens) — reference `:233-276`,
  * per frame, candidate set = ids with `lgp > max + top_am_threshold`,
    ids 1..vocab (id 0/pad is never proposed) — reference `:224-231`,
  * blank/repeat extensions keep the LM state and add AM only (+ blank /
    repetition penalties); new tokens add `am + α·lm + β` — reference
    `:251-276`,
  * beams with identical am_sequences merge via logsumexp — reference
    `:160-172`,
  * prune to beam_width, then drop beams below `top - prune_less_than_val`
    — reference `:155-158,205-212`,
  * ONE batched LM call per frame for all beams that emitted a token, with
    per-beam KV caches — reference `:287-317`.  Here the caches live in a
    fixed-shape on-device buffer; parent rows are re-gathered by index each
    frame instead of host-side pad_sequence restacking.

The LM is anything implementing the BatchedCachedLM protocol below;
`CachedTransformerLM` adapts `models/lm.py` (true O(1)-per-step KV caching),
`HistoryLM` adapts any full-context scorer (tests / external LMs).
"""
from __future__ import annotations

import heapq
import math
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BEAM_WIDTH = 25


def _sum_log_scores(s1: float, s2: float) -> float:
    # reference :161-162
    if s1 >= s2:
        return s1 + math.log(1 + math.exp(s2 - s1))
    return s2 + math.log(1 + math.exp(s1 - s2))


@dataclass
class FSBeam:
    am_sequence: Tuple = (None,)  # no bos for am (reference :137)
    lm_sequence: Tuple[int, ...] = ()  # starts with bos
    stimes: Tuple[int, ...] = (0,)
    score: float = 0.0
    row: int = 0  # LM cache row currently holding this beam's state
    next_lps: Optional[np.ndarray] = None  # next-token log-probs


class HistoryLM:
    """BatchedCachedLM over a full-context scorer
    `fn(histories: List[List[int]]) -> (n, V) next-token log-probs`.

    `max_cache_length > 0` truncates each history to its last n tokens —
    the reference's trim_cache semantics (`:177-184`)."""

    def __init__(self, fn: Callable, bos_id: int = 2, max_cache_length: int = -1):
        self.fn = fn
        self.bos_id = bos_id
        self.max_cache_length = max_cache_length

    def init(self, width: int):
        lps = self.fn([[self.bos_id]])[0]
        return [[self.bos_id] for _ in range(width)], np.asarray(lps)

    def step(self, state, parent_idx, tokens, update_mask):
        state = [list(state[p]) for p in parent_idx]
        feed_rows = [j for j in range(len(tokens)) if update_mask[j]]
        for j in feed_rows:
            state[j].append(int(tokens[j]))
        lps = np.full((len(tokens), 1), 0.0)
        if feed_rows:
            out = np.asarray(self.fn([state[j] for j in feed_rows]))
            lps = np.zeros((len(tokens), out.shape[-1]), out.dtype)
            for i, j in enumerate(feed_rows):
                lps[j] = out[i]
        # reference trim_cache (:177-184) trims AFTER the LM call — the LM
        # must see the full pre-trim context for this step (trimming before
        # scoring was measured to diverge beam-for-beam from the reference)
        if self.max_cache_length > 0:
            for j in feed_rows:
                state[j] = state[j][-self.max_cache_length:]
        return state, lps


class CachedTransformerLM:
    """BatchedCachedLM over `models/lm.py:TransformerLM` with true per-beam
    KV caches: one jitted single-token forward per frame over all beam rows,
    parent states re-gathered by index on device."""

    def __init__(self, model, variables, width: int, max_len: int, bos_id: int = 2,
                 cache_dtype=None):
        import functools

        import jax
        import jax.numpy as jnp

        self.jnp = jnp
        self.bos_id = bos_id
        self.width = width
        self.max_len = max_len
        # bf16 halves the KV buffer (the only multi-GB tensor in rescoring);
        # keys/values round to bf16 at rest while scores stay fp32 — opt-in,
        # the fp32 default keeps beam-for-beam reference parity exact
        self.cache_dtype = cache_dtype if cache_dtype is not None else jnp.float32
        # host-side shadow of the device cache_lengths (exact mirror of the
        # gather/increment logic) so overflow is caught WITHOUT a per-step
        # device sync: past max_len the KV write mask is all-False and
        # scores would silently corrupt
        self._host_lengths = np.zeros((width,), np.int64)
        L, H, D = model.n_layers, model.n_heads, model.head_dim
        self.cache_shape = (L, 2, width, H, max_len + 1, D)
        # bucketed position capacity: each step's parent gather + attention
        # read touch the FULL (.., positions, ..) buffer, so sizing it for
        # the worst case from tick 0 moves GBs per tick on a 20-min search.
        # The buffer instead starts small and DOUBLES when the longest beam
        # approaches it; every step's math is exact (padded columns are
        # NEG_INF-masked and exp(-1e30 - m) underflows to exactly 0.0 in the
        # fp32 softmax), so bucketing is invisible to beam-for-beam parity.
        # Average traffic over a run halves; early ticks shrink ~10x.
        self._buf_len = min(256, max_len + 1)
        variables = jax.device_put(variables)

        @jax.jit
        def step_fn(variables, cache, lengths, parent_idx, tokens, update):
            # ONE full-cache producer per step (the parent gather); the
            # masked advance is a B-row scatter inside the model, so peak
            # cache memory is 2 buffers, not 4 (a full-tensor select here
            # OOM'd the 200-row 20-min cache of rescore_many)
            cache = cache[:, :, parent_idx]
            lengths = lengths[parent_idx]
            logits, cache, lengths = model.apply(
                variables, tokens[:, None], cache=cache, cache_lengths=lengths,
                write_mask=update,
            )
            lps = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
            return cache, lengths, lps

        self._step = functools.partial(step_fn, variables)

    def init(self, width: int):
        jnp = self.jnp
        assert width == self.width
        self._buf_len = min(256, self.max_len + 1)
        cache = jnp.zeros(
            self.cache_shape[:4] + (self._buf_len,) + self.cache_shape[5:],
            self.cache_dtype,
        )
        lengths = jnp.zeros((width,), jnp.int32)
        cache, lengths, lps = self._step(
            cache, lengths,
            jnp.arange(width), jnp.full((width,), self.bos_id, jnp.int32),
            jnp.ones((width,), bool),
        )
        self._host_lengths = np.ones((width,), np.int64)
        return (cache, lengths), np.asarray(lps[0])

    def step(self, state, parent_idx, tokens, update_mask):
        jnp = self.jnp
        cache, lengths = state
        parent_idx = np.asarray(parent_idx, np.int32)
        update_mask = np.asarray(update_mask, bool)
        hl = self._host_lengths[parent_idx] + update_mask
        if hl.max(initial=0) > self.max_len + 1:
            raise RuntimeError(
                f"LM KV cache overflow: a beam reached "
                f"{int(hl.max())} tokens > max_len={self.max_len} — size the "
                f"cache for the worst-case emission count (one per candidate "
                f"frame), not a heuristic"
            )
        self._host_lengths = hl
        # grow the bucket BEFORE the step so this step's write position
        # (old length <= hl.max() - 0/1) stays strictly inside the buffer
        # (`put` silently drops writes at position == Nmax)
        needed = min(int(hl.max(initial=0)) + 1, self.max_len + 1)
        if needed > self._buf_len:
            target = self._buf_len
            while target < needed:
                target *= 2
            target = min(target, self.max_len + 1)
            pad = [(0, 0)] * 6
            pad[4] = (0, target - self._buf_len)
            cache = jnp.pad(cache, pad)
            self._buf_len = target
        cache, lengths, lps = self._step(
            cache, lengths,
            jnp.asarray(parent_idx),
            jnp.asarray(np.asarray(tokens, np.int32)),
            jnp.asarray(update_mask),
        )
        return (cache, lengths), np.asarray(lps)

    def warm_buckets(self):
        """Compile the step at every bucket size this cache can reach, so a
        timed search never pays a mid-run compile when the buffer doubles
        (each growth retraces `step_fn` at the new positions shape)."""
        jnp = self.jnp
        sizes = []
        b = min(256, self.max_len + 1)
        while True:
            sizes.append(b)
            if b >= self.max_len + 1:
                break
            b = min(b * 2, self.max_len + 1)
        lengths = jnp.zeros((self.width,), jnp.int32)
        idx = jnp.arange(self.width)
        toks = jnp.full((self.width,), self.bos_id, jnp.int32)
        upd = jnp.ones((self.width,), bool)
        for s in sizes:
            cache = jnp.zeros(
                self.cache_shape[:4] + (s,) + self.cache_shape[5:],
                self.cache_dtype,
            )
            _, _, lps = self._step(cache, lengths, idx, toks, upd)
            lps.block_until_ready()
        return sizes


class FrameSyncBeamSearch:
    def __init__(
        self,
        lm,
        tokenizer=None,
        beam_width: int = DEFAULT_BEAM_WIDTH,
        alpha: float = 0.4,
        beta: float = 0.4,
        blank_id: Optional[int] = None,
        blank_penalty: float = 0.0,
        repetition_penalty: float = 0.0,
        top_am_threshold: float = -6.0,
        prune_less_than_val: Optional[float] = None,
        bos_id: int = 2,
    ):
        self.lm = lm
        self.tokenizer = tokenizer
        self.beam_width = beam_width
        self.alpha = alpha
        self.beta = beta
        self.blank_id = blank_id
        self.blank_penalty = blank_penalty
        self.repetition_penalty = repetition_penalty
        self.top_am_threshold = top_am_threshold
        self.prune_less_than_val = prune_less_than_val
        self.bos_id = bos_id

    def run_search(self, log_probs: np.ndarray, decode: bool = False):
        """log_probs (T, C) → token ids (lm_sequence minus bos) or text."""
        state, lps0 = self.lm.init(self.beam_width)
        gen = self.search_gen(np.asarray(log_probs), lps0)
        try:
            req = next(gen)
            while True:
                state, lps = self.lm.step(state, *req)
                req = gen.send(lps)
        except StopIteration as stop:
            beams = stop.value
        return self._finalize(beams, decode)

    def _finalize(self, beams: List[FSBeam], decode: bool):
        self.beams = beams
        best = beams[0]
        ids = list(best.lm_sequence[1:])
        if decode and self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return ids

    def search_gen(self, log_probs: np.ndarray, lps0: np.ndarray):
        """Stepwise core of `run_search` as a generator: runs host-side
        through blank-dominated frames and PAUSES (yields) exactly when it
        needs an LM step, yielding `(parent_idx, tokens, update_mask)`
        arrays of width `beam_width`; the driver `.send()`s back the
        (width, V) next-token log-probs.  Returns the final beam list.

        This is what lets `rescore_many` drive N recordings' searches
        concurrently off ONE shared device LM — the TPU-native equivalent
        of the reference's ray fan-out across recordings
        (`eval/tedlium/tlm_beam.py:55-61`), where each device round trip
        serves every blocked search at once instead of one."""
        log_probs = np.asarray(log_probs)  # scores accumulate in input dtype
        T, C = log_probs.shape
        blank = self.blank_id if self.blank_id is not None else C - 1
        # the emit-score gather below clips ids to the LM vocab on the
        # assumption that ONLY blank can exceed it (blank = last id, LM
        # vocab = C-1); with a different layout a real token would silently
        # score with the wrong LM column — refuse instead
        V = len(lps0)
        top_nonblank = C - 2 if blank == C - 1 else C - 1
        if top_nonblank >= V:
            raise ValueError(
                f"LM vocab {V} cannot score emit candidates up to id "
                f"{top_nonblank} (C={C}, blank={blank}); only a trailing "
                f"blank may exceed the LM vocab"
            )

        beams: List[FSBeam] = [
            FSBeam(lm_sequence=(self.bos_id,), next_lps=lps0, row=0)
        ]

        for t in range(T):
            frame = log_probs[t]
            keep_arr = np.where(frame > frame.max() + self.top_am_threshold)[0]
            keep_arr = keep_arr[keep_arr >= 1]  # drop pad id 0 (reference :224)
            keep = [int(i) for i in keep_arr]
            K = len(keep)
            if K == 0:
                # argmax is id 0 (pad — never proposed, reference :224-231)
                # and nothing else clears the AM threshold: a candidate-less
                # frame carries the beams over unchanged instead of emptying
                # the beam set (which would crash the next frame)
                continue

            # vectorized candidate scoring: one (n_beams, K) matrix instead
            # of per-candidate float() math in the inner loop (the loop below
            # only constructs the surviving beam objects)
            am_k = frame[keep_arr].astype(np.float64)  # (K,)
            base = np.array([b.score for b in beams], np.float64)[:, None]
            # lm weighting stays in the lps dtype before the f64 sum — the
            # exact fp-op order of the scalar formulation (parity-sensitive).
            # Gather with CLIPPED ids: the blank/stay columns are never read
            # from lm_k (stay_scores path), and blank may exceed the LM vocab
            lm_gather = np.minimum(keep_arr, len(beams[0].next_lps) - 1)
            lm_k = np.stack([b.next_lps[lm_gather] for b in beams]) * self.alpha + self.beta
            emit_scores = am_k[None, :] + lm_k.astype(np.float64) + base  # (n_b, K)
            stay_scores = am_k[None, :] + base  # + penalty, applied per case

            new_beams: List[FSBeam] = []
            for bi, beam in enumerate(beams):
                last = beam.am_sequence[-1]
                for ki, i in enumerate(keep):
                    if last == i or i == blank:
                        new_beams.append(FSBeam(
                            am_sequence=(
                                beam.am_sequence + (i,)
                                if i == blank and last != blank
                                else beam.am_sequence
                            ),
                            lm_sequence=beam.lm_sequence,
                            stimes=beam.stimes,
                            score=stay_scores[bi, ki] + (
                                self.blank_penalty if i == blank
                                else self.repetition_penalty
                            ),
                            row=beam.row,
                            next_lps=beam.next_lps,
                        ))
                    else:
                        new_beams.append(FSBeam(
                            am_sequence=(
                                beam.am_sequence[:-1] + (i,)
                                if last == blank
                                else beam.am_sequence + (i,)
                            ),
                            lm_sequence=beam.lm_sequence + (i,),
                            stimes=beam.stimes + (t,),
                            score=emit_scores[bi, ki],
                            row=beam.row,
                            next_lps=None,
                        ))

            # merge identical am sequences (logsumexp; first occurrence keeps
            # its LM identity — reference dict-insertion order :164-172)
            merged = {}
            for b in new_beams:
                key = b.am_sequence
                if key in merged:
                    merged[key].score = _sum_log_scores(b.score, merged[key].score)
                else:
                    merged[key] = b
            new_beams = heapq.nlargest(
                self.beam_width, merged.values(), key=lambda b: b.score
            )
            if self.prune_less_than_val is not None:
                top = new_beams[0].score
                new_beams = [
                    b for b in new_beams
                    if not b.score < top - self.prune_less_than_val
                ]

            if t == T - 1:
                beams = new_beams
                break

            # ONE batched LM call for all beams that emitted a token — and
            # NO call at all when none did (the typical blank-dominated
            # frame): rows are read-only until the next real step, so beams
            # keep their parent's row (shared rows are fine — the step's
            # parent gather duplicates them).  On a tunnel-attached chip this
            # removes a ~50 ms device round trip from almost every frame.
            if any(b.next_lps is None for b in new_beams):
                parent_idx = np.zeros((self.beam_width,), np.int32)
                tokens = np.zeros((self.beam_width,), np.int32)
                update = np.zeros((self.beam_width,), bool)
                for j, b in enumerate(new_beams):
                    parent_idx[j] = b.row
                    tokens[j] = b.lm_sequence[-1]
                    update[j] = b.next_lps is None
                lps = yield (parent_idx, tokens, update)
                for j, b in enumerate(new_beams):
                    b.row = j
                    if update[j]:
                        b.next_lps = lps[j]
            beams = new_beams

        return beams


def rescore_many(
    lm,
    logits_list: Sequence[np.ndarray],
    n_slots: int,
    tokenizer=None,
    decode: bool = False,
    **search_kwargs,
):
    """Rescore many recordings concurrently off ONE shared device LM.

    `lm` must be a BatchedCachedLM of width `n_slots * beam_width`: slot r
    owns rows [r·W, (r+1)·W).  Each recording's search runs host-side until
    it blocks on an LM step (`FrameSyncBeamSearch.search_gen`); every tick
    issues a SINGLE batched device call serving all blocked searches, with
    identity parent rows / update=False for finished slots.  On a
    dispatch-latency-bound link this multiplies rescoring throughput by
    ~n_slots over per-recording `run_search` while producing identical
    per-recording results (the per-row LM math is row-independent).

    Reference counterpart: `eval/tedlium/tlm_beam.py:55-61` fans recordings
    out across CPUs with ray; here the fan-out is across rows of the same
    accelerator call.  Returns per-recording results in input order."""
    width = search_kwargs.get("beam_width", DEFAULT_BEAM_WIDTH)
    results: List = [None] * len(logits_list)

    for wave_start in range(0, len(logits_list), n_slots):
        wave = range(wave_start, min(wave_start + n_slots, len(logits_list)))
        state, lps0 = lm.init(n_slots * width)
        live = {}  # slot -> (recording idx, searcher, generator)
        pending = {}  # slot -> (parent_idx, tokens, update)
        for slot, ridx in enumerate(wave):
            searcher = FrameSyncBeamSearch(
                lm=None, tokenizer=tokenizer, **search_kwargs
            )
            gen = searcher.search_gen(np.asarray(logits_list[ridx]), lps0)
            try:
                pending[slot] = next(gen)
                live[slot] = (ridx, searcher, gen)
            except StopIteration as stop:  # recording with no LM step at all
                results[ridx] = searcher._finalize(stop.value, decode)

        while live:
            parent = np.arange(n_slots * width, dtype=np.int32)
            tokens = np.zeros((n_slots * width,), np.int32)
            update = np.zeros((n_slots * width,), bool)
            for slot, (p, t, u) in pending.items():
                base = slot * width
                parent[base:base + width] = base + np.asarray(p, np.int32)
                tokens[base:base + width] = t
                update[base:base + width] = u
            state, lps = lm.step(state, parent, tokens, update)
            pending = {}
            for slot in list(live):
                ridx, searcher, gen = live[slot]
                base = slot * width
                try:
                    pending[slot] = gen.send(lps[base:base + width])
                except StopIteration as stop:
                    results[ridx] = searcher._finalize(stop.value, decode)
                    del live[slot]

    return results

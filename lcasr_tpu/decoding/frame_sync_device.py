"""On-device frame-synchronous LM-fused beam search.

The host implementation (`decoding/frame_sync.py`) is beam-for-beam exact
against the reference (`lcasr/decoding/ctc_beam_search.py:93-322`) but runs
the search loop host-side: every emitting frame pays a host→device round
trip for the LM step, and on a remote-attached chip those round trips are
half the wall (PERFORMANCE.md "LM rescoring").  This module is the
TPU-native formulation: the ENTIRE search — candidate selection, beam
extension, duplicate-sequence merging, pruning, and the cached-LM step —
runs as ONE jitted `lax.scan` over frames.  Zero round trips; the host
uploads logits once and downloads the winning token ids.

Semantics are the host algorithm's, expressed with fixed shapes:

  * W beam rows; dead rows carry score -1e30 (their extensions underflow to
    exactly 0 in every logsumexp merge, so they are arithmetically absent,
    and their merge hashes are per-row sentinels so they never claim a live
    beam's identity),
  * the AM sequence is tracked as two rolling 32-bit hashes of the sequence
    minus any trailing blank, plus a trailing-blank flag and the last entry
    — enough to decide stay/emit transitions and sequence equality (the
    merge rule) without materializing sequences,
  * candidates are the ≤ max_candidates ids above the AM threshold, sorted
    ASCENDING by id: the host builds beams beam-major × candidate-ascending,
    and both the merge rule ("first occurrence keeps its LM identity") and
    top-W tie-breaking follow that insertion order — the lexsorts here use
    (hash, insertion index) and (-score, first-occurrence index) to match,
  * the LM step fires under `lax.cond` only when a surviving beam emitted
    (the host's skip).  The KV cache is NEVER physically permuted: beams
    read their prefix through a per-position row map (`pos_row`), forked
    children share their parent's cells, and each append is allocated an
    unreferenced cell by a per-frame free-cell matching — so the cache
    flows through the scan carry with pure in-place scatters.  (The obvious
    `cache[:, :, parent]` gather instead forced XLA to copy the whole
    multi-hundred-MB buffer EVERY frame — measured 3.7 ms/frame, the entire
    wall of the first version.)

Differences from the host path, by construction:
  * scores accumulate in fp32 on device (host: float64) — over long searches
    merge/prune decisions can drift on near-ties; tests assert id equality
    on multi-hundred-frame searches and score agreement to ~1e-4,
  * at most `max_candidates` ids per frame (the host is unbounded; trained
    CTC posteriors are blank-dominated and rarely clear the threshold with
    more than 2-3 ids — pick max_candidates to cover the observed max),
  * requires the first-party `models/lm.py:TransformerLM` (the host path
    accepts any BatchedCachedLM).

The host implementation remains the parity oracle; `tests/test_frame_sync_
device.py` checks this module against it configuration by configuration.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

NEG = np.float32(-1e30)


class DeviceFrameSyncBeamSearch:
    """Drop-in device counterpart of `FrameSyncBeamSearch` +
    `CachedTransformerLM` for TransformerLM-rescored CTC beam search."""

    def __init__(
        self,
        model,
        variables,
        tokenizer=None,
        beam_width: int = 25,
        alpha: float = 0.4,
        beta: float = 0.4,
        blank_id: Optional[int] = None,
        blank_penalty: float = 0.0,
        repetition_penalty: float = 0.0,
        top_am_threshold: float = -6.0,
        prune_less_than_val: Optional[float] = None,
        bos_id: int = 2,
        max_tokens: int = 2048,
        max_candidates: int = 8,
        cache_dtype=None,
        frame_bucket: int = 2048,
    ):
        import jax
        import jax.numpy as jnp

        self.jax, self.jnp = jax, jnp
        self.model = model
        self.variables = jax.device_put(variables)
        self.tokenizer = tokenizer
        self.W = beam_width
        self.K = max_candidates
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.blank_id = blank_id
        self.blank_penalty = float(blank_penalty)
        self.repetition_penalty = float(repetition_penalty)
        self.thresh = float(top_am_threshold)
        self.plv = prune_less_than_val
        self.bos_id = bos_id
        self.S = max_tokens
        self.cache_dtype = cache_dtype if cache_dtype is not None else jnp.float32
        self.frame_bucket = frame_bucket
        # the scan runs ONE frame_bucket segment per device call, carry
        # threaded on device between calls: (a) a 20-min × N-recording
        # search is minutes of device time in one program, long enough to
        # trip the worker's execution watchdog (observed as "TPU worker
        # crashed" at N>=4); (b) every segment shares ONE compiled shape,
        # so recording length never recompiles (only N / beam config do)
        self._jit_init = jax.jit(self._init_carry, static_argnames=("N", "C"))
        self._jit_seg = jax.jit(self._run_segment, static_argnames=("C",))

        # candidate selection runs as its OWN program per recording: it
        # holds (T, C)-sized fp32 temps (~1 GB per 20-min recording at
        # C=4096) that must not coexist with the N-recording KV cache
        # inside the scan program — and its (T, K) outputs are tiny
        @jax.jit
        def _candidates(log_probs):
            T, C = log_probs.shape
            fmax = jnp.max(log_probs, -1, keepdims=True)
            passes = (log_probs > fmax + self.thresh) & (jnp.arange(C) >= 1)
            vals = jnp.where(passes, log_probs, NEG)
            topv, topi = jax.lax.top_k(vals, self.K)  # (T, K)
            valid = topv > NEG / 2
            # host candidate order is ASCENDING id, invalid slots last
            order = jnp.argsort(jnp.where(valid, topi, C + 1), axis=-1)
            cand = jnp.take_along_axis(topi, order, -1)
            am = jnp.take_along_axis(topv, order, -1).astype(jnp.float32)
            valid = jnp.take_along_axis(valid, order, -1)
            return cand, am, valid

        self._jit_candidates = _candidates

    # ------------------------------------------------------------------
    def _lm_apply(self, variables, cache, lengths, tokens, update,
                  pos_row=None, write_rows=None):
        jax, jnp = self.jax, self.jnp
        logits, cache, lengths = self.model.apply(
            variables, tokens[:, None], cache=cache, cache_lengths=lengths,
            write_mask=update, pos_row=pos_row, write_rows=write_rows,
        )
        lps = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
        return cache, lengths, lps

    def _init_carry(self, variables, N, C):
        jnp = self.jnp
        W, K, S = self.W, self.K, self.S
        Wt = N * W
        L, H, D = self.model.n_layers, self.model.n_heads, self.model.head_dim
        arW = jnp.arange(W)

        # LM bootstrap: every row scored at (bos,) — the host's lm.init.
        # The cache rows are FLAT (N·W): recording n owns rows
        # [n·W, (n+1)·W); all indirection stays recording-local.
        cache = jnp.zeros((L, 2, Wt, H, S + 1, D), self.cache_dtype)
        clen0 = jnp.zeros((Wt,), jnp.int32)
        cache, clen0, lps0 = self._lm_apply(
            variables, cache, clen0,
            jnp.full((Wt,), self.bos_id, jnp.int32), jnp.ones((Wt,), bool),
        )

        return dict(
            scores=jnp.full((N, W), NEG, jnp.float32).at[:, 0].set(0.0),
            h1=jnp.ones((N, W), jnp.uint32),
            h2=jnp.ones((N, W), jnp.uint32),
            last=jnp.full((N, W), -1, jnp.int32),  # am_sequence[-1]; -1 ≙ None
            lblank=jnp.zeros((N, W), bool),  # trailing blank on am_sequence
            lm_seq=jnp.zeros((N, W, S), jnp.int32),
            lm_len=jnp.zeros((N, W), jnp.int32),
            stimes=jnp.zeros((N, W, S + 1), jnp.int32),  # host stimes: (0,)
            st_len=jnp.ones((N, W), jnp.int32),
            next_lps=jnp.broadcast_to(lps0[0], (N, W, lps0.shape[-1])),
            cache=cache,
            clen=jnp.ones((N, W), jnp.int32),
            # per-POSITION row indirection (LOCAL rows 0..W-1): K/V at
            # position n of semantic beam j live in physical row
            # pos_row[j, n] of the recording's block.  The cache itself is
            # never permuted — only (Wt,)-row scatters touch it, so the
            # scan carry updates in place.  A physical parent gather here
            # (a fresh buffer out of the LM cond) forced XLA to copy the
            # whole cache EVERY frame: measured 3.7 ms/frame at a 2278-
            # position bf16 cache, the entire wall of the first version.
            pos_row=jnp.broadcast_to(arW[None, :, None].astype(jnp.int32),
                                     (N, W, S + 1)),
        )

    def _run_segment(self, variables, carry, cand_all, am_all, valid_all,
                     t0, C):
        """One scan segment: (N, Tseg, K) precomputed candidates, carry in,
        carry out.  N recordings search in lockstep — the per-frame
        bookkeeping floor amortizes over recordings exactly like
        `rescore_many`'s union ticks, but with zero per-frame round trips."""
        jax, jnp = self.jax, self.jnp
        W, K, S = self.W, self.K, self.S
        N, T, _ = cand_all.shape
        Wt = N * W
        blank = self.blank_id if self.blank_id is not None else C - 1
        V_lm = self.model.vocab_size
        P1 = jnp.uint32(1000003)
        P2 = jnp.uint32(2654435761)
        arW = jnp.arange(W)
        row_off = (jnp.arange(N) * W).astype(jnp.int32)

        # scan inputs are (T, N, K); candidates were precomputed by
        # _jit_candidates (a separate program — see __init__)
        cand_all = jnp.swapaxes(cand_all, 0, 1)
        am_all = jnp.swapaxes(am_all, 0, 1)
        valid_all = jnp.swapaxes(valid_all, 0, 1)

        BOOK = ("scores", "h1", "h2", "last", "lblank", "lm_seq", "lm_len",
                "stimes", "st_len", "next_lps", "clen", "pos_row")

        def frame_step(carry, inp):
            cand_n, am_n, valid_n, t = inp  # (N, K) ×3, scalar

            def bookkeeping(book, cand, am, valid):
                scores, h1, h2 = book["scores"], book["h1"], book["h2"]
                last, lblank = book["last"], book["lblank"]
                next_lps = book["next_lps"]

                # dead rows must never merge with live ones: give their
                # sequence hash a unique per-row sentinel
                dead = scores <= NEG / 2
                h1 = jnp.where(dead, jnp.uint32(0xDEAD0000) + arW.astype(jnp.uint32), h1)
                h2 = jnp.where(dead, jnp.uint32(0x5EED0000) + arW.astype(jnp.uint32), h2)

                is_blank = cand == blank  # (K,)
                same = (~lblank[:, None]) & (cand[None, :] == last[:, None])
                is_stay = is_blank[None, :] | same  # (W, K)
                is_emit = (~is_stay) & valid[None, :]

                # scoring — same fp op order as the host's vectorized path
                lmk = next_lps[:, jnp.minimum(cand, V_lm - 1)] * self.alpha + self.beta
                pen = jnp.where(is_blank[None, :],
                                self.blank_penalty, self.repetition_penalty)
                stay_sc = (am[None, :] + scores[:, None]) + pen
                emit_sc = (am[None, :] + lmk) + scores[:, None]
                sc = jnp.where(is_stay, stay_sc, emit_sc)
                sc = jnp.where(valid[None, :], sc, NEG)

                # child sequence features (hash excludes any trailing blank,
                # so emit-over-blank and emit-append share one update)
                tokh = cand[None, :].astype(jnp.uint32)
                ch1 = jnp.where(is_emit, h1[:, None] * P1 + tokh, h1[:, None])
                ch2 = jnp.where(is_emit, h2[:, None] * P2 + tokh, h2[:, None])
                # children of invalid candidate slots score NEG and must not
                # claim a live segment's first-occurrence identity either:
                # sentinel hashes keep them in singleton segments
                inv_sent = (jnp.uint32(0xBAD00000)
                            + jnp.arange(W * K, dtype=jnp.uint32)).reshape(W, K)
                ch1 = jnp.where(valid[None, :], ch1, inv_sent)
                ch2 = jnp.where(valid[None, :], ch2, inv_sent)
                c_lblank = jnp.where(
                    is_emit, False, lblank[:, None] | is_blank[None, :]
                )
                c_last = jnp.where(
                    is_emit, cand[None, :],
                    jnp.where(is_blank[None, :], blank, last[:, None]),
                )

                # merge identical am sequences.  WK = W·K is a few hundred,
                # so a dense (WK, WK) equality matrix is pure VPU work —
                # measured faster than lexsort + segment_{max,sum,min},
                # whose scatters serialize on TPU.  Rows are insertion-
                # ordered (beam-major, cand-ascending), so the first
                # occurrence (the host's dict-insertion identity holder) is
                # simply each group's minimum index.
                WK = W * K
                ins = jnp.arange(WK)
                f_sc = sc.reshape(WK)
                f_k1, f_k2 = ch1.reshape(WK), ch2.reshape(WK)
                f_kb = c_lblank.reshape(WK)
                # (a lexsort + segment_{max,sum,min} formulation measured
                # the same in a same-minute interleaved A/B — the per-frame
                # floor is the op-chain itself, not the merge)
                E = (
                    (f_k1[:, None] == f_k1[None, :])
                    & (f_k2[:, None] == f_k2[None, :])
                    & (f_kb[:, None] == f_kb[None, :])
                )
                first = jnp.min(jnp.where(E, ins[None, :], WK), axis=1)
                is_head = first == ins
                row_max = jnp.max(jnp.where(E, f_sc[None, :], NEG), axis=1)
                row_sum = jnp.sum(
                    jnp.where(E, jnp.exp(f_sc[None, :] - row_max[:, None]), 0.0),
                    axis=1,
                )
                msc = jnp.where(is_head, row_max + jnp.log(row_sum), 2 * NEG)

                # top-W groups; host nlargest is stable → ties break by
                # first-occurrence insertion order (ins == index for heads)
                sel = jnp.lexsort((ins, -msc))[:W]
                new_scores = msc[sel]
                pw, pk = sel // K, sel % K

                if self.plv is not None:
                    top = new_scores[0]
                    new_scores = jnp.where(
                        new_scores < top - self.plv, NEG, new_scores
                    )
                new_scores = jnp.maximum(new_scores, NEG)
                live = new_scores > NEG / 2

                tok = cand[pk]
                emitted = is_emit[pw, pk]
                update = emitted & live

                parent = pw
                n_h1, n_h2 = ch1[pw, pk], ch2[pw, pk]
                n_last, n_lblank = c_last[pw, pk], c_lblank[pw, pk]
                lm_len0 = book["lm_len"][parent]
                n_lm_seq = book["lm_seq"][parent]
                widx = jnp.minimum(lm_len0, S - 1)
                n_lm_seq = n_lm_seq.at[arW, widx].set(
                    jnp.where(update, tok, n_lm_seq[arW, widx]),
                    indices_are_sorted=True, unique_indices=True,
                )
                n_lm_len = lm_len0 + update
                st_len0 = book["st_len"][parent]
                n_stimes = book["stimes"][parent]
                sidx = jnp.minimum(st_len0, S)
                n_stimes = n_stimes.at[arW, sidx].set(
                    jnp.where(update, t, n_stimes[arW, sidx]),
                    indices_are_sorted=True, unique_indices=True,
                )
                n_st_len = st_len0 + update

                new_book = dict(
                    scores=new_scores, h1=n_h1, h2=n_h2, last=n_last,
                    lblank=n_lblank, lm_seq=n_lm_seq, lm_len=n_lm_len,
                    stimes=n_stimes, st_len=n_st_len,
                    next_lps=next_lps[parent],
                    clen=book["clen"][parent],
                    pos_row=book["pos_row"][parent],
                )
                return new_book, parent, tok, update

            def alloc(clen, pos_row, update, tok):
                # FREE-CELL ALLOCATION (recording-local): writer j appends
                # at position p_j = clen[j] and needs a physical cell
                # (r, p_j) no live beam still references (forked children
                # share their parent's prefix cells through pos_row, so
                # writing into a referenced cell would corrupt siblings).
                # Beam x references cell (pos_row[x, p], p) iff clen[x] > p;
                # with W beams at most W − #writers(p) cells at p are
                # referenced, so every writer finds a free one.  Same-
                # position writers take distinct frees by rank.
                p_j = clen
                pcl = jnp.minimum(p_j, S)
                M = pos_row[:, pcl]  # (Wx, Wj): x's cell-row at p_j
                refs = clen[:, None] > p_j[None, :]
                claimed = jnp.any(
                    jax.nn.one_hot(M, W, dtype=bool) & refs[:, :, None],
                    axis=0,
                )  # (Wj, Wr)
                free_cum = jnp.cumsum(~claimed, axis=1)
                samep = update[None, :] & (p_j[None, :] == p_j[:, None])
                rank = jnp.sum(
                    samep & (jnp.arange(W)[None, :] < jnp.arange(W)[:, None]),
                    axis=1,
                )
                r_j = jnp.argmax(free_cum > rank[:, None], axis=1).astype(jnp.int32)
                put = update & (clen <= S)  # model's write contract
                pos_row = pos_row.at[arW, pcl].set(
                    jnp.where(put, r_j, pos_row[arW, pcl]),
                    indices_are_sorted=True, unique_indices=True,
                )
                return r_j, pos_row

            book = {k: carry[k] for k in BOOK}
            new_book, parent, tok, update = jax.vmap(
                lambda s, c, a, v: bookkeeping(s, c, a, v)
            )(book, cand_n, am_n, valid_n)
            # candidate-less recordings carry over unchanged (the host's
            # `continue`); per-leaf select keeps the cache out of it
            has = jnp.any(valid_n, -1)  # (N,)
            sel = {
                k: jnp.where(
                    has.reshape((N,) + (1,) * (new_book[k].ndim - 1)),
                    new_book[k], book[k],
                )
                for k in BOOK
            }
            update = update & has[:, None]

            def lm_branch(args):
                cache, clen, nxt, pos_row = args
                r_j, pos_row = jax.vmap(alloc)(clen, pos_row, update, tok)
                flat_pos = (pos_row + row_off[:, None, None]).reshape(Wt, S + 1)
                flat_rows = (r_j + row_off[:, None]).reshape(Wt)
                c3, l3, lps = self._lm_apply(
                    variables, cache, clen.reshape(Wt), tok.reshape(Wt),
                    update.reshape(Wt), pos_row=flat_pos, write_rows=flat_rows,
                )
                lps = lps.reshape(N, W, -1)
                nxt2 = jnp.where(update[..., None], lps, nxt)
                return c3, l3.reshape(N, W), nxt2, pos_row

            cache, n_clen, n_next, n_pos_row = jax.lax.cond(
                jnp.any(update),
                lm_branch,
                lambda args: args,
                (carry["cache"], sel["clen"], sel["next_lps"], sel["pos_row"]),
            )
            sel["clen"], sel["next_lps"], sel["pos_row"] = n_clen, n_next, n_pos_row
            sel["cache"] = cache
            return sel, None

        carry, _ = jax.lax.scan(
            frame_step, carry,
            (cand_all, am_all, valid_all,
             t0 + jnp.arange(T, dtype=jnp.int32)),
        )
        return carry

    # ------------------------------------------------------------------
    def run_search_many(self, logits_list, decode: bool = False) -> List:
        """Search N recordings in ONE device program (scan rows stacked, the
        per-frame bookkeeping amortized across recordings).  Returns
        per-recording ids (or text); `self.timestamps` / `self.score` hold
        per-recording lists after the call."""
        jnp = self.jnp
        recs = [np.asarray(lg, np.float32) for lg in logits_list]
        C = recs[0].shape[1]
        assert all(r.shape[1] == C for r in recs)
        blank = self.blank_id if self.blank_id is not None else C - 1
        top_nonblank = C - 2 if blank == C - 1 else C - 1
        if top_nonblank >= self.model.vocab_size:
            raise ValueError(
                f"LM vocab {self.model.vocab_size} cannot score emit "
                f"candidates up to id {top_nonblank} (C={C}, blank={blank})"
            )
        # pad every recording to one bucketed length with frames that
        # produce no candidates (only id 0 clears the threshold, and id 0
        # is never proposed) — inert, test-verified
        T = max(r.shape[0] for r in recs)
        Tb = -(-T // self.frame_bucket) * self.frame_bucket
        cands, ams, valids = [], [], []
        for r in recs:
            padded = np.full((Tb, C), NEG, np.float32)
            padded[:, 0] = 0.0
            padded[: r.shape[0]] = r
            c_, a_, v_ = self._jit_candidates(jnp.asarray(padded))
            cands.append(c_)
            ams.append(a_)
            valids.append(v_)
        cand = jnp.stack(cands)
        am = jnp.stack(ams)
        valid = jnp.stack(valids)
        carry = self._jit_init(self.variables, N=len(recs), C=C)
        for t0 in range(0, Tb, self.frame_bucket):
            t1 = t0 + self.frame_bucket
            carry = self._jit_seg(
                self.variables, carry, cand[:, t0:t1], am[:, t0:t1],
                valid[:, t0:t1], jnp.int32(t0), C=C,
            )
        lm_seq, lm_len, stimes, st_len, scores = (
            carry["lm_seq"], carry["lm_len"], carry["stimes"],
            carry["st_len"], carry["scores"],
        )
        lm_seq, lm_len = np.asarray(lm_seq), np.asarray(lm_len)
        stimes, st_len = np.asarray(stimes), np.asarray(st_len)
        scores = np.asarray(scores)
        if int(lm_len.max(initial=0)) >= self.S:
            raise RuntimeError(
                f"beam reached max_tokens={self.S}: size max_tokens for the "
                f"worst-case emission count (one per candidate frame)"
            )
        out, self.timestamps, self.score = [], [], []
        for n in range(len(recs)):
            ids = [int(i) for i in lm_seq[n, 0, : int(lm_len[n, 0])]]
            self.timestamps.append(
                [int(x) for x in stimes[n, 0, 1: int(st_len[n, 0])]]
            )
            self.score.append(float(scores[n, 0]))
            out.append(
                self.tokenizer.decode(ids)
                if decode and self.tokenizer is not None else ids
            )
        return out

    def run_search(self, log_probs: np.ndarray, decode: bool = False):
        """log_probs (T, C) → token ids of the best beam (or text).
        After the call, `self.timestamps` holds the emission frame of each
        id and `self.score` the winning beam's merged score."""
        out = self.run_search_many([log_probs], decode=decode)
        self.timestamps = self.timestamps[0]
        self.score = self.score[0]
        return out[0]


def rescore_device(
    model,
    variables,
    logits_list,
    tokenizer=None,
    decode: bool = False,
    batch_recordings: int = 1,
    **kwargs,
) -> List:
    """Rescore recordings with the on-device search, `batch_recordings` per
    scan.  Default 1 — and that is usually optimal: batched recordings run
    in lockstep, so the LM step fires on the UNION of their emitting frames
    while every tick's cache gather pays for all N of them (measured
    27 ms/tick at N=2 vs 76 ms at N=4 on 10%-emit posteriors); unlike the
    HOST `rescore_many` there are no per-tick round trips to amortize, so
    batching only wins when recordings share emission patterns.  Returns
    per-recording results in input order; all waves reuse one searcher, so
    only the first wave (and a possibly-smaller final one) compiles."""
    searcher = DeviceFrameSyncBeamSearch(model, variables, tokenizer=tokenizer, **kwargs)
    out: List = []
    B = max(1, batch_recordings)
    for i in range(0, len(logits_list), B):
        out.extend(searcher.run_search_many(logits_list[i : i + B], decode=decode))
    return out

"""Batched multi-stream transcription serving.

The reference is an offline research framework (one recording at a time
through `eval/utils.py` / `buffered_transcription.py`); `OnlineTranscriber`
made it streaming.  This module makes it a SERVER: up to `max_streams`
concurrent online sessions share ONE fixed-shape compiled forward of batch
`max_streams` — the production TPU serving pattern.  Why batch:

  * the MXU is utilization-starved at batch 1 × ctx 2048 body shapes, so S
    sessions cost far less than S× one session's device time;
  * on dispatch-latency-dominated links (this tunnel: ~30-60 ms round trip
    per call) S due steps ride ONE dispatch instead of S.

Scheduling: `_pump()` repeatedly collects every session with a due step
(`OnlineTranscriber._ready`), builds the (S, 80, ctx) batch host-side
(`_prepare`), runs the one compiled forward, and feeds each row back
(`_apply`).  Sessions with no due step cost nothing; idle batch rows carry
zeros and their outputs are discarded.  Per-row results are exactly the
single-stream path's — the model is batch-independent at inference
(BatchRenorm uses running stats; attention/norms are per-sample) — which
`tests/test_serving.py::test_server_matches_single_stream` pins.

Sessions may use different normalization modes and may be fed raw samples
or precomputed mel frames; context/stride/delay are shared (they define the
single compiled shape).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from lcasr_tpu.serving.transcriber import OnlineTranscriber


class TranscriptionServer:
    """Up to `max_streams` concurrent `OnlineTranscriber` sessions batched
    onto one compiled forward.

    open(**session_kw) -> sid
    feed(sid, samples) / feed_frames(sid, mel) -> newly finalized text
    finish(sid) -> remaining text (closes the session, frees the slot)
    poll(sid) -> finalized text buffered by OTHER sessions' pumps
    text(sid) -> full transcript so far
    """

    def __init__(
        self,
        model,
        variables,
        tokenizer,
        max_streams: int = 8,
        context_frames: int = 2048,
        stride_frames: int = 512,
        right_delay_frames: int = 512,
        transfer_dtype: str = "float32",
        decoder: str = "greedy",
        beam_opts: Optional[dict] = None,
        beam_topk: Optional[int] = 32,
    ):
        import jax
        import jax.numpy as jnp

        assert max_streams >= 1
        self.jax = jax
        self.model = model
        self.variables = jax.device_put(variables)
        self.tokenizer = tokenizer
        self.S = max_streams
        self.ctx = context_frames
        self.stride = stride_frames
        self.delay = right_delay_frames
        # wave upload format: 'float32' (exact, default), 'bfloat16' (halves
        # link traffic), 'int8' (quarter: symmetric per-wave scale quantized
        # on host, ONE device-side dequant — the decode path's
        # transfer_dtype machinery, WER-certified in the closed loop).  On
        # link-bound hosts the (S, 80, ctx) f32 upload is the wave's main
        # cost once argmax-fetch shrank the download.
        assert transfer_dtype in ("float32", "bfloat16", "int8")
        self.transfer_dtype = transfer_dtype
        self._host_dtype = (
            np.int8 if transfer_dtype == "int8"
            else np.dtype(jnp.bfloat16) if transfer_dtype == "bfloat16"
            else np.float32
        )

        # ONE compiled program for every session: fixed (S, 80, ctx) input.
        # Greedy: argmax on device — the fetch is (S, rows) int32, not
        # (S, rows, vocab) log-probs (which would be ~33 MB per wave at the
        # flagship shape: the whole wave's cost on a ~40 MB/s tunnel link).
        # Beam: the sparse top-K fetch ((S, rows, K)×8 B + counts — see
        # transcriber.py; exact by the count check, dense refetch per
        # overflowing session), so beam serving stays link-cheap too.
        assert decoder in ("greedy", "beam")
        self.decoder = decoder
        self.beam_opts = beam_opts
        self.beam_topk = None
        if decoder == "beam" and beam_topk is not None:
            self.beam_topk = int(min(beam_topk, tokenizer.vocab_size() + 1))

        if decoder == "beam" and self.beam_topk is not None:
            from lcasr_tpu.decoding.beam_search import (
                DEFAULT_TOP_AM_THRESHOLD,
            )

            K = self.beam_topk
            thr = float((beam_opts or {}).get(
                "top_am_threshold", DEFAULT_TOP_AM_THRESHOLD)) - 1e-3

            def head(out):
                lp = out["final_posteriors"].astype(jnp.float32)
                vals, idx = jax.lax.top_k(lp, K)
                count = jnp.sum(
                    lp >= lp.max(axis=-1, keepdims=True) + thr, axis=-1
                )
                return (vals, idx.astype(jnp.int32),
                        count.astype(jnp.int32), out["length"])

        elif decoder == "beam":

            def head(out):
                lp = out["final_posteriors"].astype(jnp.float32)
                return lp, out["length"]

        else:

            def head(out):
                ids = jnp.argmax(out["final_posteriors"], axis=-1)
                return ids.astype(jnp.int32), out["length"]

        # Device-RESIDENT per-slot window buffers (r4): `win_buf` (S, 80,
        # ctx) holds each slot's RAW mel window on device across waves.
        # Steady-state waves upload only each due slot's NEW `stride`
        # frames (the delta program rolls the buffer) — ctx/stride ≈ 4×
        # fewer link bytes than re-uploading full windows; ramp-in/flush
        # waves fall back to the full program, which also (re)writes the
        # buffer rows.  Normalization happens ON DEVICE from per-slot fp32
        # (mean, std) vectors computed with the session's CURRENT stats —
        # bit-identical to the host path (IEEE fp32 elementwise).
        #
        # Compressed uploads (bf16/int8) are sent in NORMALIZED units and
        # un-normalized back to raw on device before entering the buffer:
        # raw power-mel spans orders of magnitude across bins and sessions,
        # so one symmetric raw-scale would zero out quiet bins entirely —
        # normalizing first makes the shared int8 scale effectively
        # per-session-per-bin (values are O(1) everywhere), the same
        # precision regime as quantizing the final normalized windows.
        # fp32 uploads stay raw (the normalize→unnormalize round trip is
        # not bit-exact, and fp32 needs no compression).
        compressed = transfer_dtype != "float32"

        def ingest(payload, scale, mean, std):
            x = payload.astype(jnp.float32) * scale
            if compressed:
                x = x * std[:, :, None] + mean[:, :, None]
            return x

        @jax.jit
        def forward_full(variables, win_buf, rows, due, scale, mean, std,
                         lengths):
            raw = ingest(rows, scale, mean, std)
            new_buf = jnp.where(due[:, None, None], raw, win_buf)
            w = (new_buf - mean[:, :, None]) / std[:, :, None]
            out = model.apply(variables, w, length=lengths)
            return (new_buf,) + tuple(head(out))

        stride = self.stride

        @jax.jit
        def forward_delta(variables, win_buf, deltas, due, scale, mean, std,
                          lengths):
            new = ingest(deltas, scale, mean, std)
            rolled = jnp.concatenate([win_buf[:, :, stride:], new], axis=-1)
            new_buf = jnp.where(due[:, None, None], rolled, win_buf)
            w = (new_buf - mean[:, :, None]) / std[:, :, None]
            out = model.apply(variables, w, length=lengths)
            return (new_buf,) + tuple(head(out))

        self._forward_full = forward_full
        self._forward_delta = forward_delta
        self._win_buf = jnp.zeros((self.S, 80, self.ctx), jnp.float32)
        # dispatch accounting (PERFORMANCE.md serving-scaling analysis): on
        # link-bound hosts the wave count × round trip IS the wall clock, so
        # a scaling plateau must be attributable from these alone
        self.wave_count = 0
        self.delta_wave_count = 0
        self.upload_bytes = 0
        self._sessions: Dict[int, OnlineTranscriber] = {}
        self._out: Dict[int, List[str]] = {}
        self._slot: Dict[int, int] = {}  # sid → fixed buffer row
        self._free_slots = list(range(self.S - 1, -1, -1))
        self._dev_end: Dict[int, Optional[int]] = {}  # sid → buffered window end
        self._next_sid = 0

    # ---------------- session lifecycle ----------------
    def open(
        self,
        norm: Union[str, Tuple[np.ndarray, np.ndarray]] = "running",
        eps: float = 1e-8,
    ) -> int:
        """Start a session; returns its id.  Raises when at capacity."""
        if len(self._sessions) >= self.S:
            raise RuntimeError(
                f"server at capacity ({self.S} streams); finish() one first"
            )
        session = OnlineTranscriber(
            self.model,
            self.variables,  # already on device; device_put is a no-op
            self.tokenizer,
            context_frames=self.ctx,
            stride_frames=self.stride,
            right_delay_frames=self.delay,
            norm=norm,
            eps=eps,
            decoder=self.decoder,
            beam_opts=self.beam_opts,
            beam_topk=self.beam_topk,
        )
        sid = self._next_sid
        self._next_sid += 1
        self._sessions[sid] = session
        self._out[sid] = []
        self._slot[sid] = self._free_slots.pop()
        self._dev_end[sid] = None  # buffer row not yet valid
        return sid

    def _session(self, sid: int) -> OnlineTranscriber:
        if sid not in self._sessions:
            raise KeyError(f"no open session {sid}")
        return self._sessions[sid]

    # ---------------- batched pump ----------------
    def pump(self) -> None:
        """Run due steps for ALL sessions, one batched forward per wave,
        until no session has a due step; then buffer each session's newly
        finalized text.  Called automatically by feed/feed_frames/finish
        unless they're invoked with pump=False — an event loop ingesting a
        whole arrival tick should feed every session with pump=False and
        pump() ONCE, so concurrent due steps share a wave instead of each
        feed dispatching its own."""
        jnp = self.jax.numpy
        while True:
            due = []
            for sid, s in self._sessions.items():
                step = s._ready()
                if step is not None:
                    due.append((sid, s, step))
            if not due:
                break
            # delta-eligible wave: EVERY due session advances its already-
            # buffered full window by exactly one stride (the steady state).
            # Otherwise (ramp-in, flush, reused slot) the full program runs
            # and (re)writes the due rows' buffers.
            all_delta = all(
                not final
                and self._dev_end[sid] == end - self.stride
                and end - self.ctx >= 0
                for sid, s, (end, final) in due
            )
            lengths = np.full((self.S,), self.ctx, np.int32)  # idle rows
            due_mask = np.zeros((self.S,), bool)
            mean = np.zeros((self.S, 80), np.float32)
            std = np.ones((self.S, 80), np.float32)
            metas = []
            if all_delta:
                payload_host = np.zeros((self.S, 80, self.stride), np.float32)
            else:
                payload_host = np.zeros((self.S, 80, self.ctx), np.float32)
            for sid, s, (end, final) in due:
                i = self._slot[sid]
                due_mask[i] = True
                mean[i], std[i] = s._norm_params()
                if all_delta:
                    win_start = end - self.ctx
                    width = self.ctx
                    payload_host[i] = s._raw_window(end - self.stride, end)
                else:
                    window, width, win_start = s._prepare_raw(end)
                    payload_host[i] = window
                lengths[i] = width
                # full-width interior windows leave a reusable buffer row;
                # anything else (short ramp-in window, final flush) does not
                self._dev_end[sid] = (
                    end if (not final and width == self.ctx) else None)
                metas.append((s, i, end, final, win_start))
            if self.transfer_dtype != "float32":
                # compressed uploads travel in NORMALIZED units (see the
                # forward-program comment: a shared scale on raw power-mel
                # would zero out quiet bins); idle rows have mean 0/std 1
                payload_host = ((payload_host - mean[:, :, None])
                                / std[:, :, None])
            if self.transfer_dtype == "int8":
                scale = float(np.abs(payload_host).max()) / 127.0 or 1.0
                host = np.clip(
                    np.rint(payload_host / scale), -127, 127).astype(np.int8)
            else:
                scale = 1.0
                host = payload_host.astype(self._host_dtype)
            self.wave_count += 1
            self.delta_wave_count += int(all_delta)
            self.upload_bytes += host.nbytes
            fwd = self._forward_delta if all_delta else self._forward_full
            res = fwd(
                self.variables, self._win_buf, jnp.asarray(host),
                jnp.asarray(due_mask), jnp.float32(scale),
                jnp.asarray(mean), jnp.asarray(std), jnp.asarray(lengths),
            )
            self._win_buf = res[0]  # stays ON DEVICE across waves
            outs = self.jax.device_get(res[1:])  # one fetch: payloads only
            if self.decoder == "beam" and self.beam_topk is not None:
                vals, idx, count, out_lens = outs
                payloads = {i: (vals[i], idx[i], count[i])
                            for _, i, *_ in metas}
            else:
                payload_rows, out_lens = outs
                payloads = {i: payload_rows[i] for _, i, *_ in metas}
            for s, i, end, final, win_start in metas:
                s._apply(end, final, win_start, payloads[i],
                         int(out_lens[i]))
        for sid, s in self._sessions.items():
            s._trim()
            delta = s._delta()
            if delta:
                self._out[sid].append(delta)

    def _take(self, sid: int) -> str:
        parts = self._out[sid]
        self._out[sid] = []
        return "".join(parts)

    # ---------------- public API ----------------
    def feed(self, sid: int, samples: np.ndarray, pump: bool = True) -> str:
        """Append raw 16 kHz samples to session `sid`; returns ITS newly
        finalized text (text finalized for other sessions by this pump is
        buffered for their next feed/poll).  pump=False only ingests and
        returns "" — it must NOT drain the buffer, or text finalized for
        this session by another session's pump/finish between this
        session's polls would be silently dropped by callers that ignore
        the ingest-only return; batch a tick's arrivals, then pump() once
        and poll()."""
        self._session(sid)._feed_ingest(samples)
        if not pump:
            return ""
        self.pump()
        return self._take(sid)

    def feed_frames(self, sid: int, mel: np.ndarray, pump: bool = True) -> str:
        """Append precomputed (80, T) mel frames to session `sid`."""
        self._session(sid)._feed_frames_ingest(mel)
        if not pump:
            return ""
        self.pump()
        return self._take(sid)

    def poll(self, sid: int) -> str:
        """Collect text finalized for `sid` since its last feed/poll."""
        self._session(sid)
        return self._take(sid)

    def finish(self, sid: int) -> str:
        """End session `sid`: flush its tail, free the slot, return the
        remaining finalized text."""
        session = self._session(sid)
        session._finish_ingest()
        self.pump()
        remaining = self._take(sid)
        del self._sessions[sid]
        del self._out[sid]
        self._free_slots.append(self._slot.pop(sid))
        del self._dev_end[sid]
        return remaining

    def text(self, sid: int) -> str:
        """Full transcript of an OPEN session so far (buffered included)."""
        return self._session(sid).text

    def words(self, sid: int):
        """Word-level timestamps of an OPEN session's finalized transcript
        ([{'word', 'start', 'end'} in stream seconds])."""
        return self._session(sid).words

    @property
    def n_open(self) -> int:
        return len(self._sessions)

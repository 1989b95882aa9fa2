"""Online (streaming-input) transcription for serving.

The reference is an offline research framework: every decode mode
(`lcasr/eval/utils.py:46-110` moving window, `buffered_transcription.py:11-97`
center-crop) takes the COMPLETE recording up front.  This module provides the
serving-side counterpart: audio arrives in arbitrary-size chunks, mel frames
are computed incrementally (bit-identical to the offline frontend,
`data/audio.py`), and the model runs over a FIXED-SHAPE sliding context
window — one compiled program reused for the whole stream — emitting
finalized text with a configurable lookahead delay.

Finalization contract (same reasoning as buffered transcription's
center-crop): a frame's logits are finalized only once it has
`right_delay_frames` of real future context and the window supplies
`context_frames - stride - right_delay` of left context.  For a model whose
receptive field per side (attention window + conv stack) fits inside those
margins, the finalized logits are IDENTICAL to a full-recording forward —
tested to argmax-exactness in tests/test_serving.py.

Memory is BOUNDED for indefinite streams: consumed raw samples and mel
frames outside the live decode window are dropped (base-offset ring
semantics); normalization statistics are carried as running sums and the
transcript as an append-only string.

Normalization: the reference normalizes each recording with its GLOBAL
mel mean/std (`audio_tools.py:44-57`) — unavailable online.  Options:
  * norm="running"  — cumulative mel statistics over the stream so far
    (converges to the offline stats as the stream grows),
  * norm=(mean, std) — precomputed (e.g. corpus-level) statistics,
  * norm="none"     — caller feeds pre-normalized audio.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from lcasr_tpu.data.audio import (
    HOP_LENGTH,
    N_FFT,
    WIN_LENGTH,
    _hann_window,
    mel_filterbank,
)

_PAD = N_FFT // 2  # center=True padding (reflect), matches data/audio.py

# (model, kind, K, thr) → jitted forward, shared by every OnlineTranscriber
# with the same config so new sessions don't re-jit (flax modules hash by
# config).  Unbounded by design: entries are one per distinct model config
# per process, not per session.
_FORWARD_CACHE: dict = {}


def _shared_forward(model, kind: str, K=None, thr=None, ctx=None,
                    stride=None, q8=False):
    import jax
    import jax.numpy as jnp

    key = (model, kind, K, thr, ctx, stride, q8)
    fn = _FORWARD_CACHE.get(key)
    if fn is not None:
        return fn
    def head(out):
        if kind.startswith("beam_topk"):
            lp = out["final_posteriors"].astype(jnp.float32)
            vals, idx = jax.lax.top_k(lp, K)
            count = jnp.sum(
                lp >= lp.max(axis=-1, keepdims=True) + thr, axis=-1
            )
            return (vals, idx.astype(jnp.int32),
                    count.astype(jnp.int32), out["length"])
        if kind.startswith("beam_dense"):
            return out["final_posteriors"].astype(jnp.float32), out["length"]
        if kind.startswith("greedy"):
            ids = jnp.argmax(out["final_posteriors"], axis=-1)
            return ids.astype(jnp.int32), out["length"]
        raise ValueError(kind)  # pragma: no cover

    def dequant(x, scale):
        # int8 upload (transfer_dtype="int8"): symmetric per-upload scale,
        # one device-side dequant back to fp32 before the model
        if q8:
            return x.astype(jnp.float32) * scale
        return x

    if kind.endswith("_strip"):
        # backlog batching, steady state: consecutive windows overlap by
        # ctx - stride (87.5% at the defaults), so uploading k full windows
        # re-sends most bytes k times.  Instead the host sends ONE strip
        # covering the union and the k ctx-windows are gathered ON DEVICE —
        # identical values, (k·ctx)/(strip) ≈ 3-4× fewer link bytes on the
        # path that is link-bound on remote-attached chips.  The k starts
        # are an ARITHMETIC sequence (stride apart) by construction, so the
        # gather is k STATIC slices — a traced-start vmap(dynamic_slice)
        # was measured 5× slower on the tunnel backend (gather lowering).
        assert ctx is not None and stride is not None

        @jax.jit
        def fn(variables, strip, length, scale=None):
            strip = dequant(strip, scale)
            b = length.shape[0]
            win = jnp.stack([
                jax.lax.slice_in_dim(strip, i * stride, i * stride + ctx,
                                     axis=1)
                for i in range(b)
            ])
            return head(model.apply(variables, win, length=length))

    else:

        @jax.jit
        def fn(variables, window, length, scale=None):
            return head(model.apply(variables, dequant(window, scale),
                                    length=length))

    _FORWARD_CACHE[key] = fn
    return fn


class OnlineTranscriber:
    """Incremental transcription over a raw-sample stream.

    feed(samples) -> newly finalized text (possibly "")
    finish()      -> remaining text (flushes the tail with end padding)
    text          -> full transcript so far
    """

    def __init__(
        self,
        model,
        variables,
        tokenizer,
        context_frames: int = 2048,
        stride_frames: int = 512,
        right_delay_frames: int = 512,
        norm: Union[str, Tuple[np.ndarray, np.ndarray]] = "running",
        eps: float = 1e-8,
        decoder: str = "greedy",
        beam_opts: Optional[dict] = None,
        beam_topk: Optional[int] = 32,
        max_batch_strides: int = 8,
        transfer_dtype: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        sf = getattr(model, "subsampling_factor", 8)
        assert context_frames % sf == 0 and stride_frames % sf == 0
        assert right_delay_frames % sf == 0
        assert context_frames >= stride_frames + right_delay_frames
        self.jax, self.jnp = jax, jnp
        self.model = model
        self.variables = jax.device_put(variables)
        self.tokenizer = tokenizer
        self.blank_id = tokenizer.vocab_size()  # blank is LAST (reference)
        self.sf = sf
        self.ctx = context_frames
        self.stride = stride_frames
        self.delay = right_delay_frames
        self.norm = norm
        self.eps = eps
        # backlog stride-batching (VERDICT r3 #5): when the stream is fed
        # faster than real time (catch-up after a stall, file transcription
        # through the online path), several strides are due at once — they
        # ride ONE (k, 80, ctx) forward instead of k MXU-starved (1, 80,
        # ctx) dispatches.  Bit-equal to the serial path: the running-norm
        # statistics only change on feed(), never between drain steps, so
        # every batched window is byte-identical to its serial counterpart.
        # k is bucketed to powers of two (≤ max_batch_strides) to bound the
        # compile count; 1 disables.
        self.max_batch_strides = max(1, int(max_batch_strides))
        # transfer_dtype="int8": window/strip uploads quantize host-side
        # with a symmetric per-upload scale and dequantize on device —
        # quarters the link bytes on the link-bound serving path.  NOT
        # bit-equal to fp32 (≤ scale/2 rounding per mel value); WER
        # neutrality is certified on a trained model by the closed-loop
        # system test's serving leg, like the offline decode's int8.
        if transfer_dtype not in (None, "int8"):
            raise ValueError(
                f"transfer_dtype must be None or 'int8', got {transfer_dtype!r}")
        self._q8 = transfer_dtype == "int8"

        self._fb = mel_filterbank().astype(np.float64)  # (n_freqs, n_mels)
        self._win = _hann_window(WIN_LENGTH, N_FFT).astype(np.float64)

        # base-offset buffers: _samples holds stream positions
        # [_sample_base, _sample_base + len), _mel holds frames
        # [_mel_base, _mel_base + width) — prefixes outside the live decode
        # window are dropped so memory stays bounded on indefinite streams
        self._samples = np.zeros((0,), np.float32)
        self._sample_base = 0
        self._n_samples = 0  # total stream samples seen
        self._mel = np.zeros((80, 0), np.float32)  # UNNORMALIZED mel frames
        self._mel_base = 0
        self._n_mel = 0  # total mel frames computed
        self._mel_sum = np.zeros((80,), np.float64)
        self._mel_sumsq = np.zeros((80,), np.float64)
        self._frontier = 0  # first not-yet-finalized frame (global)
        self._prev_id = self.blank_id  # CTC collapse carry across chunks
        # token ids are tiny (~10k/hour of speech): keeping them all and
        # re-decoding on change is O(total) per EMITTING drain, which is
        # negligible; the buffers that must stay bounded are samples/mel
        self._ids: list[int] = []
        # per-token first-emission SUBSAMPLED frame (global), for the
        # `words` word-timestamp view
        self._id_frames: list[int] = []
        self._dirty = False
        self._text = ""
        self._finished = False

        # decoder='beam': an incremental LM-fusable prefix beam search runs
        # over the finalized logit rows (exact by the finalization
        # contract), so the ONLINE transcript carries beam/LM quality.
        # Mid-stream the emitted text is the LIVE BEAMS' COMMON PREFIX
        # (never waits, may later be refined — the delta protocol emits the
        # corrected suffix from the divergence point); finish() settles on
        # the best beam, which equals the OFFLINE prefix beam over the same
        # logits (tests/test_serving.py::test_beam_serving_matches_offline).
        # beam_opts passes through to decoding.beam_search.BeamSearch
        # (beam_width, alpha/beta + lm_scores for LM fusion, pruning...).
        assert decoder in ("greedy", "beam")
        self.decoder = decoder
        self.beam_topk: Optional[int] = None
        if decoder == "beam":
            from lcasr_tpu.decoding.beam_search import BeamSearch

            opts = dict(beam_opts or {})
            opts.setdefault("pad_id", 0)
            self._beam = BeamSearch(
                tokenizer=tokenizer, blank_id=self.blank_id, **opts
            )
            self.sparse_refetches = 0  # dense-refetch count (observability)
            if beam_topk is not None:
                # the search only ever READS a frame's above-threshold
                # entries (beam_search.advance builds `keep` and touches
                # frame[c] for c in keep only), so a top-K fetch is EXACT
                # whenever the above-threshold count fits in K — verified
                # per block via a device-computed count, with a dense
                # refetch on the (rare) overflow
                self.beam_topk = int(min(beam_topk, self.blank_id + 1))

        # ONE compiled program for the whole stream: fixed (1, 80, ctx)
        # input.  Greedy serving only consumes the per-frame argmax, so the
        # argmax runs ON DEVICE and the fetch is (rows,) int32 instead of
        # (rows, vocab) log-probs — on link-bound hosts (this tunnel:
        # ~40 MB/s) that fetch, not compute, dominates the step otherwise.
        # Beam serving needs the distribution, but only its above-threshold
        # entries: the default fetch is device-side top-K values + indices
        # + an above-threshold count (rows × K × 8 B ≈ 130× less than the
        # (rows, vocab) fp32 block at the flagship shape), exact by the
        # count check; `beam_topk=None` falls back to the dense fp32 fetch.
        #
        # The jitted forward is SHARED across transcriber instances of the
        # same (model config, decoder kind, K, thr) — flax modules hash by
        # their config fields, so a second session (new file, reconnecting
        # client) reuses the already-compiled programs instead of paying a
        # per-instance jit cache (measured: the per-instance closure made
        # every fresh session re-load every batch shape from the
        # compilation cache — seconds of cold-start per session).
        if decoder == "beam" and self.beam_topk is not None:
            # count with a slightly LOOSER threshold than the host predicate
            # so fp32-vs-float64 rounding at the exact boundary can only
            # trigger a spurious (safe) dense refetch, never a miss
            thr = float(self._beam.top_am_threshold) - 1e-3
            self._forward = _shared_forward(model, "beam_topk",
                                            self.beam_topk, thr, q8=self._q8)
        elif decoder == "beam":
            self._forward = _shared_forward(model, "beam_dense", q8=self._q8)
        else:
            self._forward = _shared_forward(model, "greedy", q8=self._q8)

    def _upload(self, arr: np.ndarray):
        """Host-side cast for one upload: (device array, scale-or-None)."""
        if not self._q8:
            return self.jnp.asarray(arr), None
        s = float(np.abs(arr).max()) / 127.0 or 1.0
        q = np.clip(np.rint(arr / s), -127, 127).astype(np.int8)
        return self.jnp.asarray(q), self.jnp.asarray(s, self.jnp.float32)

    # ---------------- incremental mel frontend ----------------
    def _frames_available(self, n_samples: int) -> int:
        """Frames computable WITHOUT end padding: frame t spans original
        samples [t*hop - pad, t*hop + pad)."""
        if n_samples < _PAD + 1:
            return 0
        return (n_samples - _PAD) // HOP_LENGTH + 1

    def _compute_frames(self, f0: int, f1: int, final: bool) -> np.ndarray:
        """Mel frames [f0, f1), bit-matching data/audio.spectrogram's
        center=True reflect framing.  `final`: reflect at the stream end too
        (finish only); while streaming only start-reflection can occur."""
        if f1 <= f0:
            return np.zeros((80, 0), np.float32)
        T = self._n_samples
        k = np.arange(N_FFT)[None, :]
        f = np.arange(f0, f1)[:, None]
        orig = f * HOP_LENGTH + k - _PAD  # global sample index
        orig = np.where(orig < 0, -orig, orig)  # reflect at start
        if final:
            # reflect at the end, repeatedly for very short streams (np.pad
            # "reflect" semantics); T >= 2 is guaranteed by _ingest's guard
            for _ in range(int(np.ceil(_PAD / max(T - 1, 1)))):
                orig = np.where(orig > T - 1, 2 * (T - 1) - orig, orig)
                orig = np.where(orig < 0, -orig, orig)
        local = orig - self._sample_base
        assert local.min() >= 0 and local.max() < len(self._samples)
        frames = self._samples[local].astype(np.float64) * self._win
        spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
        power = np.abs(spec) ** 2  # (nf, n_freqs)
        mel = power @ self._fb  # (nf, n_mels)
        return mel.T.astype(np.float32)  # (80, nf)

    def _ingest(self, end_of_stream: bool) -> None:
        T = self._n_samples
        done = self._n_mel
        if end_of_stream:
            if T < 2:
                return  # sub-millisecond stream: nothing to transcribe
            avail = T // HOP_LENGTH + 1  # offline frame count
        else:
            avail = self._frames_available(T)
        if avail <= done:
            return
        new = self._compute_frames(done, avail, final=end_of_stream)
        self._mel = np.concatenate([self._mel, new], axis=1)
        self._n_mel = avail
        self._mel_sum += new.astype(np.float64).sum(-1)
        self._mel_sumsq += (new.astype(np.float64) ** 2).sum(-1)

    def _norm_params(self) -> Tuple[np.ndarray, np.ndarray]:
        """Current (mean, std) as float32 (80,) vectors.  fp32 so host and
        device normalization are BIT-IDENTICAL (IEEE fp32 subtract/divide
        are correctly rounded on both) — the server normalizes on device
        from these same vectors."""
        if self.norm == "none":
            return (np.zeros(80, np.float32), np.ones(80, np.float32))
        if self.norm == "running":
            n = self._n_mel
            mean = self._mel_sum / max(n, 1)
            # unbiased variance, matching the offline ddof=1 normalizer
            var = (self._mel_sumsq - n * mean**2) / max(n - 1, 1)
            std = np.sqrt(np.maximum(var, 0.0)) + self.eps
        else:
            mean, std = self.norm
        return (np.asarray(mean, np.float32).reshape(80),
                np.asarray(std, np.float32).reshape(80))

    def _raw_window(self, lo: int, hi: int) -> np.ndarray:
        """Unnormalized mel [lo, hi) as float32 (the server's device-side
        window buffers hold RAW frames; normalization applies per wave with
        the CURRENT stats)."""
        return np.asarray(
            self._mel[:, lo - self._mel_base : hi - self._mel_base],
            np.float32)

    def _normalized(self, lo: int, hi: int) -> np.ndarray:
        seg = self._raw_window(lo, hi)
        mean, std = self._norm_params()
        if self.norm == "none":
            return seg
        return (seg - mean[:, None]) / std[:, None]

    def _trim(self) -> None:
        """Drop consumed prefixes: samples already framed (keep the lookback
        the NEXT frame needs) and mel frames behind any future window."""
        keep_sample = max(0, self._n_mel * HOP_LENGTH - _PAD)
        if keep_sample > self._sample_base:
            self._samples = self._samples[keep_sample - self._sample_base:]
            self._sample_base = keep_sample
        keep_mel = max(0, self._frontier - self.ctx)
        if keep_mel > self._mel_base:
            self._mel = self._mel[:, keep_mel - self._mel_base:]
            self._mel_base = keep_mel

    # ---------------- decode steps ----------------
    # The step machinery is split so `server.TranscriptionServer` can batch
    # many sessions onto one forward: _ready (is a step due?), _prepare
    # (host-side window build), _apply (emit + frontier advance) — _step
    # just strings them through this session's own compiled forward.

    def _ready(self):
        """(end, final) for the next due step, or None."""
        n = self._n_mel
        if n - self._frontier >= self.stride + self.delay:
            # interior step: finalize a stride-sized block with full lookahead
            return (self._frontier + self.stride + self.delay, False)
        if self._finished and self._frontier < n:
            # end of stream: no future context exists, flush the tail
            return (n, True)
        return None

    def _prepare(self, end: int):
        """Build the fixed-shape (80, ctx) window ending at `end`.
        Returns (window, width, win_start)."""
        win_start = max(0, end - self.ctx)
        # align UP so win_start stays a multiple of sf (row mapping) AND
        # width <= ctx (the single compiled shape is preserved)
        win_start += (-win_start) % self.sf
        width = end - win_start
        window = self._normalized(win_start, end)
        if width < self.ctx:
            window = np.pad(window, ((0, 0), (0, self.ctx - width)))
        return window, width, win_start

    def _prepare_raw(self, end: int):
        """`_prepare` without normalization — the server's device-resident
        window path normalizes on device with `_norm_params()`."""
        win_start = max(0, end - self.ctx)
        win_start += (-win_start) % self.sf
        width = end - win_start
        window = self._raw_window(win_start, end)
        if width < self.ctx:
            window = np.pad(window, ((0, 0), (0, self.ctx - width)))
        return window, width, win_start

    def _emit_beam(self, g0: int, g1: int, win_start: int, log_probs,
                   out_len: int, tail: bool) -> None:
        """Beam-mode finalization: advance the incremental prefix beam over
        the finalized (rows, C) log-prob block; publish the live beams'
        common prefix mid-stream, the best beam at end of stream."""
        r0 = (g0 - win_start) // self.sf
        r1 = out_len if tail else min((g1 - win_start) // self.sf, out_len)
        if r1 > r0:
            row0 = win_start // self.sf
            self._beam.advance(
                np.asarray(log_probs[r0:r1], np.float32), t0=row0 + r0
            )
        if tail:
            best = self._beam.best()
            ids, frames = list(best.prefix), list(best.frames)
        else:
            prefixes = self._beam.live_prefixes()
            lcp = prefixes[0]
            for p in prefixes[1:]:
                n = 0
                for a, b in zip(lcp, p):
                    if a != b:
                        break
                    n += 1
                lcp = lcp[:n]
            # the best beam starts with the LCP by construction, so its
            # timestamps align with the emitted ids
            best = self._beam.best()
            ids = list(lcp)
            frames = list(best.frames[: len(lcp)])
        if ids != self._ids:
            self._ids, self._id_frames = ids, frames
            self._dirty = True

    def _densify_beam(self, payload, end: int, final: bool, win_start: int,
                      out_len: int, fin_end: int) -> np.ndarray:
        """Turn a sparse (vals, idx, count) beam payload into the (rows, C)
        dense block `_emit_beam` consumes.  Rows outside the finalized range
        stay at LOG0 (never read).  If any finalized row's above-threshold
        count exceeds K, the sparse fetch is not provably exact — refetch
        the window densely (rare; one extra cached compile)."""
        vals, idx, count = (np.asarray(x) for x in payload)
        C = self.blank_id + 1
        r0 = (self._frontier - win_start) // self.sf
        r1 = out_len if final else min((fin_end - win_start) // self.sf,
                                       out_len)
        if r1 > r0 and int(count[r0:r1].max()) > self.beam_topk:
            self.sparse_refetches += 1
            forward_dense = _shared_forward(self.model, "beam_dense")
            window, width, _ = self._prepare(end)
            lp, _ = forward_dense(
                self.variables, self.jnp.asarray(window[None]),
                self.jnp.asarray([width], np.int32))
            return np.asarray(lp[0], np.float32)
        dense = np.full((vals.shape[0], C), -1e30, np.float32)
        if r1 > r0:
            rows = np.arange(r0, r1)
            dense[rows[:, None], idx[r0:r1]] = vals[r0:r1]
        return dense

    def _apply(self, end: int, final: bool, win_start: int, payload,
               out_len: int) -> None:
        """Consume a forward's output for the step (end, final): `payload`
        is this session's (rows,) device-argmaxed id vector (greedy), its
        (rows, C) fp32 log-probs (dense beam), or its (vals, idx, count)
        top-K triple (sparse beam)."""
        fin_end = end if final else end - self.delay
        if self.decoder == "beam":
            if isinstance(payload, tuple):
                payload = self._densify_beam(payload, end, final, win_start,
                                             out_len, fin_end)
            self._emit_beam(self._frontier, fin_end, win_start, payload,
                            out_len, tail=final)
        else:
            self._emit(self._frontier, fin_end, win_start, payload, out_len,
                       tail=final)
        self._frontier = fin_end

    def _emit(self, g0: int, g1: int, win_start: int, frame_ids, out_len: int,
              tail: bool) -> None:
        """Finalize global frames [g0, g1) from a window forward whose input
        started at `win_start` (multiple of sf, so subsampled rows align).
        `frame_ids` is the device-argmaxed (rows,) id vector for this stream.
        `tail`: take every remaining output row (g1 may not be sf-aligned at
        end of stream — the last subsampled row covers a partial group)."""
        r0 = (g0 - win_start) // self.sf
        r1 = out_len if tail else min((g1 - win_start) // self.sf, out_len)
        if r1 <= r0:
            return
        ids = np.asarray(frame_ids[r0:r1])
        row0 = win_start // self.sf  # global subsampled row of output row 0
        for j, i in enumerate(ids.tolist()):
            if i != self.blank_id and i != self._prev_id:
                self._ids.append(int(i))
                self._id_frames.append(row0 + r0 + j)
                self._dirty = True
            self._prev_id = i

    def _step(self, end: int, final: bool) -> None:
        """One fixed-shape forward over mel [end-ctx, end), finalizing frames
        [frontier, end - delay) — or everything through `end` when final."""
        window, width, win_start = self._prepare(end)
        win, scale = self._upload(window[None])
        outs = self.jax.device_get(self._forward(
            self.variables, win,
            self.jnp.asarray([width], np.int32), scale,
        ))  # ONE host round trip for the whole payload tuple
        if self.decoder == "beam" and self.beam_topk is not None:
            vals, idx, count, out_len = outs
            payload = (vals[0], idx[0], count[0])
        else:
            payload, out_len = outs
            payload = payload[0]
        self._apply(end, final, win_start, payload, int(out_len[0]))

    def _delta(self) -> str:
        """Newly finalized text since the last call."""
        if not self._dirty:
            return ""
        self._dirty = False
        prev = self._text
        self._text = self.tokenizer.decode(self._ids)
        if self._text.startswith(prev):
            return self._text[len(prev):]
        # BPE re-decode can adjust the boundary (e.g. outer-whitespace
        # stripping); fall back to the common-prefix delta
        k = 0
        while k < min(len(prev), len(self._text)) and prev[k] == self._text[k]:
            k += 1
        return self._text[k:]

    def _due_interior_ends(self) -> list:
        """Ends of every interior step currently due (full lookahead
        available), up to max_batch_strides — the frontier advances by
        `stride` per interior step, so they are enumerable up front."""
        ends, f, n = [], self._frontier, self._n_mel
        while (n - f >= self.stride + self.delay
               and len(ends) < self.max_batch_strides):
            e = f + self.stride + self.delay
            ends.append(e)
            f = e - self.delay
        return ends

    def _step_many(self, ends: list) -> None:
        """One (k, 80, ctx) forward for k due interior steps, applied in
        stream order.  k is snapped DOWN to a power of two (the remainder is
        picked up by the next _drain iteration) so at most log2(max_batch)
        shapes ever compile."""
        b = 1 << (len(ends).bit_length() - 1)
        ends = ends[:b]
        wins, widths, starts = [], [], []
        for e in ends:
            w, width, ws = self._prepare(e)
            wins.append(w)
            widths.append(width)
            starts.append(ws)
        if all(width == self.ctx for width in widths):
            # steady state (every window full): upload ONE strip covering
            # the union of the overlapping windows and gather the k
            # ctx-windows on device — identical values, ~(k·ctx)/strip
            # fewer link bytes (see _shared_forward "_strip")
            kind = ("beam_topk_strip" if self.decoder == "beam"
                    and self.beam_topk is not None
                    else "beam_dense_strip" if self.decoder == "beam"
                    else "greedy_strip")
            thr = (float(self._beam.top_am_threshold) - 1e-3
                   if kind == "beam_topk_strip" else None)
            fwd = _shared_forward(self.model, kind, self.beam_topk, thr,
                                  ctx=self.ctx, stride=self.stride,
                                  q8=self._q8)
            # starts are stride-apart by construction (asserted: the strip
            # fn slices at i*stride)
            assert all(s - starts[0] == i * self.stride
                       for i, s in enumerate(starts))
            strip, scale = self._upload(self._normalized(starts[0], ends[-1]))
            outs = self.jax.device_get(fwd(
                self.variables, strip,
                self.jnp.asarray(widths, np.int32), scale,
            ))
        else:
            batch, scale = self._upload(np.stack(wins))
            outs = self.jax.device_get(self._forward(
                self.variables, batch,
                self.jnp.asarray(widths, np.int32), scale,
            ))
        if self.decoder == "beam" and self.beam_topk is not None:
            vals, idx, count, out_len = outs
            payloads = [(vals[i], idx[i], count[i]) for i in range(b)]
        else:
            payload, out_len = outs
            payloads = [payload[i] for i in range(b)]
        for i, e in enumerate(ends):
            self._apply(e, False, starts[i], payloads[i], int(out_len[i]))

    def _drain(self) -> str:
        while True:
            ends = self._due_interior_ends()
            if len(ends) > 1:
                self._step_many(ends)
                continue
            step = self._ready()
            if step is None:
                break
            self._step(*step)
        self._trim()
        return self._delta()

    # ---------------- public API ----------------
    def _feed_ingest(self, samples: np.ndarray) -> None:
        assert not self._finished, "stream already finished"
        assert self._n_mel == 0 or self._n_samples > 0, (
            "stream already fed via feed_frames(); don't mix inputs"
        )
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._samples = np.concatenate([self._samples, samples])
        self._n_samples += len(samples)
        self._ingest(end_of_stream=False)

    def _feed_frames_ingest(self, mel: np.ndarray) -> None:
        assert not self._finished, "stream already finished"
        assert self._n_samples == 0, (
            "stream already fed raw samples; don't mix inputs"
        )
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 3:
            mel = mel[0]
        self._mel = np.concatenate([self._mel, mel], axis=1)
        self._n_mel += mel.shape[1]
        self._mel_sum += mel.astype(np.float64).sum(-1)
        self._mel_sumsq += (mel.astype(np.float64) ** 2).sum(-1)

    def _finish_ingest(self) -> None:
        assert not self._finished, "stream already finished"
        self._finished = True
        if self._n_samples > 0:  # raw-sample mode; frame mode has no tail
            self._ingest(end_of_stream=True)

    def feed(self, samples: np.ndarray) -> str:
        """Append raw 16 kHz samples; returns newly finalized text."""
        self._feed_ingest(samples)
        return self._drain()

    def feed_frames(self, mel: np.ndarray) -> str:
        """Append precomputed (80, T) mel frames — for pipelines whose
        frontend already ran (e.g. `.spec` files, an upstream VAD stage).
        Mutually exclusive with feed(); frames are used as-is apart from the
        configured normalization."""
        self._feed_frames_ingest(mel)
        return self._drain()

    def finish(self) -> str:
        """End of stream: compute the reflect-end-padded tail frames and
        finalize everything remaining (no lookahead left to wait for)."""
        self._finish_ingest()
        return self._drain()

    @property
    def text(self) -> str:
        return self._text

    @property
    def words(self):
        """Word-level timestamps for the finalized transcript so far:
        [{'word', 'start', 'end'} in stream seconds] — the serving
        counterpart of `decoding.beam_search.decode_with_timestamps`.
        Requires a tokenizer with `id_to_piece` (the SP-model tokenizer)."""
        from lcasr_tpu.decoding.timestamps import words_from_ids

        return words_from_ids(
            self.tokenizer, self._ids, self._id_frames, ds_factor=self.sf
        )

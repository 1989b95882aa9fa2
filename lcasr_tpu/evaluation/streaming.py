"""Long-context streaming inference: averaged-moving-window and buffered modes.

TPU ports of the reference decode loops:
  * averaged moving window — overlapping windows, per-frame posterior
    averaging at overlapped positions (reference `lcasr/eval/utils.py:46-110`,
    the paper's decode; paper overlap ratio 0.875),
  * buffered — NeMo-style center-crop transcription (reference
    `lcasr/eval/buffered_transcription.py:11-97`),
  * windowed-attention mode is not a loop: the model is built with
    `attention_window_size` set and the whole recording is one forward
    (reference `eval/run.py:38-43`).

TPU-first design (the decode is heavily link-bound on remote-attached chips):
  1. the spectrogram is uploaded ONCE; window extraction is a device-side
     gather with traced start offsets (no per-window host slices),
  2. windows are batched `window_batch_size` at a time into one forward —
     they are independent at eval time (running-stat norms),
  3. the overlap-average accumulation runs ON DEVICE into an fp32 buffer;
     the only host transfer is the final merged logits (or, for the greedy
     path, just the per-frame argmax ids — 4 bytes/frame),
  4. the ragged tail window rides in the same compiled program via its true
     length (static shapes, no recompile).
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import numpy as np


def subsampled_length(
    u_len: int,
    factor: int,
    mode: str = "dw_striding",
    window_t: Optional[int] = None,
) -> int:
    """Host-side mirror of each subsampling mode's output-length arithmetic
    (`ops/conv.py:calc_length` / `StackingSubsampling`), used to place
    window outputs in the merged logit buffer.

    mode: dw_striding/striding/conv1d (k3 s2 pad 1+1, floor), vggnet
    (2x2 maxpool ceil), stacking (pad the STATIC window T to a factor
    multiple, then integer-divide the true length — pass `window_t`)."""
    if mode == "stacking":
        t = window_t if window_t is not None else u_len
        pad = (factor - t % factor) % factor
        return max((u_len + pad) // factor, 1)
    n = u_len
    for _ in range(int(math.log2(factor))):
        if mode == "vggnet":
            n = math.ceil((n - 2) / 2 + 1)
        else:
            n = math.floor((n - 1) / 2 + 1)
    return int(n)


def _window_positions(spec_n: int, seq_len: int, overlap: int):
    """Window (start, true_length) pairs with the reference's truncation
    guard (one trailing short window allowed, then stop —
    reference `utils.py:70-81`)."""
    positions, last_ulen, kill_next = [], None, False
    for i in range(0, spec_n, seq_len - overlap):
        u_len = min(seq_len, spec_n - i)
        if kill_next:
            break
        if last_ulen is not None and u_len < last_ulen:
            kill_next = True
        last_ulen = u_len
        positions.append((i, u_len))
    return positions


class StreamingDecoder:
    """Device-resident moving-window decoder for one (model, variables)."""

    def __init__(
        self,
        model,
        variables,
        n_classes: int,
        subsampling_factor: Optional[int] = None,
        window_batch_size: int = 16,
        transfer_dtype=None,  # e.g. jnp.bfloat16 halves the upload
        subsampling_mode: Optional[str] = None,
        pipeline_upload: bool = False,
        mesh=None,  # jax.sharding.Mesh with a "data" axis → DP decode
        cache_upload: bool = False,  # reuse the device spec across calls
    ):
        import jax
        import jax.numpy as jnp

        # Normalize transfer_dtype to one of: "int8", "int4", or a float
        # jnp dtype.  Quantized transfers need scaling params, so an int
        # dtype must route through the quantized branch — accept the type
        # variants (np.int8, jnp.int4, np.dtype("int8"), ...) and reject
        # anything else loudly rather than raw-casting to garbage.
        if transfer_dtype is None:
            transfer_dtype = jnp.bfloat16
        if not isinstance(transfer_dtype, str):
            try:
                name = jnp.dtype(transfer_dtype).name
            except TypeError:
                raise ValueError(
                    f"unrecognized transfer_dtype: {transfer_dtype!r}")
            if name in ("int8", "int4"):
                transfer_dtype = name
            elif name in ("float32", "bfloat16", "float16"):
                transfer_dtype = jnp.dtype(transfer_dtype)
            else:
                raise ValueError(
                    f"unsupported transfer_dtype {name!r}: expected one of "
                    "int8/int4 (quantized) or float32/bfloat16/float16")
        elif transfer_dtype not in ("int8", "int4"):
            try:
                name = jnp.dtype(transfer_dtype).name  # 'bfloat16'/'float32'
            except TypeError:
                raise ValueError(
                    f"unrecognized transfer_dtype {transfer_dtype!r}: "
                    "expected one of int8/int4 (quantized) or "
                    "float32/bfloat16/float16")
            if name not in ("float32", "bfloat16", "float16"):
                raise ValueError(
                    f"unsupported transfer_dtype {name!r}: expected one of "
                    "int8/int4 (quantized) or float32/bfloat16/float16")
            transfer_dtype = jnp.dtype(transfer_dtype)
        self.transfer_dtype = transfer_dtype

        self.jax, self.jnp = jax, jnp
        self.model = model
        if mesh is not None and int(mesh.shape["data"]) > 1:
            # DP decode: weights (and uploads, see _upload) must be
            # replicated across the mesh, not committed to one device
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicated = NamedSharding(mesh, PartitionSpec())
            self.variables = jax.device_put(variables, self._replicated)
        else:
            self._replicated = None
            self.variables = jax.device_put(variables)
        self.n_classes = n_classes
        # output-length arithmetic follows the model's subsampling mode — a
        # stacking-subsampled model has different offsets than dw-striding
        self.ds = (
            subsampling_factor
            if subsampling_factor is not None
            else getattr(model, "subsampling_factor", 8)
        )
        self.mode = (
            subsampling_mode
            if subsampling_mode is not None
            else getattr(model, "subsampling", "dw_striding")
        )
        self.W = window_batch_size
        self.pipeline_upload = pipeline_upload
        # Opt-in upload memoization: when the SAME host array object is
        # decoded again (bench repeats, A/B sweeps), skip the host quantize +
        # link transfer and reuse the device-resident spectrogram.  This is
        # what lets bench.py report a `device_only_rtfx` companion — decode
        # time with the upload excluded — so a headline regression separates
        # into link weather vs device code from the artifact alone.
        self.cache_upload = cache_upload
        self._upload_memo = None  # (host array object, quant, device spec)

        @functools.partial(jax.jit, static_argnames=("seq_len",))
        def step(variables, spec, starts, lengths, offsets, sums, counts, seq_len,
                 base=0):
            # spec: (80, T) on device; extract W windows by gather.  `base`
            # is the global frame index of spec[:, 0] (pipelined path hands
            # this a stripe, not the whole recording)
            T = spec.shape[-1]
            idx = (starts - base)[:, None] + jnp.arange(seq_len)[None, :]
            idx = jnp.clip(idx, 0, T - 1)
            windows = jnp.take(spec, idx, axis=1)  # (80, W, seq_len)
            windows = jnp.swapaxes(windows, 0, 1)  # (W, 80, seq_len)
            valid_t = jnp.arange(seq_len)[None, :] < lengths[:, None]
            windows = jnp.where(valid_t[:, None, :], windows, 0.0)

            out = self.model.apply(variables, windows, length=lengths)
            log_probs = out["final_posteriors"]
            out_lens = out["length"]

            def body(j, carry):
                sums, counts = carry
                lp = log_probs[j].astype(jnp.float32)
                # zero-length batch-padding windows must contribute nothing —
                # stacking subsampling clamps out_len to ≥1 even at length 0
                n = jnp.where(lengths[j] > 0, out_lens[j], 0)
                valid = (jnp.arange(lp.shape[0]) < n)[:, None]
                probs = jnp.where(valid, jnp.exp(lp), 0.0)
                seg = jax.lax.dynamic_slice(
                    sums, (offsets[j], 0), (lp.shape[0], self.n_classes)
                )
                sums = jax.lax.dynamic_update_slice(sums, seg + probs, (offsets[j], 0))
                cseg = jax.lax.dynamic_slice(counts, (offsets[j], 0), (lp.shape[0], 1))
                counts = jax.lax.dynamic_update_slice(
                    counts, cseg + valid.astype(jnp.float32), (offsets[j], 0)
                )
                return sums, counts

            return jax.lax.fori_loop(0, log_probs.shape[0], body, (sums, counts))

        @jax.jit
        def finalize_logits(sums, counts):
            return jnp.log(sums / jnp.maximum(counts, 1.0))

        @jax.jit
        def finalize_argmax(sums, counts):
            return jnp.argmax(sums / jnp.maximum(counts, 1.0), axis=-1)

        def accumulate_scan(variables, spec, starts, lens, offs, seq_len, total):
            """Scan over (nb, W) window batches, accumulating overlap-average
            sums/counts for every window this caller owns (under DP decode the
            W axis is sharded, so this runs per device on W/n windows)."""
            sums = jnp.zeros((total, self.n_classes), jnp.float32)
            counts = jnp.zeros((total, 1), jnp.float32)
            T = spec.shape[-1]

            def batch_step(carry, xs):
                sums, counts = carry
                st, ln, of = xs
                idx = jnp.minimum(st[:, None] + jnp.arange(seq_len)[None, :], T - 1)
                wins = jnp.swapaxes(jnp.take(spec, idx, axis=1), 0, 1)
                valid_t = jnp.arange(seq_len)[None, :] < ln[:, None]
                wins = jnp.where(valid_t[:, None, :], wins, 0.0)
                out = self.model.apply(variables, wins, length=ln)
                lp, ol = out["final_posteriors"], out["length"]

                def body(j, c):
                    sums, counts = c
                    l = lp[j].astype(jnp.float32)
                    # see step(): guard zero-length padding windows
                    n_ok = jnp.where(ln[j] > 0, ol[j], 0)
                    valid = (jnp.arange(l.shape[0]) < n_ok)[:, None]
                    probs = jnp.where(valid, jnp.exp(l), 0.0)
                    seg = jax.lax.dynamic_slice(
                        sums, (of[j], 0), (l.shape[0], self.n_classes)
                    )
                    sums = jax.lax.dynamic_update_slice(sums, seg + probs, (of[j], 0))
                    cs = jax.lax.dynamic_slice(counts, (of[j], 0), (l.shape[0], 1))
                    counts = jax.lax.dynamic_update_slice(
                        counts, cs + valid.astype(jnp.float32), (of[j], 0)
                    )
                    return sums, counts

                return jax.lax.fori_loop(0, lp.shape[0], body, (sums, counts)), None

            (sums, counts), _ = jax.lax.scan(batch_step, (sums, counts), (starts, lens, offs))
            return sums, counts

        @functools.partial(jax.jit, static_argnames=("seq_len", "total", "mode"))
        def fused_run(variables, spec, starts, lens, offs, seq_len, total, mode):
            """Whole decode in ONE dispatch: lax.scan over window batches,
            finalized in-program (returning the raw 0.5 GB sum/count buffers
            as jit outputs costs an extra HBM materialization + a second
            dispatch round trip — measured ~300 ms at 20-min contexts)."""
            sums, counts = accumulate_scan(
                variables, spec, starts, lens, offs, seq_len, total
            )
            avg = sums / jnp.maximum(counts, 1.0)
            if mode == "argmax":
                return jnp.argmax(avg, -1)
            return jnp.log(avg)

        self.mesh = mesh
        self.n_dp = int(mesh.shape["data"]) if mesh is not None else 1
        if self.n_dp > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            @functools.partial(
                jax.jit, static_argnames=("seq_len", "total", "mode")
            )
            def fused_run_dp(variables, spec, starts, lens, offs,
                             seq_len, total, mode):
                """Data-parallel decode: eval-time windows are independent
                (running-stat norms), so the W axis shards over the mesh
                `data` axis — each device forwards W/n windows per scan step
                and accumulates into a LOCAL (total, C) buffer; one psum
                merges the partial overlap-averages.  This is the multi-chip
                decode the single-GPU reference has no counterpart for:
                near-linear RTFx in the data-axis size once the (replicated)
                spectrogram upload is amortized."""

                def body(variables, spec, starts, lens, offs):
                    sums, counts = accumulate_scan(
                        variables, spec, starts, lens, offs, seq_len, total
                    )
                    return (
                        jax.lax.psum(sums, "data"),
                        jax.lax.psum(counts, "data"),
                    )

                sums, counts = shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(), P(None, "data"), P(None, "data"),
                              P(None, "data")),
                    out_specs=(P(), P()),
                    check_vma=False,
                )(variables, spec, starts, lens, offs)
                avg = sums / jnp.maximum(counts, 1.0)
                if mode == "argmax":
                    return jnp.argmax(avg, -1)
                return jnp.log(avg)

            self._fused_run_dp = fused_run_dp
        else:
            self._fused_run_dp = None

        @jax.jit
        def dequant(spec_i8, scale):
            return spec_i8.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)

        @jax.jit
        def dequant4(packed_u8, lo, step):
            """Unpack two 4-bit codes per byte (big nibble first) and map
            them back to mel values with the per-mel-bin affine params."""
            hi_nib = (packed_u8 >> 4).astype(jnp.float32)
            lo_nib = (packed_u8 & 0xF).astype(jnp.float32)
            q = jnp.stack([hi_nib, lo_nib], axis=-1).reshape(
                packed_u8.shape[0], -1
            )
            return (lo[:, None] + step[:, None] * q).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("overlap",))
        def assemble(piece, next_piece, overlap):
            """Stripe for one window group: this group's frames + the halo
            (`overlap` frames) from the next stripe."""
            return jnp.concatenate([piece, next_piece[:, :overlap]], axis=-1)

        self._assemble = assemble
        self._step = step
        self._fused_run = fused_run
        self._finalize_logits = finalize_logits
        self._finalize_argmax = finalize_argmax
        self._dequant = dequant
        self._dequant4 = dequant4

    def _quant_params(self, spec: np.ndarray):
        """Per-recording quantization parameters for the opted-in transfer
        dtype, computed BEFORE any bucket padding (pad columns are masked
        downstream, so they must not widen the quantization range).

        int8: symmetric scalar scale (the certified default).
        int4: per-mel-bin asymmetric (lo, step) — each of the 80 bins gets
        its own [min, max] mapped onto 16 levels, which is ~4x tighter than
        a recording-global range on per-recording-normalized mels.  Two
        codes pack per byte, halving the link bytes again vs int8."""
        td = self.transfer_dtype  # normalized in __init__: "int8"/"int4"/float dtype
        if td == "int8":
            return ("int8", float(np.abs(spec).max()) / 127.0 or 1.0)
        if td == "int4":
            lo = spec.min(axis=-1).astype(np.float32)
            step = np.maximum(
                (spec.max(axis=-1) - lo) / 15.0, 1e-8
            ).astype(np.float32)
            return ("int4", lo, step)
        return None

    def _upload(self, host_f32: np.ndarray, quant):
        """Host-cast + async device_put of one array (bf16 by default;
        int8/int4 quantization with per-recording params when opted in —
        one device-side dequant back to bf16, so the step functions never
        see the quantized array)."""
        put = (
            (lambda a: self.jax.device_put(a, self._replicated))
            if self._replicated is not None
            else self.jax.device_put
        )
        if quant is not None and quant[0] == "int8":
            scale = quant[1]
            q = np.clip(np.rint(host_f32 / scale), -127, 127).astype(np.int8)
            return self._dequant(put(q), self.jnp.float32(scale))
        if quant is not None and quant[0] == "int4":
            _, lo, step = quant
            orig_w = host_f32.shape[-1]
            if orig_w % 2:
                host_f32 = np.pad(host_f32, ((0, 0), (0, 1)))
            q = np.clip(
                np.rint((host_f32 - lo[:, None]) / step[:, None]), 0, 15
            ).astype(np.uint8)
            packed = (q[:, 0::2] << 4) | q[:, 1::2]
            out = self._dequant4(
                put(packed), self.jnp.asarray(lo), self.jnp.asarray(step)
            )
            return out[:, :orig_w] if orig_w % 2 else out
        return put(host_f32.astype(np.dtype(self.transfer_dtype)))

    def _run_pipelined(self, spec, positions, out_offsets, seq_len, overlap,
                       W, total, quant):
        """Multi-dispatch decode overlapping the host→device upload with
        compute: the recording is uploaded as per-group STRIPES (async
        device_put), and each window group's forward depends only on its own
        stripe + the next stripe's halo — so stripe g+2's transfer rides the
        link while the device runs group g.  Upload was measured at ~half
        the decode wall time on a tunnel-attached chip (≈40 MB/s link);
        chained dispatches cost ~0.5 ms each, so pipelining is pure win
        whenever there is more than one group."""
        jnp, np_ = self.jnp, np
        stride = seq_len - overlap
        P = W * stride
        G = -(-len(positions) // W)

        # G pieces + one HALO piece: the last group's windows reach past
        # G·P into frames that belong to no group of their own — that halo
        # is real spec data, not padding
        pieces = []
        for g in range(G + 1):
            pc = spec[:, g * P : g * P + P]
            if pc.shape[-1] == 0:
                pieces.append(None)  # no real frames → device zeros below
                continue
            if pc.shape[-1] < P:
                pc = np_.pad(pc, ((0, 0), (0, P - pc.shape[-1])))
            pieces.append(self._upload(pc, quant))  # async queue

        zero_piece = jnp.zeros((spec.shape[0], P), pieces[0].dtype)
        pieces = [zero_piece if p is None else p for p in pieces]
        sums = jnp.zeros((total, self.n_classes), jnp.float32)
        counts = jnp.zeros((total, 1), jnp.float32)
        for g in range(G):
            group = positions[g * W : (g + 1) * W]
            starts = np_.zeros((W,), np_.int32)
            lengths = np_.zeros((W,), np_.int32)
            offs = np_.zeros((W,), np_.int32)
            for j, (i, u_len) in enumerate(group):
                starts[j], lengths[j] = i, u_len
                offs[j] = out_offsets[g * W + j]
            spec_g = self._assemble(pieces[g], pieces[g + 1], overlap=overlap)
            sums, counts = self._step(
                self.variables, spec_g,
                jnp.asarray(starts), jnp.asarray(lengths), jnp.asarray(offs),
                sums, counts, seq_len=seq_len, base=g * P,
            )
        return sums, counts

    def _run(self, spec: np.ndarray, seq_len: int, overlap: int,
             fused: bool = True, mode: str = "logits"):
        jnp = self.jnp
        memo_key = spec if self.cache_upload else None
        spec = np.asarray(spec)
        if spec.ndim == 3:
            spec = spec[0]
        spec_n = spec.shape[-1]
        if seq_len > spec_n:
            # windowed-attention mode: ONE window over the whole recording.
            # Bucket the STATIC window width to the 4096-frame upload bucket
            # so same-bucket recordings share one compiled fused_run — the
            # true length rides in `lengths`, the pad is masked (a per-
            # recording static here cost a 20-40 s recompile per recording).
            # EXCEPT stacking subsampling, whose output length depends on
            # the static window pad — widening the window would drop the
            # final partial frame group vs a direct forward.
            if self.mode == "stacking":
                seq_len, overlap = spec_n, 0
            else:
                seq_len, overlap = -(-spec_n // 4096) * 4096, 0
        assert overlap % self.ds == 0, (
            "Overlap must be a multiple of the downsampling factor"
        )
        assert seq_len > overlap
        positions = _window_positions(spec_n, seq_len, overlap)

        # deterministic output offsets (calc_length is data-independent)
        out_offsets, pos = [], 0
        for i, u_len in positions:
            n_valid = subsampled_length(u_len, self.ds, self.mode, window_t=seq_len)
            if i != 0:
                pos -= int(overlap / (u_len / n_valid))
            out_offsets.append(pos)
            pos += n_valid
        n_out = pos

        # slack past n_out only needs one padded WINDOW's subsampled rows
        # (each step writes fixed subsampled-seq_len blocks at out_offsets);
        # the old raw-frame seq_len slack was 8x larger — at windowed-
        # attention scale (seq_len clamped to spec_n) it allocated ~2x the
        # recording in fp32 sums for nothing
        total = n_out + subsampled_length(seq_len, self.ds, self.mode, window_t=seq_len)
        # bucket the STATIC total so recordings of similar length share one
        # compiled fused_run (2048 rows ≈ 34 MB of fp32 sums per bucket step
        # — cheap next to a 20-40 s compile); the spec width is bucketed at
        # upload below for the same reason.  Extra rows are never read:
        # results are sliced to n_out.
        total = -(-total // 2048) * 2048
        # bf16 upload halves link traffic (the mel spec is per-recording
        # normalized, so ~3 decimal digits lose nothing audible).  The cast
        # happens on HOST via numpy/ml_dtypes — jnp.asarray(np, bf16) routes
        # through a slow device-side elementwise path (measured 19 ms host
        # vs ~8 s device through the tunnel).  transfer_dtype='int8' halves
        # it again: symmetric per-recording quantization on host, ONE
        # device-side dequant back to bf16 — the step functions never see
        # the quantized array.  'int4' halves it once more (two codes per
        # byte, per-mel-bin affine params; WER-certified in
        # tests/test_closed_loop.py like int8).
        memo = self._upload_memo
        if (memo_key is not None and memo is not None
                and memo[0] is memo_key):
            quant = memo[1]
        else:
            memo = None
            quant = self._quant_params(spec)

        # clamp the window batch to the actual window count — otherwise a
        # single-window decode (windowed-attention mode over a full 20-min
        # recording) would shape a (W, 80, T) batch of mostly-dummy windows
        # and blow HBM at long T
        W = min(self.W, len(positions))
        if self._fused_run_dp is not None and fused:
            # DP decode shards the W axis over the data mesh axis; pad W to a
            # multiple of the axis size (zero-length windows are inert)
            W = -(-W // self.n_dp) * self.n_dp
            if self.pipeline_upload:
                # the striped-upload path runs the non-DP per-group step;
                # silently losing the mesh would forfeit the promised
                # near-linear scaling, so DP wins and pipelining is skipped
                import warnings

                warnings.warn(
                    "pipeline_upload is ignored under data-parallel decode "
                    "(the DP fused path takes precedence)", stacklevel=3,
                )

        if (self.pipeline_upload and len(positions) > W
                and self._fused_run_dp is None):
            if overlap > W * (seq_len - overlap):
                # each group's halo is ONE stripe (W*stride frames); windows
                # reaching further would read clamped garbage — fall back to
                # the single-upload fused path rather than corrupt silently
                import warnings

                warnings.warn(
                    f"pipeline_upload disabled: overlap {overlap} exceeds "
                    f"the one-stripe halo (W*stride = {W * (seq_len - overlap)}); "
                    f"raise window_batch_size to re-enable",
                    stacklevel=3,
                )
            else:
                # striped upload/compute pipelining (see _run_pipelined).
                # OPT-IN: on a direct-attached host the async stripe transfers
                # hide behind compute; on the tunnel-attached dev chip the link
                # serializes transfers with dispatches, so striping only adds
                # padded upload bytes (measured 1.43 s vs 0.98 s at 20 min) —
                # hence default off
                sums, counts = self._run_pipelined(
                    spec, positions, out_offsets, seq_len, overlap, W, total,
                    quant,
                )
                return sums, counts, n_out

        # bucket the uploaded width: every in-program index is clipped and
        # every window column past its u_len is zero-masked, so tail padding
        # is inert — but it makes same-bucket recordings reuse one compiled
        # program instead of recompiling per distinct spec_n (the nb padding
        # below alone never deduped anything: spec shape and total varied
        # per recording).  4096 frames of bf16/int8 tail ≤ 0.7 MB of upload.
        if memo is not None:
            spec_dev = memo[2]
        else:
            bucket_w = -(-spec.shape[-1] // 4096) * 4096
            if bucket_w != spec.shape[-1]:
                spec = np.pad(spec, ((0, 0), (0, bucket_w - spec.shape[-1])))
            spec_dev = self._upload(spec, quant)
            if memo_key is not None:
                self._upload_memo = (memo_key, quant, spec_dev)
        if fused:
            # one dispatch: scan over (nb, W) window batches.  nb is padded
            # to a multiple of 2 with zero-length windows to bound the
            # number of compiled (nb, seq_len) variants per dataset.
            nb = -(-len(positions) // W)
            nb = -(-nb // 2) * 2
            starts = np.zeros((nb, W), np.int32)
            lengths = np.zeros((nb, W), np.int32)
            offs = np.zeros((nb, W), np.int32)
            for j, (i, u_len) in enumerate(positions):
                starts[j // W, j % W] = i
                lengths[j // W, j % W] = u_len
                offs[j // W, j % W] = out_offsets[j]
            run = self._fused_run_dp or self._fused_run
            result = run(
                self.variables, spec_dev,
                jnp.asarray(starts), jnp.asarray(lengths), jnp.asarray(offs),
                seq_len=seq_len, total=total, mode=mode,
            )
            return result, None, n_out

        sums = jnp.zeros((total, self.n_classes), jnp.float32)
        counts = jnp.zeros((total, 1), jnp.float32)
        for b0 in range(0, len(positions), W):
            group = positions[b0 : b0 + W]
            starts = np.zeros((W,), np.int32)
            lengths = np.zeros((W,), np.int32)
            offs = np.zeros((W,), np.int32)
            for j, (i, u_len) in enumerate(group):
                starts[j], lengths[j], offs[j] = i, u_len, out_offsets[b0 + j]
            sums, counts = self._step(
                self.variables, spec_dev,
                jnp.asarray(starts), jnp.asarray(lengths), jnp.asarray(offs),
                sums, counts, seq_len=seq_len,
            )
        return sums, counts, n_out

    def logits(self, spec: np.ndarray, seq_len: int, overlap: int,
               fused: bool = True) -> np.ndarray:
        """Merged averaged log-probs (T', C) — the reference fetch_logits
        contract."""
        res, counts, n_out = self._run(spec, seq_len, overlap, fused=fused, mode="logits")
        if counts is None:
            return np.asarray(res)[:n_out]
        return np.asarray(self._finalize_logits(res, counts))[:n_out]

    def greedy(self, spec: np.ndarray, seq_len: int, overlap: int,
               fused: bool = True) -> np.ndarray:
        """Merged per-frame argmax ids — minimal-transfer greedy path."""
        res, counts, n_out = self._run(spec, seq_len, overlap, fused=fused, mode="argmax")
        if counts is None:
            return np.asarray(res)[:n_out]
        return np.asarray(self._finalize_argmax(res, counts))[:n_out]


# ---------------------------------------------------------------------------
# functional API (reference-parity contract, used by eval/run + tests)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _make_accumulate(n_classes: int):
    """Shared jitted overlap-average accumulator (cached per n_classes so
    repeated fetch_logits calls — one per recording — reuse one program)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def accumulate(sums, counts, log_probs, out_lens, offsets):
        def body(j, carry):
            sums, counts = carry
            lp = log_probs[j].astype(jnp.float32)
            n = out_lens[j]
            valid = (jnp.arange(lp.shape[0]) < n)[:, None]
            probs = jnp.where(valid, jnp.exp(lp), 0.0)
            seg = jax.lax.dynamic_slice(sums, (offsets[j], 0), (lp.shape[0], n_classes))
            sums = jax.lax.dynamic_update_slice(sums, seg + probs, (offsets[j], 0))
            cseg = jax.lax.dynamic_slice(counts, (offsets[j], 0), (lp.shape[0], 1))
            counts = jax.lax.dynamic_update_slice(
                counts, cseg + valid.astype(jnp.float32), (offsets[j], 0)
            )
            return sums, counts

        return jax.lax.fori_loop(0, log_probs.shape[0], body, (sums, counts))

    return accumulate


def fetch_logits(
    model_fn: Callable,
    spec: np.ndarray,  # (1, 80, T)
    seq_len: int,
    overlap: int,
    n_classes: int,
    subsampling_factor: int = 8,
    use_tqdm: bool = False,
    window_batch_size: int = 8,
    subsampling_mode: str = "dw_striding",
) -> np.ndarray:
    """Averaged moving window decode → (T', n_classes) log-probs.

    model_fn(chunks (W, 80, seq_len), lengths (W,)) → (log_probs, out_lens).
    Host-slicing variant kept for model_fn-style callers; prefer
    StreamingDecoder for device-resident decoding.
    """
    import jax
    import jax.numpy as jnp

    spec_n = spec.shape[-1]
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    assert overlap % subsampling_factor == 0, (
        "Overlap must be a multiple of the downsampling factor"
    )
    assert seq_len > overlap
    positions = _window_positions(spec_n, seq_len, overlap)

    out_offsets, pos = [], 0
    for i, u_len in positions:
        n_valid = subsampled_length(
            u_len, subsampling_factor, subsampling_mode, window_t=seq_len
        )
        if i != 0:
            pos -= int(overlap / (u_len / n_valid))
        out_offsets.append(pos)
        pos += n_valid
    n_out = pos

    # exact buffer size from the offset recurrence + one padded window's
    # rows of slack (the naive spec_n//factor formula under-allocated when
    # per-window rounding drifts, e.g. seq_len not a factor multiple)
    total = n_out + subsampled_length(
        seq_len, subsampling_factor, subsampling_mode, window_t=seq_len
    )
    accumulate = _make_accumulate(n_classes)

    sums = jnp.zeros((total, n_classes), jnp.float32)
    counts = jnp.zeros((total, 1), jnp.float32)

    W = window_batch_size
    it = range(0, len(positions), W)
    if use_tqdm:
        from tqdm import tqdm

        it = tqdm(list(it))
    for b0 in it:
        group = positions[b0 : b0 + W]
        batch = np.zeros((W, 80, seq_len), np.float32)
        lengths = np.zeros((W,), np.int32)
        offs = np.zeros((W,), np.int32)
        for j, (i, u_len) in enumerate(group):
            batch[j, :, :u_len] = spec[0, :, i : i + u_len]
            lengths[j] = u_len
            offs[j] = out_offsets[b0 + j]
        log_probs, out_len = model_fn(batch, lengths)
        out_len = jnp.where(jnp.arange(W) < len(group), out_len, 0)
        sums, counts = accumulate(sums, counts, log_probs, out_len, jnp.asarray(offs))

    merged = jnp.log(sums / jnp.maximum(counts, 1.0))
    return np.asarray(merged)[:n_out]


def fetch_logits_buffered(
    model_fn: Callable,
    spec: np.ndarray,
    seq_len: int,
    overlap: int,
    n_classes: int,
    subsampling_factor: int = 8,
    use_tqdm: bool = False,
) -> np.ndarray:
    """Buffered transcription: each chunk gets a symmetric context buffer of
    overlap/2 frames per side; only the central `chunk_size` region's logits
    are written, each output frame exactly once (reference
    `buffered_transcription.py:11-97`)."""
    spec_n = spec.shape[-1]
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    assert overlap % 2 == 0 or overlap == 0, "overlap must be even"
    chunk_size = seq_len - overlap
    assert chunk_size > 0
    buf = overlap // 2

    outputs = []
    positions = list(range(0, spec_n, chunk_size))
    it = positions
    if use_tqdm:
        from tqdm import tqdm

        it = tqdm(positions)

    for start in it:
        ctx_start = max(0, start - buf)
        ctx_end = min(spec_n, start + chunk_size + buf)
        audio_chunk = spec[:, :, ctx_start:ctx_end]
        u_len = audio_chunk.shape[-1]
        if u_len < seq_len:
            audio_chunk = np.pad(audio_chunk, ((0, 0), (0, 0), (0, seq_len - u_len)))
        log_probs, out_len = model_fn(audio_chunk, np.array([u_len], np.int32))
        n_valid = int(np.asarray(out_len)[0])
        lp = np.asarray(log_probs, dtype=np.float32)[0, :n_valid]

        ratio = u_len / n_valid
        rel_start = start - ctx_start
        center_lo = int(rel_start / ratio)
        center_hi = int(min(rel_start + chunk_size, u_len) / ratio)
        outputs.append(lp[center_lo:center_hi])
        if start + chunk_size >= spec_n:
            break

    return np.concatenate(outputs, axis=0)


def make_cp_windowed_model_fn(model, variables, mesh, seq_axis: str = "seq") -> Callable:
    """Context-parallel single-pass forward: the recording's time axis is
    sharded over the mesh `seq` axis (`parallel/cp_model.py`).  This is the
    multi-chip route for windowed-attention decode when the full-recording
    forward exceeds one chip's HBM (reference `eval/run.py:38-43` runs it as
    one big single-GPU forward; here a 10-hour single pass spreads across
    the slice).  Satisfies the `fetch_logits` model_fn contract — pass it
    with `window_batch_size=1`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from lcasr_tpu.parallel.cp_model import context_parallel_apply

    variables = jax.device_put(variables, NamedSharding(mesh, PartitionSpec()))
    n = int(mesh.shape[seq_axis])
    sf = getattr(model, "subsampling_factor", 8)

    @jax.jit
    def fn(variables, audio, length):
        out = context_parallel_apply(
            model, variables, audio, mesh, lengths=length, seq_axis=seq_axis
        )
        return out["final_posteriors"], out["length"]

    def call(audio, length):
        audio = np.asarray(audio)
        # T must divide (seq shards x subsampling): pad the STATIC width;
        # true lengths keep the pad masked, callers slice to out_len
        pad = (-audio.shape[-1]) % (n * sf)
        if pad:
            audio = np.pad(audio, ((0, 0), (0, 0), (0, pad)))
        return fn(variables, jnp.asarray(audio),
                  jnp.asarray(length, jnp.int32))

    return call


def make_windowed_model_fn(model, variables) -> Callable:
    """Build the fixed-shape jitted forward used by the functional loops.

    `variables` is passed as a jit ARGUMENT (not a closure constant) so the
    weights live on device as buffers instead of being baked into the HLO.
    """
    import jax

    variables = jax.device_put(variables)

    @jax.jit
    def fn(variables, audio, length):
        out = model.apply(variables, audio, length=length)
        return out["final_posteriors"], out["length"]

    def call(audio, length):
        return fn(variables, audio, length)

    return call

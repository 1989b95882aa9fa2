"""Serving latency + multi-stream throughput.

Single-stream: the online transcriber driven like a live session.

Feeds the flagship model 1-second mel chunks (the cadence a real-time
client produces) through `serving.OnlineTranscriber` and measures what a
serving deployment cares about:

  * step latency — wall time of each feed() that triggered a decode step
    (one fixed-shape (1, 80, ctx) forward; p50/p95),
  * idle feed cost — feed() calls that only buffer frames,
  * sustained RTF — total wall / audio fed (must be << 1 for real time),
  * finalization lag — the algorithmic text delay,
    (stride + right_delay) frames, reported in seconds.

Writes benchmarks/RESULTS_serving.json on TPU.
Run: python benchmarks/bench_serving.py [--minutes 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--context_frames", type=int, default=2048)
    ap.add_argument("--stride_frames", type=int, default=512)
    ap.add_argument("--right_delay_frames", type=int, default=512)
    ap.add_argument("--chunk_frames", type=int, default=100,
                    help="frames per feed (100 = 1 s of audio)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke test of the harness)")
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="server wave upload format (int8 quarters the "
                         "link traffic; WER-certified in the closed loop)")
    ap.add_argument("--streams", type=int, default=8,
                    help="concurrent sessions for the batched-server leg "
                         "(0 skips it)")
    ap.add_argument("--decoder", default="greedy",
                    choices=["greedy", "beam"],
                    help="beam = incremental prefix beam over finalized "
                         "logits (sparse top-K fetch)")
    ap.add_argument("--beam_width", type=int, default=25)
    ap.add_argument("--beam_topk", type=int, default=32,
                    help="sparse fetch width; 0 = dense fp32 fetch")
    ap.add_argument("--sharpen", type=float, default=24.0,
                    help="CTC-head scale for beam mode (random-init heads "
                         "are near-flat; 24 reproduces a trained model's "
                         "1-5 above-threshold candidates/frame — the "
                         "measured peakiness is reported in the JSON)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import FLAGSHIP
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.sconformer_xl import SCConformerXL
    from lcasr_tpu.serving import OnlineTranscriber, TranscriptionServer

    cfg = dict(FLAGSHIP)
    if args.tiny:
        cfg.update(d_model=64, n_layers=1, n_heads=2, head_dim=32,
                   subsampling_conv_channels=32)
    model = SCConformerXL(**cfg, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, args.context_frames), jnp.float32)
    )
    tokenizer = load_tokenizer()

    total_frames = int(args.minutes * 60 * 100)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(80, total_frames)).astype(np.float32)

    dec_kw = {}
    refetch_counts = []
    count_stats = {}
    if args.decoder == "beam":
        # a random-init head yields near-flat posteriors over 4096 classes
        # (above-threshold counts far beyond any trained model's 1-5);
        # sharpen the CTC head so the benchmark exercises the search at a
        # trained model's peakiness — the search cost scales with the
        # candidate count, so this is the variable that must be controlled.
        # The MEASURED peakiness + dense-refetch rate are reported.
        params = dict(variables["params"])
        params["decoder"] = jax.tree.map(lambda x: x * args.sharpen,
                                         params["decoder"])
        variables = {**variables, "params": params}
        dec_kw = dict(
            decoder="beam",
            beam_opts=dict(beam_width=args.beam_width, alpha=0.0, beta=0.0),
            beam_topk=args.beam_topk or None,
        )
        # probe the resulting above-threshold counts on one context window
        probe = model.apply(
            variables, jnp.asarray(mel[None, :, : args.context_frames]))
        lp = np.asarray(probe["final_posteriors"][0], np.float32)
        c = (lp >= lp.max(axis=-1, keepdims=True) - 6.0).sum(-1)
        count_stats = {
            "sharpen": args.sharpen,
            "above_thr_count_p50": int(np.percentile(c, 50)),
            "above_thr_count_p95": int(np.percentile(c, 95)),
        }

    tr_td = args.transfer_dtype if args.transfer_dtype == "int8" else None

    def session(frames):
        tr = OnlineTranscriber(
            model, variables, tokenizer,
            context_frames=args.context_frames,
            stride_frames=args.stride_frames,
            right_delay_frames=args.right_delay_frames,
            norm="none", transfer_dtype=tr_td,
            **dec_kw,
        )
        lat, stepped = [], []
        t_start = time.perf_counter()
        for t0 in range(0, frames.shape[1], args.chunk_frames):
            f0 = tr._frontier
            t1 = time.perf_counter()
            tr.feed_frames(frames[:, t0 : t0 + args.chunk_frames])
            lat.append(time.perf_counter() - t1)
            stepped.append(tr._frontier > f0)  # this feed ran >=1 forward
        tr.finish()
        wall = time.perf_counter() - t_start
        if args.decoder == "beam":
            refetch_counts.append(tr.sparse_refetches)
        return np.asarray(lat), np.asarray(stepped), wall

    # warmup session compiles the fixed window shape
    session(mel[:, : args.context_frames * 3])

    lat, stepped, wall = session(mel)
    audio_s = total_frames / 100.0
    step_lat = lat[stepped]
    idle_lat = lat[~stepped]
    result = {
        "backend": jax.default_backend(),
        "audio_minutes": args.minutes,
        "chunk_ms": args.chunk_frames * 10,
        "context_frames": args.context_frames,
        "stride_frames": args.stride_frames,
        "right_delay_frames": args.right_delay_frames,
        "decode_steps": int(len(step_lat)),
        "step_latency_ms_p50": round(float(np.percentile(step_lat, 50)) * 1e3, 1),
        "step_latency_ms_p95": round(float(np.percentile(step_lat, 95)) * 1e3, 1),
        "idle_feed_ms_p50": round(float(np.percentile(idle_lat, 50)) * 1e3, 2)
        if len(idle_lat) else 0.0,
        "finalization_lag_s": (args.stride_frames + args.right_delay_frames) / 100.0,
        "sustained_rtf": round(wall / audio_s, 4),
        "rtfx": round(audio_s / wall, 1),
        # what the single-stream/backlog legs actually uploaded (bfloat16
        # is a server-wave-only format and falls back to fp32 here)
        "transcriber_transfer_dtype": tr_td or "float32",
    }
    if args.decoder == "beam":
        result.update({
            "decoder": "beam",
            "beam_width": args.beam_width,
            "beam_topk": args.beam_topk or "dense",
            "sparse_refetches": int(refetch_counts[-1]),
            **count_stats,
        })
    # ---- single-stream BACKLOG throughput (r4, VERDICT #5): one session
    # fed the whole recording at once — the file-transcription-through-the-
    # serving-path case, and the catch-up rate after a stall.  Due strides
    # ride batched (k, 80, ctx) forwards (transcriber stride batching);
    # A/B against the serial path (max_batch_strides=1). ----
    def backlog(k):
        # warmup = one full identical pass: compiles every bucket shape the
        # timed pass will use (the ramp-in batch, the steady-state strip
        # buckets, the tail) — a partial warmup left the biggest strip
        # shape compiling inside the timing and read as a 5x regression
        tr = OnlineTranscriber(
            model, variables, tokenizer,
            context_frames=args.context_frames,
            stride_frames=args.stride_frames,
            right_delay_frames=args.right_delay_frames,
            norm="none", max_batch_strides=k, transfer_dtype=tr_td,
            **dec_kw,
        )
        tr.feed_frames(mel)
        tr.finish()
        tr2 = OnlineTranscriber(
            model, variables, tokenizer,
            context_frames=args.context_frames,
            stride_frames=args.stride_frames,
            right_delay_frames=args.right_delay_frames,
            norm="none", max_batch_strides=k, transfer_dtype=tr_td,
            **dec_kw,
        )
        t0 = time.perf_counter()
        tr2.feed_frames(mel)
        tr2.finish()
        return audio_s / (time.perf_counter() - t0)

    result["backlog_rtfx_serial"] = round(backlog(1), 1)
    result["backlog_rtfx_batched8"] = round(backlog(8), 1)

    # ---- batched server: N concurrent live sessions, lockstep 1 s feeds.
    # The aggregate must approach N x the single-stream RTFx when steps are
    # dispatch-bound (N due steps ride ONE (N, 80, ctx) forward) ----
    if args.streams:
        S = args.streams
        server = TranscriptionServer(
            model, variables, tokenizer, max_streams=S,
            context_frames=args.context_frames,
            stride_frames=args.stride_frames,
            right_delay_frames=args.right_delay_frames,
            transfer_dtype=args.transfer_dtype,
            **dec_kw,
        )
        mels = [
            np.asarray(rng.normal(size=(80, total_frames)), np.float32)
            for _ in range(S)
        ]
        # warmup: compile the (S, 80, ctx) shape
        w = [server.open(norm="none") for _ in range(S)]
        for sid, m in zip(w, mels):
            server.feed_frames(sid, m[:, : args.context_frames * 2])
        for sid in w:
            server.finish(sid)

        sids = [server.open(norm="none") for _ in range(S)]
        step_lat = []
        t_start = time.perf_counter()
        for t0 in range(0, total_frames, args.chunk_frames):
            t1 = time.perf_counter()
            # event-loop pattern: ingest the tick's arrivals, pump ONCE so
            # all concurrent due steps share one batched wave
            for sid, m in zip(sids, mels):
                server.feed_frames(sid, m[:, t0 : t0 + args.chunk_frames],
                                   pump=False)
            server.pump()
            step_lat.append(time.perf_counter() - t1)
        if args.decoder == "beam":
            result["server_sparse_refetches"] = int(sum(
                s.sparse_refetches for s in server._sessions.values()))
        for sid in sids:
            server.finish(sid)
        wall = time.perf_counter() - t_start
        lat = np.asarray(step_lat)
        result.update({
            "server_streams": S,
            "server_transfer_dtype": args.transfer_dtype,
            "server_round_ms_p50": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "server_round_ms_p95": round(float(np.percentile(lat, 95)) * 1e3, 1),
            "server_aggregate_rtfx": round(S * audio_s / wall, 1),
            "server_rtfx_per_stream": round(audio_s / wall, 1),
            # dispatch accounting: on a link-bound host wall ≈ waves × round
            # trip + upload_bytes/bandwidth — the scaling-plateau evidence
            "server_waves": server.wave_count,
            "server_delta_waves": server.delta_wave_count,
            "server_upload_mb": round(server.upload_bytes / 2**20, 2),
        })

    print(json.dumps(result))
    if jax.default_backend() == "tpu":
        name = ("RESULTS_serving_beam.json" if args.decoder == "beam"
                else "RESULTS_serving.json")
        out = os.path.join(os.path.dirname(__file__), name)
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

"""Serving latency: the online transcriber driven like a live session.

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import FLAGSHIP
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.sconformer_xl import SCConformerXL
    from lcasr_tpu.serving import OnlineTranscriber

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

    def session(frames):
        tr = OnlineTranscriber(
            model, variables, tokenizer,
            context_frames=args.context_frames,
            stride_frames=args.stride_frames,
            right_delay_frames=args.right_delay_frames,
            norm="none",
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
    }
    print(json.dumps(result))
    if jax.default_backend() == "tpu":
        out = os.path.join(os.path.dirname(__file__), "RESULTS_serving.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

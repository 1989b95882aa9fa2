"""Stream a wav file through the online transcriber.

    python -m lcasr_tpu.serving <checkpoint> <audio.wav> \
        [--chunk_seconds 0.5] [--context 2048] [--stride 512] [--delay 512]

Feeds the file in chunk_seconds pieces (as a live source would), printing
each finalized text delta with its stream-time stamp; ends with a summary
line (audio seconds, wall seconds, RTFx).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("audio", help=".wav (scipy) or .npy waveform at 16 kHz")
    parser.add_argument("--chunk_seconds", type=float, default=0.5)
    parser.add_argument("--context", type=int, default=2048)
    parser.add_argument("--stride", type=int, default=512)
    parser.add_argument("--delay", type=int, default=512)
    args = parser.parse_args()

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.audio import grab_left_channel, load_audio, resample
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.run import load_any_checkpoint
    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.serving import OnlineTranscriber

    if args.audio.endswith(".npy"):
        wave = np.load(args.audio).astype(np.float32)
        wave = grab_left_channel(wave).reshape(-1)  # (C, T) → left channel
    else:
        wave, sr = load_audio(args.audio)
        wave = grab_left_channel(wave).reshape(-1)
        if sr != 16000:
            wave = resample(wave, sr, 16000)

    cfg, variables = load_any_checkpoint(args.checkpoint)
    tokenizer = load_tokenizer()
    model = load_model(
        Config({"model": cfg.get("model", Config({})).to_dict()}),
        tokenizer.vocab_size(),
        get_model_class(cfg),
    )
    tr = OnlineTranscriber(
        model, variables, tokenizer, context_frames=args.context,
        stride_frames=args.stride, right_delay_frames=args.delay,
    )

    chunk = max(1, int(args.chunk_seconds * 16000))
    t0 = time.perf_counter()
    fed = 0
    for pos in range(0, len(wave), chunk):
        fed += min(chunk, len(wave) - pos)
        delta = tr.feed(wave[pos : pos + chunk])
        if delta:
            print(f"[{fed / 16000:8.2f}s] {delta}", flush=True)
    delta = tr.finish()
    if delta:
        print(f"[{len(wave) / 16000:8.2f}s] {delta}", flush=True)
    wall = time.perf_counter() - t0
    audio_s = len(wave) / 16000
    print(f"-- {audio_s:.1f}s audio in {wall:.2f}s wall "
          f"(RTFx {audio_s / max(wall, 1e-9):.1f})")


if __name__ == "__main__":
    main()

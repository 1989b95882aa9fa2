"""Dynamic-eval (test-time adaptation) cost on chip.

The reference's TTA (`lcasr/eval/dynamic_eval.py:11-142`) re-trains per
recording at inference time: per chunk, (num_negatives SpecAugmented + 1
clean) forwards, greedy pseudo-labels from the clean copy, CTC loss +
MADGRAD step.  This measures what that costs on the flagship at the paper's
decode window — TTA RTFx alongside the plain decode's, so deployments can
price the adaptation.

Writes benchmarks/RESULTS_dynamic_eval.json on TPU.
Run: python benchmarks/bench_dynamic_eval.py [--minutes 2]
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
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--seq_len", type=int, default=16384)
    ap.add_argument("--overlap_ratio", type=float, default=0.875)
    ap.add_argument("--num_negatives", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke test of the harness)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import FLAGSHIP
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.dynamic_eval import dynamic_eval_ctc_loss
    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    cfg = dict(FLAGSHIP)
    if args.tiny:
        cfg.update(d_model=64, n_layers=1, n_heads=2, head_dim=32,
                   subsampling_conv_channels=32)
    model = SCConformerXL(**cfg, dtype=jnp.bfloat16)
    tokenizer = load_tokenizer()

    total_frames = int(args.minutes * 60 * 100)
    seq_len = min(args.seq_len, total_frames)
    overlap = int(seq_len * args.overlap_ratio) // 8 * 8  # subsampling-aligned
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(1, 80, total_frames)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, seq_len), jnp.float32)
    )

    run = lambda: dynamic_eval_ctc_loss(
        model, variables, spec, seq_len=seq_len, overlap=overlap,
        tokenizer=tokenizer, num_negatives=args.num_negatives,
        epochs=args.epochs,
    )
    logits = run()  # warmup: compiles the adapt + merge programs
    t0 = time.perf_counter()
    logits = run()
    wall = time.perf_counter() - t0

    audio_s = total_frames / 100.0
    result = {
        "backend": jax.default_backend(),
        "audio_minutes": args.minutes,
        "seq_len": seq_len,
        "overlap": overlap,
        "num_negatives": args.num_negatives,
        "epochs": args.epochs,
        "logit_frames": int(logits.shape[0]),
        "wall_s": round(wall, 2),
        "rtfx": round(audio_s / wall, 1),
    }
    print(json.dumps(result))
    if jax.default_backend() == "tpu" and not args.tiny:
        out = os.path.join(os.path.dirname(__file__), "RESULTS_dynamic_eval.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

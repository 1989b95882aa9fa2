"""Same-minute A/B: moving-window decode RTFx vs window_batch_size.

52 windows cover the 20-min recording at stride 2048; wb=16 pays 4 dispatch
waves, wb=26/32 pay 2.  On a ~56 ms/dispatch tunnel the wave count is wall
time, so this sweeps the wb axis (PERFORMANCE.md only recorded 8 vs 16).

Run: python benchmarks/bench_wb_sweep.py [wb ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQ_LEN = 16384
OVERLAP = int(SEQ_LEN * 0.875)
TOTAL_FRAMES = 120_000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import FLAGSHIP
    from lcasr_tpu.models.sconformer_xl import SCConformerXL
    from lcasr_tpu.evaluation.streaming import StreamingDecoder

    model = SCConformerXL(**FLAGSHIP, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, SEQ_LEN), jnp.float32)
    )
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(1, 80, TOTAL_FRAMES)).astype(np.float32)
    n_classes = FLAGSHIP["vocab_size"] + 1

    wbs = [int(a) for a in sys.argv[1:]] or [16, 24, 32]
    results = {}
    decoders = {}
    for wb in wbs:  # compile everything first so the timed loop is warm
        decoders[wb] = StreamingDecoder(
            model, variables, n_classes, window_batch_size=wb,
            transfer_dtype="int8",
        )
        decoders[wb].greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)
    for _ in range(5):  # interleaved best-of-5: same-minute fairness
        for wb in wbs:
            t0 = time.perf_counter()
            decoders[wb].greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)
            dt = time.perf_counter() - t0
            results[wb] = min(results.get(wb, 1e9), dt)
    audio_s = TOTAL_FRAMES / 100
    out = {str(wb): {"wall_s": round(w, 3), "rtfx": round(audio_s / w, 1)}
           for wb, w in results.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

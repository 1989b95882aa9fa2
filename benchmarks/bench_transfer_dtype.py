"""Same-minute A/B: moving-window decode RTFx vs spectrogram transfer dtype.

The 20-min decode is link-bound on a tunnel-attached chip (PERFORMANCE.md);
this interleaves bf16 / int8 / int4 uploads of the same recording through
the same decoder geometry so the tunnel-bandwidth minute-to-minute swing
cancels.  int4 packs two codes per byte with per-mel-bin affine params
(WER-certified neutral in tests/test_closed_loop.py).

Run: python benchmarks/bench_transfer_dtype.py [dtype ...]
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

    dtypes = sys.argv[1:] or ["bfloat16", "int8", "int4"]
    results = {}
    decoders = {}
    for td in dtypes:  # compile everything first so the timed loop is warm
        decoders[td] = StreamingDecoder(
            model, variables, n_classes, window_batch_size=16,
            transfer_dtype=td,
        )
        decoders[td].greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)
    for _ in range(5):  # interleaved best-of-5: same-minute fairness
        for td in dtypes:
            t0 = time.perf_counter()
            decoders[td].greedy(spec, seq_len=SEQ_LEN, overlap=OVERLAP)
            dt = time.perf_counter() - t0
            results[td] = min(results.get(td, 1e9), dt)
    audio_s = TOTAL_FRAMES / 100
    out = {td: {"wall_s": round(w, 3), "rtfx": round(audio_s / w, 1)}
           for td, w in results.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

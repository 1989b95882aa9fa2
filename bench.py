"""Benchmark: streaming-decode RTFx at 20-minute context on one TPU chip.

Measures the paper's primary long-context decode configuration — the flagship
lcasr-9L-768D-6H (rotary θ=1.5M, ~120M params, BASELINE.md row 1) running the
averaged-moving-window decode (overlap ratio 0.875, reference
`eval/eval_manager.py:30`) with a 16384-frame window over a 20-minute
(120,000-frame) recording — and reports RTFx = audio-seconds transcribed per
wall-second per chip.

The reference publishes no RTFx (BASELINE.md: "not published"), so
`vs_baseline` is reported against 1× real time: vs_baseline == RTFx.

Prints ONE JSON line:
  {"metric": "rtfx_20min_decode", "value": N, "unit": "audio_s/s/chip",
   "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np


SEQ_LEN = 16384
OVERLAP_RATIO = 0.875
AUDIO_MINUTES = 20
FRAMES_PER_SECOND = 100


def _wait_for_device(max_wait_s: float = 1200.0) -> None:
    """The axon tunnel has outage windows (hours-long ones observed); rather
    than hanging forever in jax.devices() or dying instantly, probe device
    discovery in a subprocess with a bounded timeout and retry within a
    budget so a transient outage at bench time still yields a real number."""
    import subprocess
    import sys
    import time as _time

    deadline = _time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) > 0"],
                timeout=240, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if _time.time() > deadline:
                raise RuntimeError(
                    f"no JAX device after {attempt} probes / "
                    f"{max_wait_s:.0f}s — backend/tunnel down"
                )
            _time.sleep(60)


def main() -> None:
    _wait_for_device()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import FLAGSHIP
    from lcasr_tpu.models.sconformer_xl import SCConformerXL
    from lcasr_tpu.evaluation.streaming import StreamingDecoder

    model = SCConformerXL(**FLAGSHIP, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, SEQ_LEN), jnp.float32)
    )

    total_frames = AUDIO_MINUTES * 60 * FRAMES_PER_SECOND  # 120,000
    spec = rng.normal(size=(1, 80, total_frames)).astype(np.float32)
    overlap = int(SEQ_LEN * OVERLAP_RATIO)
    n_classes = FLAGSHIP["vocab_size"] + 1

    # window_batch_size=16 is the tuned config (PERFORMANCE.md: 1276 vs 1116
    # RTFx at 8) — the windows-per-dispatch sweet spot on v5e HBM.
    # transfer_dtype="int4" packs two codes per byte with per-mel-bin affine
    # params, cutting the host->device spectrogram bytes 8x vs f32 on this
    # link-bound path; WER-certified neutral by the closed-loop system test
    # (tests/test_closed_loop.py).  Same-minute interleaved A/B on the
    # tunnel (benchmarks/bench_transfer_dtype.py): 1295 RTFx (bf16) vs
    # 1449 (int8) vs 1709 (int4); int8+pipeline_upload regressed to 1200
    # (upload striping serializes with dispatches on the tunnel).
    decoder = StreamingDecoder(
        model, variables, n_classes, window_batch_size=16,
        transfer_dtype="int4",
    )

    # warmup: compile + run once end-to-end
    _ = decoder.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)

    # best-of-5: the decode is link-bound on a tunnel-attached chip and the
    # tunnel bandwidth fluctuates minute to minute (measured 698-1276 RTFx
    # for identical code); min wall time is the reproducible figure
    wall = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ids = decoder.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)
        wall = min(wall, time.perf_counter() - t0)

    audio_seconds = total_frames / FRAMES_PER_SECOND
    rtfx = audio_seconds / wall
    assert ids.ndim == 1 and ids.shape[0] >= total_frames // 8 - 8

    print(
        json.dumps(
            {
                "metric": "rtfx_20min_decode",
                "value": round(rtfx, 3),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(rtfx, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

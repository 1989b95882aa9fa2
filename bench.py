"""Benchmark: streaming-decode RTFx at 20-minute context on one TPU chip.

Measures the paper's primary long-context decode configuration — the flagship
lcasr-9L-768D-6H (rotary θ=1.5M, ~120M params, BASELINE.md row 1) running the
averaged-moving-window decode (overlap ratio 0.875, reference
`eval/eval_manager.py:30`) with a 16384-frame window over a 20-minute
(120,000-frame) recording — and reports RTFx = audio-seconds transcribed per
wall-second per chip.

The reference publishes no RTFx (BASELINE.md: "not published"), so
`vs_baseline` is reported against 1× real time: vs_baseline == RTFx.

Robustness contract (VERDICT r3 #1): this script ALWAYS prints exactly one
JSON line and exits 0 —
  success: {"metric": "rtfx_20min_decode", "value": <median>, "unit":
            "audio_s/s/chip", "vs_baseline": <median>, "n": N,
            "min": ..., "max": ...}
  failure: {"metric": "rtfx_20min_decode", "value": null, "unit":
            "audio_s/s/chip", "vs_baseline": null, "error": "..."}
The reported value is the MEDIAN of N same-session repeats (with spread),
not a best-of — a congestion-window outlier can't become the number of
record.  The persistent compile cache lives at a committed repo location
(.jax_cache/) so first-compile through a slow tunnel can't eat the driver's
budget after the cache has been warmed once.

Self-attribution companions (VERDICT r4 #2), measured in the SAME session
and carried as extra fields on the success line (best-effort — a companion
failure annotates `<name>_error` instead of killing the headline):
  bf16_rtfx        median-of-3 with transfer_dtype=bf16 — the headline no
                   longer silently leans on the int4 upload's synthetic-only
                   WER certification; the quantization speedup is visible as
                   (value / bf16_rtfx) from the artifact alone.
  device_only_rtfx median-of-3 with the (int4) upload excluded via the
                   decoder's opt-in upload memo — decode time that is device
                   compute + dispatch only.  A future regression separates
                   into link weather (value moves, device_only doesn't) vs
                   device code (both move) at a glance.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

SEQ_LEN = 16384
OVERLAP_RATIO = 0.875
AUDIO_MINUTES = 20
FRAMES_PER_SECOND = 100
METRIC = "rtfx_20min_decode"
UNIT = "audio_s/s/chip"
N_REPEATS = 5


def _fail(msg: str) -> None:
    print(json.dumps({"metric": METRIC, "value": None, "unit": UNIT,
                      "vs_baseline": None, "error": msg}))


def _wait_for_device(max_wait_s: float = 180.0) -> None:
    """The axon tunnel has outage windows; probe device discovery in a
    subprocess with a bounded timeout.  Budget is deliberately small
    (VERDICT r3: a 1200 s wait alone could eat the driver's bench budget) —
    if the tunnel is down, fail FAST with a JSON error line rather than
    producing an empty round."""
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
                timeout=90, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if _time.time() > deadline:
                raise RuntimeError(
                    f"no JAX device after {attempt} probes / "
                    f"{max_wait_s:.0f}s — backend/tunnel down"
                )
            _time.sleep(20)


def _run() -> dict:
    _wait_for_device()
    import jax
    import jax.numpy as jnp

    # Committed, repo-local persistent compile cache: the driver's bench run
    # hits programs this session already compiled, so a bad tunnel window
    # costs seconds of cache deserialization instead of minutes of XLA.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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

    # window_batch_size=16 is the tuned config (PERFORMANCE.md sweep);
    # transfer_dtype="int4" packs two codes per byte with per-mel-bin affine
    # params, cutting host->device spectrogram bytes 8x vs f32 on this
    # link-bound path; WER-certified neutral by the closed-loop system test
    # (tests/test_closed_loop.py).
    decoder = StreamingDecoder(
        model, variables, n_classes, window_batch_size=16,
        transfer_dtype="int4",
    )

    # warmup: compile + run once end-to-end
    ids = decoder.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)
    assert ids.ndim == 1 and ids.shape[0] >= total_frames // 8 - 8

    # median-of-N with spread: the decode is link-bound on a tunnel-attached
    # chip and bandwidth fluctuates minute to minute (measured 698-1276 RTFx
    # for identical code) — the median is the honest single number, min/max
    # the weather report.
    audio_seconds = total_frames / FRAMES_PER_SECOND
    rtfs = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        decoder.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)
        rtfs.append(audio_seconds / (time.perf_counter() - t0))

    med = float(np.median(rtfs))
    result = {
        "metric": METRIC,
        "value": round(med, 3),
        "unit": UNIT,
        "vs_baseline": round(med, 3),
        "n": len(rtfs),
        "min": round(min(rtfs), 3),
        "max": round(max(rtfs), 3),
    }

    def _companion(name, make_decoder):
        """Same-session median-of-3 for one decoder variant; best-effort."""
        try:
            dec = make_decoder()
            dec.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                dec.greedy(spec, seq_len=SEQ_LEN, overlap=overlap)
                ts.append(audio_seconds / (time.perf_counter() - t0))
            result[name] = round(float(np.median(ts)), 3)
        except BaseException as exc:  # noqa: BLE001 — keep the headline alive
            result[f"{name}_error"] = f"{type(exc).__name__}: {exc}"

    # bf16 upload (no quantization anywhere in the path)
    _companion("bf16_rtfx", lambda: StreamingDecoder(
        model, variables, n_classes, window_batch_size=16,
        transfer_dtype=jnp.bfloat16,
    ))
    # headline config with the upload memoized away after warmup
    _companion("device_only_rtfx", lambda: StreamingDecoder(
        model, variables, n_classes, window_batch_size=16,
        transfer_dtype="int4", cache_upload=True,
    ))
    return result


def main() -> None:
    try:
        print(json.dumps(_run()))
    except BaseException as exc:  # noqa: BLE001 — the contract is one JSON line, always
        _fail(f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()

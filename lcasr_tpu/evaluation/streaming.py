"""Long-context streaming inference: averaged-moving-window and buffered modes.

TPU ports of the reference decode loops:
  * `fetch_logits` — overlapping windows, per-frame posterior-probability
    averaging at overlapped positions (reference `lcasr/eval/utils.py:46-110`,
    the paper's decode; paper overlap ratio 0.875),
  * `fetch_logits_buffered` — NeMo-style buffered transcription keeping only
    each chunk's central region (reference
    `lcasr/eval/buffered_transcription.py:11-97`),
  * windowed-attention mode is not a loop: the model is built with
    `attention_window_size` set and the whole recording is one forward
    (reference `eval/run.py:38-43`).

TPU-first behavior: every window is padded up to `seq_len` so ONE compiled
(B=1, 80, seq_len) program serves the whole decode — the ragged final window
is handled with a length argument instead of a shape change (XLA static
shapes; the reference instead ran a smaller last chunk and killed the loop,
`utils.py:70-81`).  Accumulation happens in fp32 numpy on host; the device
only sees fixed-shape forwards.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def fetch_logits(
    model_fn: Callable,
    spec: np.ndarray,  # (1, 80, T)
    seq_len: int,
    overlap: int,
    n_classes: int,
    subsampling_factor: int = 8,
    use_tqdm: bool = False,
) -> np.ndarray:
    """Averaged moving window decode → (T', n_classes) log-probs.

    model_fn(chunk (1, 80, seq_len), length (1,)) → (log_probs (1, N, C),
    out_length (1,)); must be a fixed-shape jitted callable.
    """
    spec_n = spec.shape[-1]
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    assert overlap % subsampling_factor == 0, (
        "Overlap must be a multiple of the downsampling factor"
    )
    assert seq_len > overlap

    positions = list(range(0, spec_n, seq_len - overlap))
    it = positions
    if use_tqdm:
        from tqdm import tqdm

        it = tqdm(positions)

    all_logits = np.zeros((spec_n // subsampling_factor + seq_len, n_classes), np.float64)
    logit_count = np.zeros_like(all_logits)

    logit_position = 0
    last_ulen, kill_next = None, False
    for i in it:
        audio_chunk = spec[:, :, i : i + seq_len]
        u_len = audio_chunk.shape[-1]
        if kill_next:
            break
        if last_ulen is not None and u_len < last_ulen:
            kill_next = True
        last_ulen = u_len

        # pad to the compiled window size, track true length
        if u_len < seq_len:
            audio_chunk = np.pad(audio_chunk, ((0, 0), (0, 0), (0, seq_len - u_len)))
        log_probs, out_len = model_fn(audio_chunk, np.array([u_len], np.int32))
        n_valid = int(np.asarray(out_len)[0])
        probs = np.exp(np.asarray(log_probs, dtype=np.float64))[0, :n_valid]

        ratio = u_len / n_valid
        overlap_ds = int(overlap / ratio)
        if i != 0:
            logit_position -= overlap_ds
        all_logits[logit_position : logit_position + n_valid] += probs
        logit_count[logit_position : logit_position + n_valid] += 1
        logit_position += n_valid

    seen = logit_count[:, 0] != 0
    avg = all_logits[seen] / logit_count[seen]
    return np.log(avg).astype(np.float32)


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

    ds = subsampling_factor
    out_frames_total = None
    outputs = []
    written = 0

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
        # central region in downsampled coordinates
        rel_start = start - ctx_start
        center_lo = int(rel_start / ratio)
        center_hi = int(min(rel_start + chunk_size, u_len) / ratio)
        outputs.append(lp[center_lo:center_hi])
        written += center_hi - center_lo
        if start + chunk_size >= spec_n:
            break

    return np.concatenate(outputs, axis=0)


def make_windowed_model_fn(model, variables) -> Callable:
    """Build the fixed-shape jitted forward used by both loops.

    `variables` is passed as a jit ARGUMENT (not a closure constant) so the
    weights live on device as buffers instead of being baked into the HLO —
    closure constants would bloat the program by the full parameter size.
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

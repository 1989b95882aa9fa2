"""Audio frontend: jittable log-free mel spectrogram + frame/time conversions.

Parameter-compatible with the reference frontend (reference
`lcasr/utils/audio_tools.py:14-72`): 16 kHz audio, win 400 / hop 160
(→ 100 frames/s), n_fft 512, 80 mels, power-2 magnitude, NO log compression,
and per-recording global mean/std normalization over time for each mel bin.

The reference computes this with torchaudio's MelSpectrogram (Hann window,
center=True reflect padding, HTK mel scale, no filterbank norm, unbiased std
in the normalizer).  Here the whole chain is a pure-jnp function so it can run
on-device inside jit as part of a fused input pipeline, with a NumPy path for
offline CPU preprocessing.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

WIN_LENGTH = 400
HOP_LENGTH = 160
N_FFT = 512
N_MELS = 80
SR = 16000


def total_seconds(spectogram_length: int) -> float:
    """Frames → seconds (reference `audio_tools.py:59-61`)."""
    return (spectogram_length * HOP_LENGTH) / SR


def total_frames(seconds: float) -> int:
    """Seconds → frames (reference `audio_tools.py:63-65`)."""
    return int((seconds * SR) / HOP_LENGTH)


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_freqs: int = N_FFT // 2 + 1,
    f_min: float = 0.0,
    f_max: float = SR / 2,
    n_mels: int = N_MELS,
    sample_rate: int = SR,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, shape (n_freqs, n_mels), no norm."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(np.array(f_min)), _hz_to_mel_htk(np.array(f_max)), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _hann_window(win_length: int = WIN_LENGTH, n_fft: int = N_FFT) -> np.ndarray:
    """Periodic Hann window of win_length, zero-padded (centered) to n_fft."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left : left + win_length] = w
    return out


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) → (..., n_frames, frame_length) via gather of static indices."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    # int32 index: the int64 default doubles a ~3 GB transient for 2 h audio
    idx = (
        np.arange(frame_length, dtype=np.int32)[None, :]
        + (hop * np.arange(n_frames, dtype=np.int32))[:, None]
    )
    return x[..., idx]


def spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = N_FFT,
    win_length: int = WIN_LENGTH,
    hop_length: int = HOP_LENGTH,
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2 with center=True reflect padding.

    waveform: (..., T) → (..., n_freqs, n_frames)
    """
    pad = n_fft // 2
    x = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * jnp.asarray(_hann_window(win_length, n_fft))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    return jnp.swapaxes(power, -1, -2)  # (..., n_freqs, n_frames)


def mel_spectrogram(
    waveform: jnp.ndarray,
    global_normalisation: bool = True,
) -> jnp.ndarray:
    """Mel spectrogram matching reference `to_spectogram` (`audio_tools.py:44-57`).

    waveform: (channels, T) or (T,) → (channels, n_mels, n_frames)
    Per-recording normalization uses the unbiased std (ddof=1) over time, as
    torch's `Tensor.std` does.
    """
    if waveform.ndim == 1:
        waveform = waveform[None]
    power = spectrogram(waveform)  # (C, n_freqs, n_frames)
    fb = jnp.asarray(mel_filterbank())
    mel = jnp.einsum("cft,fm->cmt", power, fb)
    if global_normalisation:
        mean = mel.mean(-1, keepdims=True)
        n = mel.shape[-1]
        var = ((mel - mean) ** 2).sum(-1, keepdims=True) / jnp.maximum(n - 1, 1)
        mel = (mel - mean) / jnp.sqrt(var)
    return mel


def resample(waveform: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling (CPU, scipy) for file ingest."""
    if orig_sr == new_sr:
        return waveform
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, new_sr)
    return resample_poly(waveform, new_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Load an audio file to (channels, T) float32. WAV via scipy; other
    formats require an external decoder and raise a clear error."""
    if path.lower().endswith(".wav"):
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype.kind == "i":
            # torchaudio divides by 2^(bits-1) (32768 for int16), not max
            data = data.astype(np.float32) / float(np.iinfo(data.dtype).max + 1)
        elif data.dtype.kind == "u":
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 1:
            data = data[None]
        else:
            data = data.T
        return data, sr
    if path.lower().endswith(".npy"):
        # the preprocessing contract stores 16 kHz waveforms in .npy — there
        # is no header to consult, so SR is asserted, not detected
        arr = np.load(path)
        return (arr if arr.ndim == 2 else arr[None]).astype(np.float32), SR
    raise ValueError(
        f"Unsupported audio format for {path!r}: only .wav/.npy decode is "
        "available in this environment (no ffmpeg/soundfile)."
    )


def grab_left_channel(waveform: np.ndarray) -> np.ndarray:
    """Reference `audio_tools.py:28-34` semantics."""
    if waveform.ndim == 2:
        return waveform[0:1]
    if waveform.ndim == 1:
        return waveform[None]
    raise ValueError("Waveform must be 1D or 2D")


def processing_chain(path_in: str, normalise: bool = True) -> jnp.ndarray:
    """File → normalized mel spectrogram (1, 80, T).

    Mirror of reference `audio_tools.py:67-72`: load → left channel →
    resample to 16 kHz → mel spectrogram with global normalization.
    """
    waveform, sr = load_audio(path_in)
    waveform = grab_left_channel(waveform)
    waveform = resample(waveform, sr, SR)
    return mel_spectrogram(jnp.asarray(waveform), global_normalisation=normalise)

import numpy as np
import pytest

from lcasr_tpu.data import audio


def test_frame_count_100fps():
    # 1 second at 16 kHz -> 101 frames (center=True STFT convention)
    wav = np.random.default_rng(0).normal(size=(1, 16000)).astype(np.float32)
    spec = audio.mel_spectrogram(wav)
    assert spec.shape == (1, 80, 101)


def test_time_frame_conversions():
    assert audio.total_frames(10.0) == 1000
    assert abs(audio.total_seconds(1000) - 10.0) < 1e-9
    assert audio.total_frames(audio.total_seconds(123456)) == 123456


def test_global_normalization_stats():
    wav = np.random.default_rng(1).normal(size=(1, 32000)).astype(np.float32)
    spec = np.asarray(audio.mel_spectrogram(wav, global_normalisation=True))
    # per-bin over time: zero mean, unit (unbiased) std
    np.testing.assert_allclose(spec.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(spec.std(-1, ddof=1), 1.0, atol=1e-3)


def test_mel_filterbank_matches_expected_shape_and_coverage():
    fb = audio.mel_filterbank()
    assert fb.shape == (257, 80)
    # every filter has nonzero mass; filters tile the spectrum
    assert (fb.sum(0) > 0).all()
    assert fb.min() >= 0.0


def test_spectrogram_against_numpy_stft_oracle():
    """Cross-check the framed-rfft path against an explicit per-frame loop."""
    rng = np.random.default_rng(2)
    wav = rng.normal(size=3210).astype(np.float32)
    ours = np.asarray(audio.spectrogram(wav[None]))[0]  # (257, T)

    pad = audio.N_FFT // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    win = np.asarray(audio._hann_window())
    n_frames = 1 + (len(x) - audio.N_FFT) // audio.HOP_LENGTH
    expected = np.zeros((audio.N_FFT // 2 + 1, n_frames))
    for t in range(n_frames):
        seg = x[t * audio.HOP_LENGTH : t * audio.HOP_LENGTH + audio.N_FFT] * win
        expected[:, t] = np.abs(np.fft.rfft(seg)) ** 2
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-3)


def test_mel_against_torch_oracle():
    """Numerics vs a torch STFT+mel oracle built from the same definition
    torchaudio uses (hann periodic window, center reflect, HTK mels, no norm).
    """
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    wav = rng.normal(size=16000).astype(np.float32)

    ours = np.asarray(audio.mel_spectrogram(wav[None], global_normalisation=False))[0]

    t_wav = torch.from_numpy(wav)
    window = torch.hann_window(audio.WIN_LENGTH, periodic=True)
    stft = torch.stft(
        t_wav,
        n_fft=audio.N_FFT,
        hop_length=audio.HOP_LENGTH,
        win_length=audio.WIN_LENGTH,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    power = stft.abs() ** 2  # (257, T)
    fb = torch.from_numpy(np.asarray(audio.mel_filterbank()))
    mel = torch.einsum("ft,fm->mt", power, fb).numpy()
    # f32 FFT accumulation-order differences between XLA-CPU and torch leave
    # ~0.6% relative error; the strict check is the f64 numpy oracle above.
    np.testing.assert_allclose(ours, mel, rtol=1e-2, atol=1e-2)

"""LongConv (safari) op tests: fft linear conv, squash, and the reference's
kernel-smoothing variants (`/root/reference/lcasr/components/long_conv.py:
221-279`) checked against torch oracles for the exact AvgPool1d /
complex-conv1d semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.long_conv import (
    ConformerLongConvolution,
    LongConv,
    double_exp_init,
    fft_conv,
    freq_smooth_kernel,
    ma_smooth_kernel,
    squash_kernel,
)


def test_fft_conv_matches_direct_causal_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    out = fft_conv(x, k)
    # direct causal convolution oracle
    ref = np.zeros((2, 64, 4), np.float32)
    xn, kn = np.asarray(x), np.asarray(k)
    for t in range(64):
        for j in range(16):
            if t - j >= 0:
                ref[:, t, :] += xn[:, t - j, :] * kn[:, j]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_ma_smoothing_matches_torch_avgpool():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    k = rng.normal(size=(6, 33)).astype(np.float32)
    ours = np.asarray(ma_smooth_kernel(jnp.asarray(k), 7))
    # reference long_conv.py:247-251: AvgPool1d(kernel_size=7, stride=1, padding=3)
    pool = torch.nn.AvgPool1d(kernel_size=7, stride=1, padding=3)
    ref = pool(torch.from_numpy(k)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_freq_smoothing_matches_torch_conv1d_on_spectrum():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    H, L, W = 4, 32, 7
    k = rng.normal(size=(H, L)).astype(np.float32)
    ours = np.asarray(freq_smooth_kernel(jnp.asarray(k), W))
    # reference long_conv.py:241-246,271-275
    kt = torch.from_numpy(k)
    weight = torch.arange(W, dtype=kt.dtype)
    weight = torch.exp(-0.5 * torch.abs(weight - W // 2) ** 2)
    kf = torch.fft.rfft(kt, dim=-1)
    weight = weight[None, None, :].repeat(H, 1, 1).type(kf.dtype)
    sm = torch.nn.functional.conv1d(kf, weight, padding="same", groups=H)
    ref = torch.fft.irfft(sm, n=L, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_double_exp_init_envelope():
    k = double_exp_init(0.02)(jax.random.PRNGKey(0), (8, 64))
    k = np.abs(np.asarray(k))
    # the double-exponential envelope decays along the kernel length
    assert k[:, :8].mean() > 3 * k[:, -8:].mean()


@pytest.mark.parametrize("smooth_freq", [False, True])
def test_longconv_module_with_smoothing_runs_and_differs(smooth_freq):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 48, 8)).astype(np.float32))
    plain = LongConv(8, l_max=32)
    smoothed = LongConv(8, l_max=32, use_ma_smoothing=True, smooth_freq=smooth_freq)
    v = plain.init(jax.random.PRNGKey(0), x)
    out_plain = plain.apply(v, x)
    out_sm = smoothed.apply(v, x)  # same params, smoothing changes the kernel
    assert out_plain.shape == out_sm.shape == (1, 48, 8)
    assert np.isfinite(np.asarray(out_sm)).all()
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_sm))


def test_conformer_longconv_block_with_smoothing():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    mod = ConformerLongConvolution(
        d_model=16, l_max=16, norm_type="layer_norm",
        use_ma_smoothing=True, weight_init="double_exp",
    )
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out)).all()

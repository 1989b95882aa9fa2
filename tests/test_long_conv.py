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
    k = double_exp_init(0.02)(jax.random.PRNGKey(0), (1, 8, 64))
    k = np.abs(np.asarray(k))
    # the double-exponential envelope decays along the kernel length
    assert k[..., :8].mean() > 3 * k[..., -8:].mean()


@pytest.mark.parametrize("smooth_freq", [False, True])
def test_longconv_module_with_smoothing_runs_and_differs(smooth_freq):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 48, 8)).astype(np.float32))
    plain = LongConv(8, l_max=32, position_kernel=False)
    smoothed = LongConv(8, l_max=32, position_kernel=False,
                        use_ma_smoothing=True, smooth_freq=smooth_freq)
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
        d_model=16, l_max=16, norm_type="layer_norm", position_kernel=False,
        use_ma_smoothing=True, weight_init="double_exp",
    )
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# torch-oracle parity for the full reference LongConv module
# (`/root/reference/lcasr/components/long_conv.py:464-603`)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_long_conv():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import (
        install_reference_package_stubs,
        load_reference_module,
        reference_available,
    )

    if not reference_available():
        pytest.skip("reference checkout not present")
    install_reference_package_stubs()
    mod = load_reference_module("lcasr/components/long_conv.py", "ref_long_conv")
    return mod, torch


def _copy_params_to_flax(ref, torch, position_kernel: bool):
    """Map the torch module's parameters into our flax variable tree."""
    t = {n: p.detach().numpy() for n, p in ref.named_parameters()}
    params = {
        "D": jnp.asarray(t["D"]),
        "output_linear": {
            "kernel": jnp.asarray(t["output_linear.0.weight"].T),
            "bias": jnp.asarray(t["output_linear.0.bias"]),
        },
    }
    if position_kernel:
        params["kernel"] = {
            "base_rates": jnp.asarray(t["kernel.base_rates"]),
            "mlp_in": {
                "kernel": jnp.asarray(t["kernel.kernel.0.weight"].T),
                "bias": jnp.asarray(t["kernel.kernel.0.bias"]),
            },
            "mlp_out": {
                "kernel": jnp.asarray(t["kernel.kernel.2.weight"].T),
                "bias": jnp.asarray(t["kernel.kernel.2.bias"]),
            },
        }
    else:
        params["kernel"] = jnp.asarray(t["kernel.kernel"])
    return {"params": params}


@pytest.mark.parametrize("position_kernel", [True, False])
@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("L", [24, 48])  # 24 < l_max exercises the rfft crop
def test_longconv_matches_reference_module(ref_long_conv, position_kernel,
                                           bidirectional, L):
    mod, torch = ref_long_conv
    H, l_max = 8, 32
    torch.manual_seed(0)
    ref = mod.LongConv(
        d_model=H, l_max=l_max, bidirectional=bidirectional,
        transposed=False, position_kernel=position_kernel,
        weight_init="random",
    ).eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, L, H)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = LongConv(H, l_max=l_max, bidirectional=bidirectional,
                    position_kernel=position_kernel)
    variables = _copy_params_to_flax(ref, torch, position_kernel)
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_longconv_matches_reference_module_masked(ref_long_conv):
    """Suffix padding zeroed via lengths (reference) == pad_mask (ours)."""
    mod, torch = ref_long_conv
    H, l_max, L = 8, 16, 40
    torch.manual_seed(1)
    ref = mod.LongConv(d_model=H, l_max=l_max, bidirectional=True,
                       transposed=False, position_kernel=True).eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, L, H)).astype(np.float32)
    lengths = np.array([40, 23])
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   lengths=torch.from_numpy(lengths)).numpy()

    ours = LongConv(H, l_max=l_max, bidirectional=True, position_kernel=True)
    variables = _copy_params_to_flax(ref, torch, True)
    pad_mask = jnp.asarray(np.arange(L)[None, :] >= lengths[:, None])
    got = np.asarray(ours.apply(variables, jnp.asarray(x), pad_mask=pad_mask))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)

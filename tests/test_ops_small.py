"""Direct oracle tests for the small ops (norms, feed-forward, swiglu) —
previously covered only transitively through whole-model parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lcasr_tpu.ops.mlp import ConformerFeedForward, SwiGLU  # noqa: E402
from lcasr_tpu.ops.norms import LayerNorm, RMSNorm, get_norm  # noqa: E402


def test_layernorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 17, 32)).astype(np.float32)
    ln = LayerNorm(32)
    v = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    v = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = np.asarray(ln.apply(v, jnp.asarray(x)))

    t = torch.nn.LayerNorm(32, eps=1e-5)
    with torch.no_grad():
        t.weight.copy_(torch.tensor(scale))
        t.bias.copy_(torch.tensor(bias))
    ref = t(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_rmsnorm_matches_apex_semantics():
    """x·rsqrt(mean(x²)+eps)·scale with eps=1e-6 — the apex FusedRMSNorm
    formulation the reference's checkpoints trained with
    (`normalisation.py:6-47`)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 9, 24)).astype(np.float32)
    scale = rng.normal(size=(24,)).astype(np.float32)
    rn = RMSNorm(24)
    v = {"params": {"scale": jnp.asarray(scale)}}
    out = np.asarray(rn.apply(v, jnp.asarray(x)))

    xt = torch.tensor(x)
    ms = (xt * xt).mean(-1, keepdim=True)
    ref = (xt * torch.rsqrt(ms + 1e-6) * torch.tensor(scale)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-5)


def test_norms_fp32_stats_under_bf16():
    """bf16 inputs: statistics are computed in fp32 (the whole point of the
    fp32-stat design), so outputs match the fp32 path to bf16 resolution."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 8, 16)).astype(np.float32)
    for cls in (LayerNorm, RMSNorm):
        m = cls(16)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        full = np.asarray(m.apply(v, jnp.asarray(x)))
        half = np.asarray(
            m.apply(v, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32)
        )
        np.testing.assert_allclose(half, full, atol=2e-2, rtol=2e-2)
        assert m.apply(v, jnp.asarray(x, jnp.bfloat16)).dtype == jnp.bfloat16


def test_get_norm_factory():
    assert get_norm("rms_norm") is RMSNorm
    assert get_norm("layer_norm") is LayerNorm
    with pytest.raises(ValueError):
        get_norm("batch_norm")


def test_feedforward_matches_torch_tanh_gelu():
    """linear → tanh-GELU → linear == the reference FusedMLP math
    (`fused_dense.py:209-498` uses the tanh approximation)."""
    rng = np.random.default_rng(3)
    D, H = 16, 32
    x = rng.normal(size=(2, 5, D)).astype(np.float32)
    mlp = ConformerFeedForward(D, hidden_dim=H)
    v = mlp.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w1 = np.asarray(v["params"]["fc1"]["kernel"])
    w2 = np.asarray(v["params"]["fc2"]["kernel"])
    out = np.asarray(mlp.apply(v, jnp.asarray(x)))

    h = torch.tensor(x) @ torch.tensor(w1)
    h = torch.nn.functional.gelu(h, approximate="tanh")
    ref = (h @ torch.tensor(w2)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_swiglu_matches_manual():
    """silu(gate)·up through the fused in_proj split (reference
    `feedforward.py:3-27`)."""
    rng = np.random.default_rng(4)
    D = 12
    x = rng.normal(size=(3, 7, D)).astype(np.float32)
    m = SwiGLU(D, expansion_factor=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    win = np.asarray(v["params"]["in_proj"]["kernel"])
    wout = np.asarray(v["params"]["out_proj"]["kernel"])
    out = np.asarray(m.apply(v, jnp.asarray(x)))

    gu = torch.tensor(x) @ torch.tensor(win)
    gate, up = gu.chunk(2, dim=-1)
    ref = ((torch.nn.functional.silu(gate) * up) @ torch.tensor(wout)).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_causal_subsampling_lengths_match_output_frames():
    """Causal stages pad (k-1, s-1) on both dims like the reference
    CausalConv2D (causal_convs.py:48-49): the conv output frame count must
    equal calc_length's report for a full-length input."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.conv import ConvSubsampling

    for mode in ("dw_striding", "striding"):
        sub = ConvSubsampling(
            subsampling="dw_striding" if mode == "dw_striding" else "striding",
            subsampling_factor=8, feat_in=80, feat_out=64, conv_channels=32,
            is_causal=True, use_pallas=False,
        )
        x = jnp.zeros((1, 16, 80))
        lengths = jnp.array([16])
        variables = sub.init(jax.random.PRNGKey(0), x, lengths)
        h, out_len = sub.apply(variables, x, lengths)
        assert h.shape[1] == int(out_len[0]), (mode, h.shape, out_len)


def test_time_reduction_odd_length_keeps_ceil_frames():
    """Reference TimeReductionModule pads symmetrically then truncates to
    ceil(T/stride) (subsampling.py:590-620); odd T must not lose a frame."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.conv import TimeReductionModule

    m = TimeReductionModule(d_model=16, out_dim=16)
    x = jnp.zeros((2, 17, 16))
    lengths = jnp.array([17, 13])
    variables = m.init(jax.random.PRNGKey(0), x, lengths)
    h, out_len = m.apply(variables, x, lengths)
    assert h.shape[1] == 9  # ceil(17/2)
    assert out_len.tolist() == [9, 7]  # ceil per sample


def test_batch_norm_running_var_matches_torch():
    """torch BatchNorm1d accumulates the UNBIASED batch variance into
    running_var; exact parity on a small batch where the n/(n-1) factor is
    visible."""
    import jax
    import jax.numpy as jnp
    import torch

    from lcasr_tpu.ops.conv import BatchNorm

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)  # (B, T, C), n=6

    bn = BatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])

    t = torch.nn.BatchNorm1d(4)
    t.train()
    yt = t(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)

    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_var"]),
        t.running_var.detach().numpy(), rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conv1d_subsampling_norm_trains():
    """Conv1DSubsampling threads train= into its BatchRenorm (was pinned in
    eval mode forever)."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.conv import Conv1DSubsampling

    m = Conv1DSubsampling(subsampling_factor=4, feat_in=16, feat_out=16,
                          conv_channels=8, batch_norm=True)
    x = jnp.ones((1, 32, 16))
    lengths = jnp.array([32])
    variables = m.init(jax.random.PRNGKey(0), x, lengths, train=True)
    _, mutated = m.apply(variables, x, lengths, train=True,
                         mutable=["batch_stats"])
    tracked = jax.tree.leaves({
        k: v for k, v in mutated["batch_stats"].items()
    })
    flat = jax.tree_util.tree_flatten_with_path(mutated["batch_stats"])[0]
    n_tracked = [v for p, v in flat if "num_batches_tracked" in str(p)]
    assert n_tracked and all(int(v) == 1 for v in n_tracked)


def test_striding_init_uses_effective_torch_bounds():
    """Reference reset_parameters is dead upstream: striding stages >= 1
    carry torch's default 1/sqrt(9C) bound, not 1/3."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.conv import ConvSubsampling

    C = 32
    sub = ConvSubsampling(subsampling="striding", subsampling_factor=8,
                          feat_in=80, feat_out=64, conv_channels=C,
                          use_pallas=False)
    variables = sub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)),
                         jnp.array([16]))
    k1 = np.asarray(variables["params"]["conv_1"]["kernel"])
    bound = (9 * C) ** -0.5
    assert np.abs(k1).max() <= bound + 1e-7
    assert np.abs(k1).max() > 0.5 * bound  # actually near the bound
    k0 = np.asarray(variables["params"]["conv_0"]["kernel"])
    assert np.abs(k0).max() <= 1 / 3 + 1e-7


def test_stacking_norm_and_norm_out_both_apply():
    """Reference builds pre_norm from `norm` alone (subsampling.py:61-68);
    norm=True + norm_out=True applies BOTH."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.conv import StackingSubsampling

    m = StackingSubsampling(subsampling_factor=4, feat_in=16, feat_out=16,
                            norm=True, norm_out=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                       jnp.array([8]))
    assert "pre_norm" in variables["params"]
    assert "norm_out" in variables["params"]

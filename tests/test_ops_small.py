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

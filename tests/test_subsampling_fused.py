"""Fused Pallas dw-striding subsampling vs the lax conv chain.

The kernel (ops/subsampling_pallas.py) runs here in Pallas interpret mode
(CPU); on-chip parity + timing is benchmarks/bench_subsampling.py.
Reference semantics: `lcasr/components/subsampling.py:219-286`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.subsampling_pallas import (
    dw_striding_chain_lax,
    fused_dw_striding,
)


def _params(rng, C, dtype=jnp.float32):
    p = [jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, dtype),
         jnp.asarray(rng.normal(size=(C,)) * 0.2, dtype)]
    for _ in range(2):
        p += [jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, dtype),
              jnp.asarray(rng.normal(size=(C,)) * 0.2, dtype),
              jnp.asarray(rng.normal(size=(1, 1, C, C)) * 0.06, dtype),
              jnp.asarray(rng.normal(size=(C,)) * 0.2, dtype)]
    return tuple(p)


@pytest.mark.parametrize(
    "B,T,F,act",
    [
        (2, 256, 80, "silu"),     # one tile exactly (To=32 -> 256 frames)
        (1, 512, 80, "gelu"),     # two tiles
        (2, 328, 80, "relu"),     # T8=41: tile-padding tail exercised
        (1, 256, 64, "silu"),     # F=64 (F8=8)
    ],
)
def test_fused_matches_lax_chain(B, T, F, act):
    rng = np.random.default_rng(hash((B, T, F)) % 2**31)
    C = 128  # C % 128 == 0 keeps lanes aligned; 256 covered on-chip
    x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    params = _params(rng, C)
    ref = dw_striding_chain_lax(x[..., None], params, act)
    got = fused_dw_striding(x, params, act, True)  # interpret=True
    assert got.shape == ref.shape == (B, T // 8, F // 8, C)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fused_gradients_match_lax_chain():
    """The custom_vjp backward recomputes through the lax chain — gradients
    for x and every conv param equal the chain's autodiff gradients."""
    rng = np.random.default_rng(3)
    B, T, F, C = 1, 256, 80, 128
    x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    params = _params(rng, C)
    co = jnp.asarray(rng.normal(size=(B, T // 8, F // 8, C)), jnp.float32)

    def loss_lax(x, params):
        return (dw_striding_chain_lax(x[..., None], params, "silu") * co).sum()

    def loss_fused(x, params):
        return (fused_dw_striding(x, params, "silu", True) * co).sum()

    gx_ref, gp_ref = jax.grad(loss_lax, argnums=(0, 1))(x, params)
    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
    for a, b in zip(gp, gp_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_module_lax_path_unchanged_by_refactor():
    """ConvSubsampling's dw_striding branch now routes through the pure
    lax chain (shared with the kernel's backward) — same params tree
    (nn.Conv layout) and same outputs as before the refactor; the existing
    torch-parity suite pins the absolute reference."""
    from lcasr_tpu.ops.conv import ConvSubsampling

    rng = np.random.default_rng(5)
    m = ConvSubsampling(feat_in=80, feat_out=64, conv_channels=32,
                        use_pallas=False)
    x = jnp.asarray(rng.normal(size=(2, 200, 80)), jnp.float32)
    lengths = jnp.array([200, 150], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, lengths)
    p = v["params"]
    assert set(p) == {"conv_in", "dw_conv_0", "dw_conv_1",
                      "pw_conv_0", "pw_conv_1", "out"}
    assert p["conv_in"]["kernel"].shape == (3, 3, 1, 32)
    assert p["pw_conv_0"]["kernel"].shape == (1, 1, 32, 32)
    out, new_len = m.apply(v, x, lengths)
    assert out.shape == (2, 25, 64)
    assert np.asarray(new_len).tolist() == [25, 19]
    assert np.isfinite(np.asarray(out)).all()

"""Chunked-scan dw_striding chain (the long-context conv-backward memory
fix): outputs and gradients must EXACTLY match the plain padded chain —
chunking is pure execution scheduling (VALID-conv arithmetic + boundary
masks reproduce the padded chain's literal zeros).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lcasr_tpu.ops import subsampling_pallas as sp


def _params(rng, C):
    params = [jnp.asarray(rng.normal(size=(3, 3, 1, C)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(C,)).astype(np.float32))]
    for _ in range(2):
        params += [
            jnp.asarray(rng.normal(size=(3, 3, 1, C)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 1, C, C)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
        ]
    return tuple(params)


@pytest.mark.parametrize("T,chunk_out", [
    (4096, 128),    # divides evenly: 512 rows = 4 chunks of 128
    (4104, 128),    # S2=513: ragged tail chunk exercises the crop+mask
    (4096, 512),    # single chunk == whole sequence
])
def test_chunked_chain_matches_plain(T, chunk_out):
    rng = np.random.default_rng(0)
    C, F, B = 8, 80, 2
    params = _params(rng, C)
    h = jnp.asarray(rng.normal(size=(B, T, F, 1)).astype(np.float32))

    plain = sp.dw_striding_chain_lax(h, params, "silu")
    chunked = sp._dw_striding_chain_chunked(
        h, params, "silu", (1, 1), chunk_out=chunk_out)
    assert chunked.shape == plain.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


def test_chunked_chain_gradients_match_plain():
    rng = np.random.default_rng(1)
    C, F, B, T = 8, 40, 1, 2048
    params = _params(rng, C)
    h = jnp.asarray(rng.normal(size=(B, T, F, 1)).astype(np.float32))

    def loss_plain(params, h):
        return (sp.dw_striding_chain_lax(h, params, "silu") ** 2).sum()

    def loss_chunked(params, h):
        return (sp._dw_striding_chain_chunked(
            h, params, "silu", (1, 1), chunk_out=64) ** 2).sum()

    gp = jax.grad(loss_plain, argnums=(0, 1))(params, h)
    gc = jax.grad(loss_chunked, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gc)):
        # per-chunk partial sums reassociate the fp32 reductions —
        # elementwise rtol trips on near-zero boundary elements, so gate
        # on relative L2 distance (a wrong mask/offset produces O(1) here)
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
        assert rel < 1e-5, rel


def test_auto_threshold_routes_long_inputs(monkeypatch):
    """Above _CHUNK_THRESHOLD_T the public chain transparently uses the
    chunked path; the result must equal the plain chain bit-for-bit."""
    rng = np.random.default_rng(2)
    C, F, B, T = 8, 80, 1, 4096
    params = _params(rng, C)
    h = jnp.asarray(rng.normal(size=(B, T, F, 1)).astype(np.float32))

    plain = sp.dw_striding_chain_lax(h, params, "silu")  # T < threshold
    monkeypatch.setattr(sp, "_CHUNK_THRESHOLD_T", 1024)
    routed = sp.dw_striding_chain_lax(h, params, "silu")
    np.testing.assert_allclose(np.asarray(routed), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)

    # paths that the chunked formulation does not cover must keep working
    # (causal t_pad falls back to the plain chain)
    causal = sp.dw_striding_chain_lax(h, params, "silu", t_pad=(2, 0))
    assert causal.shape[1] == plain.shape[1]

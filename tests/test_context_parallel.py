"""Context-parallel attention vs the single-device oracle on the virtual
8-device CPU mesh.  Requires CPU platform (./run_tests.sh cpu) — skipped on
single-device backends."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.attention import reference_attention


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via ./run_tests.sh cpu)")
    from lcasr_tpu.parallel.mesh import make_mesh

    return make_mesh({"data": 1, "model": 1, "seq": 8})


@pytest.mark.parametrize("window", [(-1, -1), (64, 64)])
def test_cp_attention_matches_oracle(mesh8, window):
    from lcasr_tpu.parallel.context_parallel import context_parallel_attention

    rng = np.random.default_rng(0)
    B, T, H, D = 1, 1024, 2, 128
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)) for _ in range(3)
    )
    lengths = jnp.array([900], jnp.int32)

    out_cp = context_parallel_attention(
        q, k, v, mesh8, lengths=lengths, window=window
    )
    out_ref = reference_attention(
        q, k, v, q_lengths=lengths, kv_lengths=lengths, window=window
    )
    np.testing.assert_allclose(
        np.asarray(out_cp), np.asarray(out_ref), atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize("window", [(-1, -1), (64, 64)])
def test_ring_attention_matches_oracle(mesh8, window):
    from lcasr_tpu.parallel.ring_attention import ring_attention

    rng = np.random.default_rng(1)
    B, T, H, D = 1, 1024, 2, 128
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)) for _ in range(3)
    )
    lengths = jnp.array([800], jnp.int32)

    out_ring = ring_attention(q, k, v, mesh8, lengths=lengths, window=window)
    out_ref = reference_attention(
        q, k, v, q_lengths=lengths, kv_lengths=lengths, window=window
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_ref), atol=2e-2, rtol=2e-2
    )

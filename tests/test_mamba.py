import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.models.mamba import Mamba
from lcasr_tpu.ops.ssm import flip_with_lengths, selective_scan

TINY = dict(
    vocab_size=16,
    d_model=64,
    n_layers=2,
    subsampling_conv_channels=32,
)


def test_selective_scan_matches_sequential_reference():
    """associative_scan == explicit sequential recurrence."""
    rng = np.random.default_rng(0)
    B, L, D, N = 2, 12, 4, 3
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    delta = np.abs(rng.normal(size=(B, L, D))).astype(np.float32)
    A = -np.abs(rng.normal(size=(D, N))).astype(np.float32)
    Bm = rng.normal(size=(B, L, N)).astype(np.float32)
    Cm = rng.normal(size=(B, L, N)).astype(np.float32)
    Dm = rng.normal(size=(D,)).astype(np.float32)

    got = np.asarray(selective_scan(*map(jnp.asarray, (x, delta, A, Bm, Cm, Dm))))

    # sequential oracle
    want = np.zeros((B, L, D), np.float32)
    for b in range(B):
        h = np.zeros((D, N), np.float32)
        for t in range(L):
            dA = np.exp(delta[b, t][:, None] * A)
            h = dA * h + delta[b, t][:, None] * Bm[b, t][None, :] * x[b, t][:, None]
            want[b, t] = h @ Cm[b, t] + Dm * x[b, t]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flip_with_lengths():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 12, 1))
    x2 = jnp.concatenate([x, x], axis=0)
    lengths = jnp.array([12, 5])
    out = np.asarray(flip_with_lengths(x2, lengths))
    # full-length row is a plain flip
    np.testing.assert_array_equal(out[0, :, 0], np.arange(12)[::-1])
    # short row: first 5 reversed, padding untouched (identity positions)
    np.testing.assert_array_equal(out[1, :5, 0], np.array([4, 3, 2, 1, 0]))
    np.testing.assert_array_equal(out[1, 5:, 0], np.arange(5, 12))


@pytest.mark.slow  # fast-tier budget: covered by fast-tier siblings
def test_mamba_forward_shapes():
    model = Mamba(**TINY)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 80, 256))
    variables = model.init(jax.random.PRNGKey(1), audio)
    out = model.apply(variables, audio)
    assert out["final_posteriors"].shape == (2, 32, 17)
    probs = np.exp(np.asarray(out["final_posteriors"]))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=2e-4)


def test_mamba_direction_sensitivity():
    """A bidirectional encoder must produce different outputs when the input
    is time-reversed (it is NOT time-symmetric because convs are causal in
    each direction but params differ)."""
    model = Mamba(**TINY)
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 128))
    variables = model.init(jax.random.PRNGKey(3), audio)
    out1 = model.apply(variables, audio)["final_posteriors"]
    out2 = model.apply(variables, jnp.flip(audio, -1))["final_posteriors"]
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-3)


def test_mamba_registry():
    from lcasr_tpu.models.registry import get_model_class

    assert get_model_class(model_class="Mamba") is Mamba


@pytest.mark.slow
def test_pallas_selective_scan_matches_reference():
    """The sequential Pallas scan (TPU forward default; state resident in
    VMEM) vs the associative-scan reference — forward, unaligned lengths,
    and the gradient path (whose backward recomputes via the reference)."""
    import jax

    from lcasr_tpu.ops.ssm import selective_scan

    rng = np.random.default_rng(0)
    Bt, L, D, N = 2, 96, 256, 16
    x = jnp.asarray(rng.normal(size=(Bt, L, D)), jnp.float32)
    delta = jax.nn.softplus(jnp.asarray(rng.normal(size=(Bt, L, D)), jnp.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(D, N)), jnp.float32))
    B = jnp.asarray(rng.normal(size=(Bt, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(Bt, L, N)), jnp.float32)
    Dskip = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    ref = selective_scan(x, delta, A, B, C, Dskip, use_pallas=False)
    fast = selective_scan(x, delta, A, B, C, Dskip, use_pallas=True)
    assert float(jnp.abs(ref - fast).max()) < 1e-3

    # unaligned L exercises the zero-Δ tail padding (gain 1 / bias 0)
    r2 = selective_scan(x[:, :77], delta[:, :77], A, B[:, :77], C[:, :77], use_pallas=False)
    f2 = selective_scan(x[:, :77], delta[:, :77], A, B[:, :77], C[:, :77], use_pallas=True)
    assert float(jnp.abs(r2 - f2).max()) < 1e-3

    g1 = jax.grad(lambda x: (selective_scan(x, delta, A, B, C, use_pallas=True) ** 2).sum())(x)
    g2 = jax.grad(lambda x: (selective_scan(x, delta, A, B, C, use_pallas=False) ** 2).sum())(x)
    assert float(jnp.abs(g1 - g2).max()) < 1e-2 * float(jnp.abs(g2).max())


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_native_selective_scan_backward_matches_reference(monkeypatch):
    """Native reverse-recurrence Pallas backward (VERDICT r2 next-step #5) vs
    autodiff through the associative-scan reference: all five gradients
    (dx, dΔ, dA, dB, dC) must match.  Runs the kernel through the pallas
    interpreter on CPU (LCASR_NATIVE_SSM_BWD=force); the same path runs
    compiled on TPU."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops.ssm import _selective_scan_fast, _selective_scan_ref

    monkeypatch.setenv("LCASR_NATIVE_SSM_BWD", "force")
    rng = np.random.default_rng(5)
    Bt, L, D, N = 2, 80, 128, 16  # L spans >1 block after the 16-row floor,
    # and 80 is NOT a block multiple — exercises the Δ=0 tail padding
    x = jnp.asarray(rng.normal(size=(Bt, L, D)).astype(np.float32))
    delta = jnp.asarray(
        np.log1p(np.exp(rng.normal(size=(Bt, L, D)))).astype(np.float32)
    )
    A = jnp.asarray(-np.abs(rng.normal(size=(D, N))).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(Bt, L, N)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(Bt, L, N)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Bt, L, D)).astype(np.float32))

    def loss_fast(x, delta, A, Bm, Cm):
        return (_selective_scan_fast(x, delta, A, Bm, Cm) * w).sum()

    def loss_ref(x, delta, A, Bm, Cm):
        return (_selective_scan_ref(x, delta, A, Bm, Cm) * w).sum()

    gf = jax.grad(loss_fast, argnums=(0, 1, 2, 3, 4))(x, delta, A, Bm, Cm)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, delta, A, Bm, Cm)
    for name, a, b in zip(("dx", "ddelta", "dA", "dB", "dC"), gf, gr):
        scale = float(jnp.abs(b).max()) + 1e-6
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-4, (name, err)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.models.sconformer_xl import SCConformerXL

TINY = dict(
    vocab_size=32,
    d_model=64,
    n_layers=2,
    n_heads=2,
    head_dim=32,
    subsampling_conv_channels=32,
    expansion_factor=2,
    use_pallas=False,
)


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model = SCConformerXL(**TINY)
    audio = jnp.zeros((2, 80, 256))
    variables = model.init(jax.random.PRNGKey(0), audio)
    return model, variables


def test_forward_shapes(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 256))
    out = model.apply(variables, audio)
    # 256 frames / 8 subsampling = 32
    assert out["final_posteriors"].shape == (2, 32, 33)
    assert out["length"].shape == (2,)
    assert int(out["length"][0]) == 32


def test_output_is_log_softmax(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 128))
    out = model.apply(variables, audio)
    probs_sum = jnp.exp(out["final_posteriors"]).sum(-1)
    np.testing.assert_allclose(np.asarray(probs_sum), 1.0, rtol=2e-4)


def test_length_downsampling(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(3), (2, 80, 256))
    lengths = jnp.array([256, 100])
    out = model.apply(variables, audio, length=lengths)
    # calc_length: floor((L + 2 - 3)/2 + 1) applied 3x → 256→32, 100→13
    assert out["length"].tolist() == [32, 13]


def test_padding_invariance(tiny_model_and_vars):
    """A short recording inside a padded batch must produce the same valid-
    region posteriors as running it alone (ignoring batch-stat coupling: eval
    mode uses running stats, so outputs must match exactly)."""
    model, variables = tiny_model_and_vars
    rng = np.random.default_rng(0)
    short = jnp.asarray(rng.normal(size=(1, 80, 128)).astype(np.float32))

    # alone
    out_alone = model.apply(variables, short, length=jnp.array([128]))
    # padded to 256 inside a batch with another sample
    other = jnp.asarray(rng.normal(size=(1, 80, 256)).astype(np.float32))
    padded = jnp.concatenate([jnp.pad(short, ((0, 0), (0, 0), (0, 128))), other])
    out_batch = model.apply(variables, padded, length=jnp.array([128, 256]))

    n_valid = int(out_alone["length"][0])
    a = np.asarray(out_alone["final_posteriors"][0, :n_valid])
    b = np.asarray(out_batch["final_posteriors"][0, :n_valid])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_self_conditioning_changes_output():
    model_sc = SCConformerXL(**TINY)
    model_nosc = SCConformerXL(**{**TINY, "self_conditioning": False})
    audio = jax.random.normal(jax.random.PRNGKey(4), (1, 80, 128))
    v = model_sc.init(jax.random.PRNGKey(0), audio)
    out_sc = model_sc.apply(v, audio)
    out_nosc = model_nosc.apply(v, audio)
    assert not np.allclose(
        np.asarray(out_sc["final_posteriors"]), np.asarray(out_nosc["final_posteriors"])
    )


def test_windowed_attention_matches_full_when_window_covers_seq():
    kw = {**TINY, "attention_window_size": 1024}  # window ≥ seq → same as full
    m_win = SCConformerXL(**kw)
    m_full = SCConformerXL(**TINY)
    audio = jax.random.normal(jax.random.PRNGKey(5), (1, 80, 128))
    v = m_full.init(jax.random.PRNGKey(0), audio)
    np.testing.assert_allclose(
        np.asarray(m_win.apply(v, audio)["final_posteriors"]),
        np.asarray(m_full.apply(v, audio)["final_posteriors"]),
        rtol=1e-5,
        atol=1e-5,
    )


def test_train_mode_updates_batch_stats(tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(6), (2, 80, 128))
    out, mutated = model.apply(
        variables, audio, train=True, mutable=["batch_stats"]
    )
    # running stats moved and the step counter advanced
    bs_new = mutated["batch_stats"]
    bs_old = variables["batch_stats"]
    leaves_new = jax.tree.leaves(bs_new)
    leaves_old = jax.tree.leaves(bs_old)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_old, leaves_new)
    )


def test_rotary_model_runs():
    kw = {**TINY, "use_rotary": True, "rotary_base_freq": 1.5e6}
    model = SCConformerXL(**kw)
    audio = jax.random.normal(jax.random.PRNGKey(7), (1, 80, 128))
    v = model.init(jax.random.PRNGKey(0), audio)
    out = model.apply(v, audio)
    assert out["final_posteriors"].shape == (1, 16, 33)


@pytest.mark.slow
def test_remat_subsampling_matches_plain():
    """`remat_subsampling=True` (hour-scale memory lever,
    docs/MEMORY_BUDGET_1H.md) must be a pure recompute: identical forward
    outputs AND identical gradients."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    kw = dict(vocab_size=32, d_model=64, n_layers=1, n_heads=2, head_dim=32,
              subsampling_conv_channels=16, use_pallas=False)
    m0 = SCConformerXL(**kw)
    m1 = SCConformerXL(**kw, remat_subsampling=True)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 80, 512)).astype(np.float32))
    lengths = jnp.array([512, 400], jnp.int32)
    variables = m0.init(jax.random.PRNGKey(0), audio[:, :, :256])

    o0 = m0.apply(variables, audio, length=lengths)["final_posteriors"]
    o1 = m1.apply(variables, audio, length=lengths)["final_posteriors"]
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)

    def loss(m):
        def f(p):
            out = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                          audio, length=lengths)
            return (out["final_posteriors"].astype(jnp.float32) ** 2).sum()
        return f

    g0 = jax.grad(loss(m0))(variables["params"])
    g1 = jax.grad(loss(m1))(variables["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_remat_policy_dots_matches_nothing():
    """`remat_policy='dots'` (save GEMM outputs, recompute elementwise — the
    reference FusedMLP checkpoint_lvl trade, `fused_dense.py:209-498`) must
    be a pure schedule change: identical forward outputs AND gradients to
    the save-nothing layer remat."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    kw = dict(vocab_size=32, d_model=64, n_layers=2, n_heads=2, head_dim=32,
              subsampling_conv_channels=16, use_pallas=False,
              checkpoint_every_n_layers=1)
    m0 = SCConformerXL(**kw, remat_policy="nothing")
    m1 = SCConformerXL(**kw, remat_policy="dots")
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(size=(2, 80, 256)).astype(np.float32))
    lengths = jnp.array([256, 200], jnp.int32)
    variables = m0.init(jax.random.PRNGKey(0), audio)

    o0 = m0.apply(variables, audio, length=lengths)["final_posteriors"]
    o1 = m1.apply(variables, audio, length=lengths)["final_posteriors"]
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)

    def loss(m):
        def f(p):
            out = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                          audio, length=lengths)
            return (out["final_posteriors"].astype(jnp.float32) ** 2).sum()
        return f

    g0 = jax.grad(loss(m0))(variables["params"])
    g1 = jax.grad(loss(m1))(variables["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_subsampling_mode_is_forwarded():
    """model.subsampling='striding'/'vggnet' must build that architecture —
    the mode used to be dropped, silently building dw_striding."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    kw = dict(vocab_size=16, d_model=64, n_layers=1, n_heads=2, head_dim=32,
              subsampling_conv_channels=32, use_pallas=False)
    v_str = SCConformerXL(**kw, subsampling="striding").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)))
    sub = v_str["params"]["subsampling"]
    assert "conv_1" in sub and not any(k.startswith("dw_conv") for k in sub)

    v_dw = SCConformerXL(**kw).init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)))
    assert any(k.startswith("dw_conv") for k in v_dw["params"]["subsampling"])


def test_stacking_subsampling_under_cp_raises():
    import jax
    import jax.numpy as jnp
    import pytest

    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    model = SCConformerXL(vocab_size=16, d_model=64, n_layers=1, n_heads=2,
                          head_dim=32, subsampling="stacking",
                          seq_axis_name="seq", use_pallas=False)
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    import numpy as np

    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("seq",))

    def f(x):
        return model.init(jax.random.PRNGKey(0), x)

    with pytest.raises(NotImplementedError, match="stacking"):
        shard_map(f, mesh=mesh, in_specs=P(None, None, "seq"),
                  out_specs=P(), check_vma=False)(jnp.zeros((1, 80, 128)))

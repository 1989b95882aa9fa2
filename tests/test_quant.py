"""W8A8 quantized inference (ops/qdense.py).

A NEW serving capability with no reference counterpart: the projection/FF
GEMMs run int8 on the MXU with dynamic per-token activation scales and
per-output-channel weight scales.  These tests pin the numerics contract
(error bounds, padding invariance, unchanged param trees, inference-only
guard); the WER-neutrality certification rides in tests/test_closed_loop.py
on a trained model through the production eval pipeline.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.qdense import w8a8_dot_general


def _dn(ndim):
    return (((ndim - 1,), (0,)), ((), ()))


def test_w8a8_dot_general_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 96, 256)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(256, 512)) * 0.05).astype(np.float32))
    exact = jnp.einsum("btk,kn->btn", x, w)
    quant = w8a8_dot_general(x, w, _dn(3))
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    # per-token/per-channel W8A8 on gaussian data lands well under 2%
    assert rel < 0.02, rel


def test_w8a8_zero_rows_stay_zero():
    # padding invariance: the models zero padded positions before every
    # projection — those rows must come out exactly zero (bias is added by
    # nn.Dense outside the dot, so zero rows match the bf16 path exactly)
    x = jnp.zeros((2, 8, 64), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(64, 32)), jnp.float32)
    out = w8a8_dot_general(x, w, _dn(3))
    assert float(jnp.abs(out).max()) == 0.0


def test_w8a8_rejects_non_dense_contractions():
    x = jnp.ones((4, 8, 16))
    w = jnp.ones((16, 8))
    with pytest.raises(NotImplementedError):
        w8a8_dot_general(x, w, (((1,), (1,)), ((), ())))


def _tiny(quant):
    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    return SCConformerXL(
        vocab_size=64, d_model=96, n_layers=2, n_heads=2, head_dim=48,
        subsampling_conv_channels=32, use_pallas=False, use_rotary=True,
        quant_w8a8=quant,
    )


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_model_w8a8_same_param_tree_and_close_posteriors():
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 80, 256)), jnp.float32
    )
    lengths = jnp.asarray([256, 190], jnp.int32)

    ref_model, q_model = _tiny(False), _tiny(True)
    variables = ref_model.init(jax.random.PRNGKey(0), audio, lengths)
    q_shapes = jax.tree.map(
        lambda a: a.shape, q_model.init(jax.random.PRNGKey(0), audio, lengths)
    )
    assert q_shapes == jax.tree.map(lambda a: a.shape, variables)

    # the SAME checkpoint serves both paths; posteriors stay close in
    # probability space (W8A8 is ~1% relative error per GEMM)
    ref = ref_model.apply(variables, audio, lengths)
    q = q_model.apply(variables, audio, lengths)
    assert q["final_posteriors"].shape == ref["final_posteriors"].shape
    p_ref = np.exp(np.asarray(ref["final_posteriors"], np.float32))
    p_q = np.exp(np.asarray(q["final_posteriors"], np.float32))
    assert np.abs(p_ref - p_q).max() < 0.05, np.abs(p_ref - p_q).max()
    assert np.all(np.asarray(q["length"]) == np.asarray(ref["length"]))


def test_model_w8a8_train_raises():
    audio = jnp.zeros((1, 80, 128), jnp.float32)
    model = _tiny(True)
    variables = _tiny(False).init(jax.random.PRNGKey(0), audio)
    with pytest.raises(ValueError, match="inference-only"):
        model.apply(variables, audio, train=True)


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
@pytest.mark.parametrize("family", ["mamba", "enc_dec", "lm"])
def test_w8a8_other_families_same_tree_and_close(family):
    """Every serving model family accepts quant_w8a8 with an unchanged param
    tree and close outputs (the flagship is covered above)."""
    rng = np.random.default_rng(0)
    if family == "mamba":
        from lcasr_tpu.models.mamba import Mamba

        mk = lambda q: Mamba(vocab_size=64, d_model=64, n_layers=1,
                             subsampling_conv_channels=32, quant_w8a8=q)
        audio = jnp.asarray(rng.normal(size=(2, 80, 128)), jnp.float32)
        args = (audio,)
    elif family == "enc_dec":
        from lcasr_tpu.models.enc_dec_sconformer import EncDecSconformer

        mk = lambda q: EncDecSconformer(
            vocab_size=64, d_model=64, n_layers=1, n_heads=2, head_dim=32,
            subsampling_conv_channels=16, use_pallas=False, quant_w8a8=q)
        audio = jnp.asarray(rng.normal(size=(1, 80, 128)), jnp.float32)
        args = (audio, jnp.asarray([[3, 4, 5]], jnp.int32))
    else:
        from lcasr_tpu.models.lm import TransformerLM

        mk = lambda q: TransformerLM(vocab_size=64, d_model=64, n_layers=1,
                                     n_heads=2, head_dim=32, quant_w8a8=q)
        args = (jnp.asarray(rng.integers(0, 64, (2, 12)), jnp.int32),)

    ref_m, q_m = mk(False), mk(True)
    variables = ref_m.init(jax.random.PRNGKey(0), *args)
    q_shapes = jax.eval_shape(lambda: q_m.init(jax.random.PRNGKey(0), *args))
    assert jax.tree.map(lambda a: a.shape, q_shapes) == jax.tree.map(
        lambda a: a.shape, variables
    )

    ref, q = ref_m.apply(variables, *args), q_m.apply(variables, *args)
    ref_leaf = ref["final_posteriors"] if isinstance(ref, dict) else ref
    q_leaf = q["final_posteriors"] if isinstance(q, dict) else q
    a, b = np.asarray(ref_leaf, np.float32), np.asarray(q_leaf, np.float32)
    denom = max(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 0.1, np.abs(a - b).max() / denom


def test_quant_policy_resolution():
    from lcasr_tpu.ops.qdense import (
        ALL_SITES, AUTO_SITES, quant_site, resolve_quant_policy,
    )

    assert resolve_quant_policy(True) == ALL_SITES
    assert resolve_quant_policy(False) == frozenset()
    assert resolve_quant_policy(None) == frozenset()
    assert resolve_quant_policy("auto") == AUTO_SITES
    assert resolve_quant_policy("ff") == frozenset({"ff"})
    assert resolve_quant_policy(("ff", "decoder")) == frozenset({"ff", "decoder"})
    assert quant_site("auto", "ff") and not quant_site("auto", "qkv")
    with pytest.raises(ValueError, match="unknown quant_w8a8 site"):
        resolve_quant_policy("not_a_site")
    with pytest.raises(ValueError, match="unknown quant_w8a8 site"):
        resolve_quant_policy(("ff", "bogus"))


def test_model_w8a8_auto_policy_same_tree_and_closer_than_full():
    """'auto' (FF + decoder only) keeps the param tree and, quantizing a
    strict subset of the GEMMs, lands at least as close to bf16 as full
    quantization does."""
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.normal(size=(2, 80, 256)), jnp.float32)
    lengths = jnp.asarray([256, 200], jnp.int32)

    ref_m = _tiny(False)
    variables = ref_m.init(jax.random.PRNGKey(0), audio, lengths)
    auto_m, full_m = _tiny("auto"), _tiny(True)
    auto_shapes = jax.tree.map(
        lambda a: a.shape,
        jax.eval_shape(lambda: auto_m.init(jax.random.PRNGKey(0), audio, lengths)),
    )
    assert auto_shapes == jax.tree.map(lambda a: a.shape, variables)

    p = lambda m: np.exp(np.asarray(
        m.apply(variables, audio, lengths)["final_posteriors"], np.float32))
    p_ref, p_auto, p_full = p(ref_m), p(auto_m), p(full_m)
    err_auto = np.abs(p_ref - p_auto).max()
    err_full = np.abs(p_ref - p_full).max()
    assert err_auto > 0.0  # it does quantize something
    assert err_auto <= err_full * 1.05, (err_auto, err_full)


def test_model_w8a8_auto_train_raises_too():
    audio = jnp.zeros((1, 80, 128), jnp.float32)
    model = _tiny("auto")
    variables = _tiny(False).init(jax.random.PRNGKey(0), audio)
    with pytest.raises(ValueError, match="inference-only"):
        model.apply(variables, audio, train=True)

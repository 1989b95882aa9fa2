"""End-to-end numerical parity vs the reference PyTorch SCConformerXL.

The reference model (CPU path: SDPA attention, plain convs, python RMSNorm)
is instantiated with random weights, the state_dict is converted with
`lcasr_tpu.models.import_torch`, and logits are compared.  This anchors every
layer-semantics detail: GLU ordering, qkv packing, subsampling flatten order,
batch-renorm eval statistics, self-conditioning, legasee double norm.

Skipped when the read-only reference checkout is unavailable.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lcasr_tpu.models.import_torch import variables_from_torch  # noqa: E402
from lcasr_tpu.models.sconformer_xl import SCConformerXL  # noqa: E402

MODEL_CFG = dict(
    vocab_size=32,
    d_model=64,
    n_layers=2,
    n_heads=2,
    head_dim=32,
    subsampling_conv_channels=32,
    expansion_factor=2,
)


@pytest.fixture(scope="module")
def reference_model():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import (
        install_reference_package_stubs,
        load_reference_module,
        reference_available,
    )

    if not reference_available():
        pytest.skip("reference checkout not present")
    install_reference_package_stubs()
    mod = load_reference_module("lcasr/models/sconformer_xl.py", "ref_sconformer")
    torch.manual_seed(0)
    model = mod.SCConformerXL(
        vocab_size=MODEL_CFG["vocab_size"],
        d_model=MODEL_CFG["d_model"],
        n_layers=MODEL_CFG["n_layers"],
        n_heads=MODEL_CFG["n_heads"],
        head_dim=MODEL_CFG["head_dim"],
        subsampling_conv_channels=MODEL_CFG["subsampling_conv_channels"],
        expansion_factor=MODEL_CFG["expansion_factor"],
        flash_attn=False,
    )
    model.eval()
    return model, torch


def _convert(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return variables_from_torch(sd, MODEL_CFG)


def test_equal_length_parity(reference_model):
    model_t, torch = reference_model
    variables = _convert(model_t)
    jmodel = SCConformerXL(**MODEL_CFG, use_pallas=False)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 80, 192)).astype(np.float32)

    with torch.no_grad():
        out_t = model_t(torch.from_numpy(audio))
    ref = out_t["final_posteriors"].numpy()

    # highest matmul precision: on TPU this forces f32 (6-pass) matmuls so
    # the comparison is about STRUCTURE, not MXU bf16 rounding.  On CPU the
    # agreement is ~1e-6.
    with jax.default_matmul_precision("highest"):
        out_j = jmodel.apply(variables, jnp.asarray(audio))
    got = np.asarray(out_j["final_posteriors"])

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_variable_length_parity(reference_model):
    model_t, torch = reference_model
    variables = _convert(model_t)
    jmodel = SCConformerXL(**MODEL_CFG, use_pallas=False)

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(2, 80, 192)).astype(np.float32)
    lengths = np.array([192, 100])

    with torch.no_grad():
        out_t = model_t(torch.from_numpy(audio), length=torch.from_numpy(lengths))
    ref = out_t["final_posteriors"].numpy()
    ref_len = out_t["length"].numpy()

    with jax.default_matmul_precision("highest"):
        out_j = jmodel.apply(variables, jnp.asarray(audio), length=jnp.asarray(lengths))
    got = np.asarray(out_j["final_posteriors"])
    got_len = np.asarray(out_j["length"])

    np.testing.assert_array_equal(got_len, ref_len)
    # compare only valid frames per sequence
    for b in range(2):
        n = int(ref_len[b])
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=2e-3, atol=2e-3)

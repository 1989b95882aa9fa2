"""Weight-decay grouping must reproduce the reference's EFFECTIVE semantics.

The reference's minGPT loop (`lcasr/models/base.py:33-45`) decays the
modules its models label "don't decay" (`sconformer_xl.py:106-107`): the
behavior that trained every reference checkpoint with weight_decay > 0 is
decay on NORM SCALES ONLY (all biases and every Linear/Conv/rotary param
excluded).  Models without the tuples (enc_dec) hit the warning branch:
decay on ALL params (`base.py:29-32`).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.models.base import decay_mask


def _flat(mask):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(mask)[0]:
        out["/".join(p.key for p in path if hasattr(p, "key"))] = bool(leaf)
    return out


@pytest.fixture(scope="module")
def sconformer_params():
    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    model = SCConformerXL(vocab_size=16, d_model=32, n_layers=1, n_heads=2,
                          head_dim=16, use_pallas=False, use_rotary=True,
                          learned_rotary=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)))
    return model, v["params"]


def test_sconformer_decays_norm_scales_only(sconformer_params):
    model, params = sconformer_params
    flat = _flat(decay_mask(params, model=model))
    decayed = {k for k, v in flat.items() if v}
    assert decayed, "norm scales must decay"
    for k in decayed:
        leaf = k.rsplit("/", 1)[-1]
        assert leaf in ("scale", "weight"), k
        assert any("norm" in part.lower() for part in k.split("/")[:-1]), k
    # every bias, dense kernel and rotary param is excluded
    for k, v in flat.items():
        leaf = k.rsplit("/", 1)[-1]
        if leaf.endswith("bias") or leaf == "kernel" or "rotary" in k.lower():
            assert not v, k
    # and the norm affines themselves: scale decays, bias never does
    scales = [k for k in decayed if k.endswith("/scale") or k.endswith("/weight")]
    assert scales


def test_mamba_excludes_A_log_D_and_dt_bias():
    from lcasr_tpu.models.mamba import Mamba

    model = Mamba(vocab_size=16, d_model=32, n_layers=1,
                  subsampling_conv_channels=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)))
    flat = _flat(decay_mask(v["params"], model=model))
    a_log = [k for k in flat if k.endswith("A_log")]
    d = [k for k in flat if k.endswith("/D")]
    dt_b = [k for k in flat if k.endswith("dt_proj_bias")]
    assert a_log and d and dt_b
    assert not any(flat[k] for k in a_log + d + dt_b)
    # the block RMSNorm scale is the decay set
    norm_scales = [k for k, val in flat.items()
                   if val and k.rsplit("/", 1)[-1] in ("scale", "weight")]
    assert norm_scales


def test_encdec_hits_all_params_branch():
    params = {"embed": {"embedding": jnp.zeros((4, 8))},
              "ff": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mask = decay_mask(params, model="EncDecSconformer")
    assert any("ALL parameters" in str(x.message) for x in w)
    assert all(jax.tree.leaves(mask))


def test_model_none_uses_grouped_rule():
    """Call sites without a model (legacy) keep the grouped behavior."""
    params = {"norm": {"scale": jnp.zeros((4,))},
              "ff": {"kernel": jnp.zeros((4, 4))}}
    flat = _flat(decay_mask(params))
    assert flat["norm/scale"] is True
    assert flat["ff/kernel"] is False

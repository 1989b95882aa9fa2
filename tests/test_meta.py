"""SCConformerMeta: gradient-prediction meta branch + trainer.

Reference: `lcasr/models/sconformer_meta.py` (live path) and
`exp/train_utterance_meta_loss_pred.py` — the meta branch is trained to
predict d(CTC loss)/d(reprs) with the encoder frozen.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.config import Config
from lcasr_tpu.models.sconformer_meta import (
    SCConformerMeta,
    meta_param_mask,
    refine_at_inference,
)
from lcasr_tpu.training.meta import MetaTrainer, make_meta_loss_fn


VOCAB = 16


def tiny_model(**kw):
    return SCConformerMeta(
        vocab_size=VOCAB,
        d_model=32,
        n_layers=2,
        n_heads=2,
        head_dim=16,
        subsampling_conv_channels=32,
        n_meta_layers=1,
        use_pallas=False,
        **kw,
    )


class _Tok:
    def vocab_size(self):
        return VOCAB


def _batch(rng, B=2, T=512, U=6):
    return {
        "audio": rng.normal(size=(B, 80, T)).astype(np.float32),
        "audio_lengths": np.array([T, T - 100], np.int32),
        "text": rng.integers(0, VOCAB, size=(B, U)).astype(np.int64),
        "text_lengths": np.array([U, U - 2], np.int32),
        "ids": ["a", "b"],
    }


def test_forward_returns_meta_tensors():
    model = tiny_model()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(1, 80, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio, jnp.array([256]))
    out = model.apply(variables, audio, jnp.array([256]))
    N = out["final_posteriors"].shape[1]
    assert out["final_posteriors"].shape == (1, N, VOCAB + 1)
    # grad_pred predicts d loss/d reprs — repr-shaped (classes = d_model)
    assert out["grad_pred"].shape == (1, N, 32)
    assert out["reprs"].shape == (1, N, 32)
    # log-probs normalized
    assert np.allclose(
        np.exp(np.asarray(out["final_posteriors"][0], np.float64)).sum(-1), 1.0,
        atol=1e-3,
    )


def test_meta_param_mask_splits_branches():
    model = tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 256)), jnp.array([256])
    )
    mask = meta_param_mask(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = {jax.tree_util.keystr(p).split("'")[1] for p, v in flat if v}
    frozen = {jax.tree_util.keystr(p).split("'")[1] for p, v in flat if not v}
    assert any(k.startswith("meta_layers_") for k in trainable)
    assert "meta_decoder" in trainable and "combiner" in trainable
    assert "decoder" in frozen and "subsampling" in frozen
    assert not trainable & frozen


def test_meta_loss_fns():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)
    for kind in ("l2", "mse", "cosine"):
        fn = make_meta_loss_fn(kind)
        assert float(fn(a, a, 32.0)) == pytest.approx(0.0, abs=1e-5)
        assert float(fn(a, -a, 32.0)) > 0.0


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_meta_training_step_updates_only_meta_params_and_learns():
    model = tiny_model()
    cfg = Config(
        {
            "training": {"loss": "l2", "batch_size": 2, "max_epochs": 1},
            "audio_chunking": {"size": 512},
            "optimizer": {"name": "madgrad", "args": {"lr": 3e-3}},
            "scheduler": {"warmup_steps": 0},
        }
    )
    trainer = MetaTrainer(cfg, model, _Tok(), checkpoint_dir="/tmp/meta_test_ckpt")
    state = trainer.init_state()
    p0 = jax.tree.map(lambda x: np.asarray(x), state["params"])

    rng = np.random.default_rng(1)
    batch = _batch(rng)
    losses = []
    for i in range(4):
        state = trainer.train_utterances(state, [batch], epochs=1)
    import json

    with open("/tmp/meta_test_ckpt/metrics.jsonl") as fh:
        rows = [json.loads(l) for l in fh if l.strip()][-4:]
    losses = [r["meta_loss_1"] for r in rows]
    # the meta branch fits the (fixed-batch) gradient field
    assert losses[-1] < losses[0], losses
    # control loss stays distinguishable: fitting the TRUE row pairing, not
    # a marginal distribution (fresh model; weak assertion by design)
    assert all(np.isfinite(r["meta_loss_2"]) for r in rows)

    p1 = state["params"]
    changed, unchanged = [], []
    for top in p0:
        delta = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            p0[top], p1[top],
        )
        m = max(jax.tree.leaves(delta)) if jax.tree.leaves(delta) else 0.0
        (changed if m > 0 else unchanged).append(top)
    assert any(t.startswith("meta_layers_") for t in changed)
    assert "meta_decoder" in changed and "combiner" in changed
    # encoder/decoder frozen (reference sconformer_meta.py:287-295)
    assert "decoder" in unchanged and "subsampling" in unchanged
    assert all(not t.startswith("layers_") for t in changed)


def test_refine_at_inference_runs():
    model = tiny_model(inference_iterations=2, inference_lr=0.01)
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.normal(size=(1, 80, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio, jnp.array([256]))
    out = refine_at_inference(model, variables, audio, jnp.array([256]))
    assert np.isfinite(np.asarray(out["final_posteriors"])).all()
    assert np.allclose(
        np.exp(np.asarray(out["final_posteriors"][0], np.float64)).sum(-1), 1.0,
        atol=1e-3,
    )


def test_meta_fourier_pos_enc_option():
    """fourier_pos_enc (reference sconformer_meta.py:121,193,415) is applied
    BEFORE the initial-signal capture, lives on the frozen encoder side, and
    changes the forward."""
    import numpy as np

    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.normal(size=(1, 80, 256)), jnp.float32)
    plain = tiny_model()
    four = tiny_model(fourier_pos_enc=True)
    v = four.init(jax.random.PRNGKey(0), audio, jnp.array([256]))
    assert "fourier_pos_enc" in v["params"]

    from lcasr_tpu.models.sconformer_meta import meta_param_mask

    mask = meta_param_mask(v["params"])
    assert not any(jax.tree.leaves(mask["fourier_pos_enc"]))  # frozen side

    out = four.apply(v, audio, jnp.array([256]))
    v_plain = plain.init(jax.random.PRNGKey(0), audio, jnp.array([256]))
    out_plain = plain.apply(v_plain, audio, jnp.array([256]))
    assert out["grad_pred"].shape == out_plain["grad_pred"].shape
    assert not np.allclose(
        np.asarray(out["final_posteriors"]), np.asarray(out_plain["final_posteriors"])
    )

import jax
import jax.numpy as jnp
import numpy as np

from lcasr_tpu.models.lm import TransformerLM, lm_loss, make_lm_scorer

TINY = dict(vocab_size=32, d_model=64, n_layers=2, n_heads=2, head_dim=32)


def test_lm_shapes_and_causality():
    model = TransformerLM(**TINY)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 32, (2, 12)))
    v = model.init(jax.random.PRNGKey(0), tokens)
    logits = model.apply(v, tokens)
    assert logits.shape == (2, 12, 32)
    # causality: changing a future token must not change earlier logits
    tokens2 = tokens.at[0, 8].set((int(tokens[0, 8]) + 1) % 32)
    logits2 = model.apply(v, tokens2)
    np.testing.assert_allclose(
        np.asarray(logits[0, :8]), np.asarray(logits2[0, :8]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[0, 8:]), np.asarray(logits2[0, 8:]))


def test_lm_loss_decreases_with_training():
    import optax

    model = TransformerLM(**TINY)
    rng = np.random.default_rng(1)
    # learnable pattern: token i followed by (i+1) % 32
    seq = (np.arange(16)[None, :] + rng.integers(0, 32, (8, 1))) % 32
    tokens = jnp.asarray(seq)
    v = model.init(jax.random.PRNGKey(0), tokens)
    params = v["params"]
    opt = optax.adam(3e-3)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        loss, g = jax.value_and_grad(
            lambda p: lm_loss(model, {"params": p}, tokens)
        )(params)
        up, st = opt.update(g, st, params)
        return jax.tree.map(lambda a, b: a + b, params, up), st, loss

    params, st, l0 = step(params, st)
    for _ in range(30):
        params, st, l1 = step(params, st)
    assert float(l1) < float(l0) * 0.8


def test_lm_scorer_hook():
    model = TransformerLM(**TINY)
    tokens = jnp.zeros((1, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), tokens)
    scorer = make_lm_scorer(model, v, bos_id=2, pad_id=0)
    scores = scorer([[1, 2, 3], [4]])
    assert scores.shape == (2, 32)
    np.testing.assert_allclose(np.exp(scores).sum(-1), 1.0, rtol=1e-4)


def test_train_lm_cli_end_to_end(tmp_path):
    """cli/train_lm: text file → trained TransformerLM checkpoint that
    load_lm_checkpoint (the rescoring loader) accepts; loss decreases."""
    import json

    from lcasr_tpu.cli.lm_rescore import load_lm_checkpoint
    from lcasr_tpu.cli.train_lm import train_lm

    text = tmp_path / "corpus.txt"
    text.write_text("\n".join(
        ["the cat sat on the mat", "a dog ran in the park",
         "the cat ran", "a dog sat"] * 4
    ))
    save = tmp_path / "lm_ck"
    ckpt = train_lm(
        str(text), str(save), d_model=32, n_layers=1, n_heads=2, head_dim=16,
        batch_size=4, seq_len=16, lr=3e-3, steps=40, save_every=40, log_every=10,
    )
    lines = [json.loads(l) for l in open(save / "metrics.jsonl")]
    assert lines[-1]["loss"] < lines[0]["loss"]

    model, variables = load_lm_checkpoint(ckpt)
    assert model.d_model == 32 and "params" in variables

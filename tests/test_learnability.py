"""End-to-end learnability: the full stack (model + CTC + MADGRAD) must be
able to overfit one synthetic utterance — the strongest cheap signal that
gradients, masking and the optimizer compose correctly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.models.sconformer_xl import SCConformerXL
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.optim.madgrad import madgrad


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_overfit_single_utterance():
    rng = np.random.default_rng(0)
    model = SCConformerXL(
        vocab_size=32, d_model=64, n_layers=2, n_heads=2, head_dim=32,
        subsampling_conv_channels=32, use_pallas=False,
    )
    audio = jnp.asarray(rng.normal(size=(1, 80, 256)).astype(np.float32))
    labels = jnp.asarray([[3, 7, 12, 7, 20]])
    ll, al = jnp.asarray([5]), jnp.asarray([256])

    variables = model.init(jax.random.PRNGKey(0), audio, length=al)
    params, bstats = variables["params"], variables["batch_stats"]
    opt = madgrad(learning_rate=3e-4)
    st = opt.init(params)

    @jax.jit
    def step(params, bstats, st):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, audio,
                length=al, train=True, mutable=["batch_stats"],
            )
            return (
                ctc_loss(
                    out["final_posteriors"].astype(jnp.float32),
                    labels, out["length"], ll, blank_id=32,
                ),
                mut["batch_stats"],
            )

        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, st = opt.update(g, st, params)
        return jax.tree.map(lambda a, b: a + b, params, up), bs, st, loss

    params, bstats, st, loss0 = step(params, bstats, st)
    for _ in range(60):
        params, bstats, st, loss = step(params, bstats, st)
    # observed trajectory on TPU: 73 → ~1 over 120 steps; require a decisive
    # order-of-magnitude collapse within 60
    assert float(loss) < float(loss0) / 10, (float(loss0), float(loss))

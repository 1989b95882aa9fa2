"""Pallas flash attention vs exact jnp oracle.

On CPU these run through the pallas interpreter (slow → tiny sizes); the same
checks run on real TPU hardware in the verify drives and bench harness.
Tolerances reflect MXU bf16-multiply/f32-accumulate precision — the same
numerics FlashAttention-2 delivers for the reference (which casts to
fp16/bf16 before attention, reference `lcasr/components/attention.py:521-523`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.ops.attention import reference_attention
from lcasr_tpu.ops.flash_attention import flash_attention

B, T, H, D = 2, 320, 2, 128


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("window", [(-1, -1), (32, 32), (64, -1)])
def test_forward_matches_oracle(qkv, window):
    q, k, v = qkv
    lengths = jnp.array([T, 200], jnp.int32)
    out_p = flash_attention(q, k, v, lengths=lengths, window=window, block_q=128, block_k=128)
    out_r = reference_attention(
        q, k, v, q_lengths=lengths, kv_lengths=lengths, window=window
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-2, rtol=2e-2)


def test_forward_no_lengths(qkv):
    q, k, v = qkv
    out_p = flash_attention(q, k, v, block_q=128, block_k=128)
    out_r = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-2, rtol=2e-2)


def test_gradients_match_oracle(qkv):
    q, k, v = qkv
    lengths = jnp.array([T, 160], jnp.int32)

    def lp(q, k, v):
        return (flash_attention(q, k, v, lengths=lengths, window=(32, 32), block_q=128, block_k=128) ** 2).sum()

    def lr(q, k, v):
        return (
            reference_attention(
                q, k, v, q_lengths=lengths, kv_lengths=lengths, window=(32, 32)
            )
            ** 2
        ).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 2e-2


def test_padded_queries_are_zero(qkv):
    q, k, v = qkv
    lengths = jnp.array([128, 64], jnp.int32)
    out = np.asarray(
        flash_attention(q, k, v, lengths=lengths, block_q=128, block_k=128)
    )
    assert np.abs(out[0, 128:]).max() == 0.0
    assert np.abs(out[1, 64:]).max() == 0.0


def test_bf16_inputs(qkv):
    q, k, v = qkv
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, block_q=128, block_k=128)
    ref = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


@pytest.mark.parametrize("window", [(64, 64), (96, 32)])
def test_sharded_query_gradients_match_oracle(window):
    """Windowed attention with q_offset>0 (the context-parallel sharded-query
    case): dk/dv must match the oracle.  Regression test for the banded dkv
    kernel using the unclamped global kv length as the virtual-q-row bound,
    which let clamped duplicate q blocks pollute dk/dv (ADVICE r1, high)."""
    rng = np.random.default_rng(3)
    # MIDDLE shard: local q rows [off, hi) with KV blocks continuing beyond
    # the local extent — only then do virtual q-block indices past nQ-1 get
    # clamped by the banded index map and exercise the row-bound clamp.
    Tg, off, hi = 512, 128, 384
    mk = lambda shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    qg, k, v = mk((1, Tg, H, D)), mk((1, Tg, H, D)), mk((1, Tg, H, D))
    lengths = jnp.array([Tg - 32], jnp.int32)

    def lp(q_local, k, v):
        out = flash_attention(
            q_local, k, v, lengths=lengths, window=window,
            block_q=128, block_k=128, q_offset=jnp.int32(off),
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def lr(q_full, k, v):
        out = reference_attention(
            q_full, k, v, q_lengths=lengths, kv_lengths=lengths, window=window
        )
        return (out[:, off:hi].astype(jnp.float32) ** 2).sum()

    gq_p, gk_p, gv_p = jax.grad(lp, argnums=(0, 1, 2))(qg[:, off:hi], k, v)
    gq_r, gk_r, gv_r = jax.grad(lr, argnums=(0, 1, 2))(qg, k, v)
    for a, b in [(gq_p, gq_r[:, off:hi]), (gk_p, gk_r), (gv_p, gv_r)]:
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 2e-2


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused one-pass backward is TPU-only: the pallas interpreter "
    "does not give read-your-writes through the input/output-aliased dq "
    "accumulator (CPU runs the split-kernel fallback)",
)
@pytest.mark.parametrize(
    "Tl,bq,bk",
    [
        (1024, 128, 128),  # nQ=8, nK=8 — general revisit path
        (1024, 512, 1024),  # nQ=2, nK=1 — single-visit dq (default blocks, the chunk-8192 training shape)
        (2048, 512, 1024),  # nQ=4, nK=2 — minimum allowed revisit distance
    ],
)
def test_fused_backward_matches_oracle(Tl, bq, bk):
    """The one-pass fused backward (non-banded, nK == 1 or nQ >= 4 — dq
    accumulated in fp32 HBM via an input/output-aliased buffer) vs the
    oracle gradient.  The small-T tests above stay on the split-kernel
    fallback (nQ = 3, nK > 1)."""
    rng = np.random.default_rng(11)
    mk = lambda: jnp.asarray(rng.normal(size=(1, Tl, H, D)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    lengths = jnp.array([Tl - 100], jnp.int32)

    def lp(q, k, v):
        return (flash_attention(q, k, v, lengths=lengths, block_q=bq, block_k=bk) ** 2).sum()

    def lr(q, k, v):
        return (reference_attention(q, k, v, q_lengths=lengths, kv_lengths=lengths) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 2e-2, name


def test_double_buffered_forward_matches_oracle(monkeypatch):
    """The opt-in cross-step double-buffered forward (LCASR_ATTN_FWD_DB=1 —
    default OFF after measuring 20% slower than the half-split kernel, see
    PERFORMANCE.md) must stay numerically exact: same masks, same online-
    softmax merge order, one drain step."""
    monkeypatch.setenv("LCASR_ATTN_FWD_DB", "1")
    rng = np.random.default_rng(21)
    mk = lambda: jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    lengths = jnp.array([T, 200], jnp.int32)
    out_p = flash_attention(q, k, v, lengths=lengths, block_q=128, block_k=128)
    out_r = reference_attention(q, k, v, q_lengths=lengths, kv_lengths=lengths)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-2, rtol=2e-2)

    def lp(q, k, v):
        return (flash_attention(q, k, v, lengths=lengths, block_q=128, block_k=128) ** 2).sum()

    def lr(q, k, v):
        return (reference_attention(q, k, v, q_lengths=lengths, kv_lengths=lengths) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 2e-2, name


def test_head_dim_256_fit_blocks_matches_oracle():
    """Head dims past the tuned D=128 shrink the block sizes
    (_fit_blocks, ADVICE r2 low) — the kernel must stay exact there."""
    rng = np.random.default_rng(31)
    Dh = 256
    mk = lambda: jnp.asarray(rng.normal(size=(1, 256, 2, Dh)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    lengths = jnp.array([200], jnp.int32)
    out_p = flash_attention(q, k, v, lengths=lengths)
    out_r = reference_attention(q, k, v, q_lengths=lengths, kv_lengths=lengths)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-2, rtol=2e-2)


def test_fused_bwd_probe_runs_inside_trace():
    """The once-per-process fused-backward safety probe fires lazily inside
    the first jit TRACE that takes the fused path.  Under omnistaging its
    jnp ops would be staged into that trace and the float() comparisons
    would raise ConcretizationTypeError — which the defensive except used
    to swallow as 'probe failed', silently downgrading every jitted
    training step to the split kernels.  The probe must escape the live
    trace (it runs on a fresh thread — JAX trace contexts are
    thread-local) and report ok even when invoked mid-trace."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.ops import flash_attention as fa

    saved = dict(fa._FUSED_BWD_STATE)
    try:
        fa._FUSED_BWD_STATE.update(checked=False, ok=True)

        probed = {}

        @jax.jit
        def traced(x):
            # call the gate while a trace is active — exactly how the real
            # backward reaches it
            probed["ok"] = fa._fused_bwd_safe()
            return x * 2.0

        traced(jnp.ones((2,)))
        assert fa._FUSED_BWD_STATE["checked"]
        # on CPU both probe arms run the split kernels, so the comparison is
        # trivially equal — ok must be True, and no exception was swallowed
        assert probed["ok"] is True
        assert fa._FUSED_BWD_STATE["ok"] is True
    finally:
        fa._FUSED_BWD_STATE.update(saved)


def test_double_buffered_forward_out_of_band_shard(monkeypatch):
    """Regression (r3 self-review): the db kernel must apply the FULL band
    predicate, not just the column bound — a kv shard entirely behind a
    one-sided window (the CP/ring regime that reaches the non-banded db
    path) must contribute NOTHING.  Before the fix, the all-NEG_INF score
    tile made exp(s - m)=1 at the masked maximum and out-of-band rows
    returned garbage instead of matching the production kernel's zeros."""
    rng = np.random.default_rng(41)
    Tloc, Dh, Hh = 128, 64, 2
    mk = lambda T: jnp.asarray(rng.normal(size=(1, T, Hh, Dh)).astype(np.float32))
    q = mk(Tloc)
    k, v = mk(Tloc), mk(Tloc)
    lengths = jnp.array([1024], jnp.int32)  # global length
    kwargs = dict(
        lengths=lengths, window=(64, -1), block_q=128, block_k=128,
        q_offset=jnp.asarray(512), kv_offset=jnp.asarray(0),
    )
    out_prod = np.asarray(flash_attention(q, k, v, **kwargs))
    monkeypatch.setenv("LCASR_ATTN_FWD_DB", "1")
    out_db = np.asarray(flash_attention(q, k, v, **kwargs))
    # queries at global rows 512.. with left window 64 cannot see cols 0..127
    assert np.abs(out_prod).max() == 0.0
    np.testing.assert_array_equal(out_db, out_prod)

    # and a PARTIALLY in-band shard stays exact vs the production kernel
    kwargs2 = dict(
        lengths=lengths, window=(64, -1), block_q=128, block_k=128,
        q_offset=jnp.asarray(128), kv_offset=jnp.asarray(64),
    )
    monkeypatch.delenv("LCASR_ATTN_FWD_DB")
    out_prod2 = np.asarray(flash_attention(q, k, v, **kwargs2))
    monkeypatch.setenv("LCASR_ATTN_FWD_DB", "1")
    out_db2 = np.asarray(flash_attention(q, k, v, **kwargs2))
    np.testing.assert_allclose(out_db2, out_prod2, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("window", [(-1, -1), (32, 32)])
def test_probs_match_oracle(qkv, window):
    """flash_attention_probs (VERDICT r4 #5): row-blocked probabilities
    normalized by the production kernel's lse must equal the oracle's
    softmax probabilities — ragged lengths, windowed and full attention,
    and an interior row slice."""
    from lcasr_tpu.ops.flash_attention import flash_attention_probs

    q, k, v = qkv
    lengths = jnp.array([T, 200], jnp.int32)
    _, probs_r = reference_attention(
        q, k, v, q_lengths=lengths, kv_lengths=lengths, window=window,
        return_weights=True,
    )
    # full-row capture
    p = flash_attention_probs(q, k, v, lengths=lengths, window=window)
    assert p.shape == (B, 2, T, T)
    # compare VALID rows only (the oracle leaves padded-query rows as a
    # softmax over valid columns; the kernel path zeroes them)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(probs_r[0]),
                               atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(p[1, :, :200]),
                               np.asarray(probs_r[1, :, :200]),
                               atol=2e-3, rtol=2e-2)
    # padded-query rows are exactly zero
    assert float(jnp.abs(p[1, :, 200:]).max()) == 0.0
    # rows sum to 1 on live rows
    np.testing.assert_allclose(np.asarray(p[0].sum(-1)), 1.0, atol=1e-3)

    # interior row slice with a reused lse (the streaming pattern)
    from lcasr_tpu.ops.flash_attention import flash_attention_with_lse

    _, lse = flash_attention_with_lse(q, k, v, lengths=lengths, window=window)
    p_rows = flash_attention_probs(
        q, k, v, lengths=lengths, window=window, rows=(64, 128), lse=lse)
    np.testing.assert_allclose(np.asarray(p_rows),
                               np.asarray(p[:, :, 64:192]), atol=1e-6)


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_attention_summary_streams_without_oracle():
    """analysis.attention_summary: the row-blocked statistics must agree
    with the same statistics computed from the O(T²) oracle probabilities,
    and the capture path must leave the model's attention output unchanged
    (capture_qkv sows q/k/v without rerouting the forward)."""
    from lcasr_tpu.evaluation.analysis import (
        attention_prob_rows,
        attention_summary,
        get_attention_weights,
    )
    from lcasr_tpu.models.sconformer_xl import SCConformerXL

    model = SCConformerXL(vocab_size=16, d_model=64, n_layers=2, n_heads=2,
                          head_dim=32, subsampling_conv_channels=32,
                          use_pallas=False)
    rng = np.random.default_rng(5)
    audio = rng.normal(size=(1, 80, 640)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 640)))
    lengths = np.array([640])

    oracle = get_attention_weights(model, variables, audio, lengths=lengths)
    summary = attention_summary(model, variables, audio, lengths=lengths,
                                row_block=32, top_k=4)
    assert len(summary) == len(oracle) == 2
    for probs, stats in zip(oracle, summary):
        ent_o = -(probs * np.log(np.maximum(probs, 1e-30))).sum(-1)
        np.testing.assert_allclose(stats["entropy"], ent_o, atol=1e-3,
                                   rtol=1e-3)
        Tp = probs.shape[-1]
        dist_o = (probs * np.abs(
            np.arange(Tp)[None, None, None, :]
            - np.arange(Tp)[None, None, :, None])).sum(-1)
        np.testing.assert_allclose(stats["expected_distance"], dist_o,
                                   atol=1e-2, rtol=1e-2)
        # top-1 column agrees with the oracle argmax
        np.testing.assert_array_equal(stats["topk_cols"][..., 0],
                                      probs.argmax(-1))

    # row capture for one layer equals the oracle's rows
    p_rows = attention_prob_rows(model, variables, audio, layer=1,
                                 rows=(8, 16), lengths=lengths)
    np.testing.assert_allclose(p_rows, oracle[1][:, :, 8:24], atol=1e-3,
                               rtol=1e-2)

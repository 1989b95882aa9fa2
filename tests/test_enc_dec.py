import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.models.enc_dec_sconformer import (
    EncDecSconformer,
    EncDecSconformerV2,
    calc_loss,
    generate_greedy,
    generate_greedy_cached,
    init_decoder_cache,
)

TINY = dict(
    vocab_size=32,
    d_model=64,
    n_layers=1,
    n_heads=2,
    head_dim=32,
    decoder_layers=1,
    subsampling_conv_channels=32,
    use_pallas=False,
)


@pytest.fixture(scope="module", params=["v1", "v2"])
def model_and_vars(request):
    cls = EncDecSconformer if request.param == "v1" else EncDecSconformerV2
    model = cls(**TINY)
    audio = jnp.zeros((2, 80, 128))
    text = jnp.zeros((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio, text_sequence=text)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 128))
    text = jnp.ones((2, 8), jnp.int32)
    out = model.apply(variables, audio, text_sequence=text)
    # ctc head: vocab+1 classes; lm head: vocab classes
    assert out["final_posteriors_ctc"].shape == (2, 16, 33)
    assert out["final_posteriors_lm"].shape == (2, 8, 32)
    assert out["a_hidden"].shape == (2, 16, 64)


def test_calc_loss_finite_and_weighted(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 80, 128)).astype(np.float32))
    text = jnp.asarray(rng.integers(3, 30, size=(2, 6)).astype(np.int32))
    a_lengths = jnp.array([128, 100])
    t_lengths = jnp.array([6, 4])
    out = calc_loss(model, variables, audio, text, a_lengths, t_lengths)
    assert np.isfinite(float(out["loss"]))
    assert float(out["ctc_loss"]) > 0 and float(out["lm_loss"]) > 0
    # pure-LM weighting drops the ctc term
    out_lm = calc_loss(
        model, variables, audio, text, a_lengths, t_lengths, ctc_loss_weight=0.0
    )
    np.testing.assert_allclose(
        float(out_lm["loss"]), float(out_lm["lm_loss"]), rtol=1e-6
    )


def test_generate_greedy_terminates(model_and_vars):
    model, variables = model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 128))
    ids = generate_greedy(model, variables, audio, max_generate=12, bos_id=2, eos_id=0)
    assert isinstance(ids, list) and len(ids) <= 12
    assert all(0 <= i < TINY["vocab_size"] for i in ids)


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_cached_step_logits_match_full_pass(model_and_vars):
    """Per-step logits from the KV-cached incremental decoder equal the full
    teacher-forced pass at every position (U=64 — the O(U) vs O(U²) contract,
    reference enc_dec_sconformer_v2.py:758-1026)."""
    model, variables = model_and_vars
    U = 64
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.normal(size=(1, 80, 128)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(2, 30, size=(1, U)).astype(np.int32))

    a_hidden, _, length = model.apply(variables, audio, method=model.encode)
    full_logits = model.apply(
        variables, tokens, a_hidden, length, method=model.generate_step
    )  # (1, U, V)

    pre = model.apply(variables, a_hidden, length, U, method=model.decoder_precompute)
    caches = init_decoder_cache(
        model.decoder_layers, model.n_heads, model.head_dim, batch=1, max_len=U
    )
    step_logits = []
    for t in range(U):
        logits_t, caches = model.apply(
            variables, tokens[:, t], t, caches, pre, length, method=model.decoder_step
        )
        step_logits.append(np.asarray(logits_t))
    step_logits = np.stack(step_logits, axis=1)  # (1, U, V)
    np.testing.assert_allclose(
        step_logits, np.asarray(full_logits), atol=2e-4, rtol=2e-4
    )


def test_generate_greedy_cached_matches_uncached(model_and_vars):
    model, variables = model_and_vars
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 128))
    ids_full = generate_greedy(model, variables, audio, max_generate=12, bos_id=2, eos_id=0)
    ids_cached = generate_greedy_cached(
        model, variables, audio, max_generate=12, bos_id=2, eos_id=0
    )
    assert ids_cached == ids_full


def test_calc_loss_train_mode_returns_batch_stats():
    """calc_loss(train=True) must run with mutable batch stats (the conv
    renorm writes running statistics) — it used to crash — and default its
    ctc weight from the MODEL."""
    model = EncDecSconformer(**TINY)
    audio = jnp.zeros((2, 80, 128))
    text = jnp.ones((2, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio, text_sequence=text)
    out = calc_loss(
        model, variables, audio, text,
        a_lengths=jnp.array([128, 100]), t_lengths=jnp.array([6, 4]),
        train=True,
    )
    assert np.isfinite(float(out["loss"]))
    assert "batch_stats" in out


def test_pos_bias_consistent_between_full_pass_and_cached_step():
    """use_dynamic_pos_bias with NON-cosine attention: the full causal pass
    must apply the bias exactly like the cached incremental step (it used to
    drop it), so cached and uncached greedy decoding agree."""
    model = EncDecSconformer(**{**TINY, "use_dynamic_pos_bias": True,
                                "cosine_attention": False})
    audio = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 128))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)),
                           jnp.zeros((1, 8), jnp.int32))
    ids_full = generate_greedy(model, variables, audio, max_generate=12)
    ids_cached = generate_greedy_cached(model, variables, audio, max_generate=12)
    assert ids_full == ids_cached


def test_decoder_depth_couples_to_encoder_depth_by_default():
    """References pass n_layers to the decoder; decoder_layers=None mirrors
    that."""
    kw = {k: v for k, v in TINY.items() if k != "decoder_layers"}
    model = EncDecSconformer(**{**kw, "n_layers": 2})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 128)),
                           jnp.zeros((1, 4), jnp.int32))
    dec = variables["params"]["language_model_decoder"]
    assert "self_norm_1" in dec and "self_norm_2" not in dec


def test_ctc_beam_search_internal_lm(model_and_vars):
    """Reference v2 ctc_beam_search hook (enc_dec_sconformer_v2.py:281-329):
    the model's own AED decoder drives the frame-synchronous beam search.
    With alpha=0 the decoder's scores carry zero weight, so the result must
    equal the search under a zero LM — certifying the adapter end to end
    (bos, blank placement, prefix batching, vocab layout)."""
    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM
    from lcasr_tpu.models.enc_dec_sconformer import ctc_beam_search

    model, variables = model_and_vars

    class _Tok:
        def vocab_size(self):
            return TINY["vocab_size"]

        def decode(self, ids):
            return " ".join(f"t{i}" for i in ids)

    tok = _Tok()
    rng = np.random.default_rng(7)
    audio = rng.normal(size=(1, 80, 128)).astype(np.float32)

    text = ctc_beam_search(
        model, variables, audio, tok, beam_width=4, alpha=0.0, beta=0.0,
        top_am_threshold=-6.0, prune_less_than_val=8.0,
    )
    assert isinstance(text, str)

    ctc_lp = np.asarray(
        model.apply(variables, jnp.asarray(audio))["final_posteriors_ctc"][0],
        np.float32,
    )
    zero_lm = HistoryLM(
        lambda hists: np.zeros((len(hists), TINY["vocab_size"])), bos_id=0
    )
    want = FrameSyncBeamSearch(
        lm=zero_lm, tokenizer=tok, beam_width=4, alpha=0.0, beta=0.0,
        blank_id=TINY["vocab_size"], top_am_threshold=-6.0,
        prune_less_than_val=8.0, bos_id=0,
    ).run_search(ctc_lp, decode=True)
    assert text == want

    # and with LM weight ON the hook still runs end to end
    text_lm = ctc_beam_search(
        model, variables, audio, tok, beam_width=4, alpha=0.45, beta=1.53,
    )
    assert isinstance(text_lm, str)

"""On-device frame-synchronous beam search vs the host implementation.

`decoding/frame_sync.py` (host loop + CachedTransformerLM) is itself
beam-for-beam parity-tested against the reference module; here it serves as
the oracle for the single-program `lax.scan` formulation in
`decoding/frame_sync_device.py` — same ids, same timestamps, and scores
matching to fp32-vs-fp64 accumulation tolerance, across penalty/pruning
configurations.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lcasr_tpu.decoding.frame_sync import (  # noqa: E402
    CachedTransformerLM,
    FrameSyncBeamSearch,
)
from lcasr_tpu.decoding.frame_sync_device import (  # noqa: E402
    DeviceFrameSyncBeamSearch,
    rescore_device,
)
from lcasr_tpu.models.lm import TransformerLM  # noqa: E402

V = 12  # LM vocab; AM classes = V + 1 (blank last)
C = V + 1
K_DEV = 12  # = V: every proposable id fits, so device == host by construction


@pytest.fixture(scope="module")
def lm_model_and_vars():
    model = TransformerLM(vocab_size=V, d_model=32, n_layers=2, n_heads=2, head_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, variables


def synth_log_probs(T, emit_rate, seed, boost=9.0):
    """Blank-dominated CTC posteriors with emission spikes — a trained
    model's shape, and what keeps the per-frame candidate set small."""
    rng = np.random.default_rng(seed)
    lp = rng.normal(size=(T, C)).astype(np.float32)
    blank = C - 1
    emit = rng.random(T) < emit_rate
    tok = rng.integers(1, C - 1, size=T)
    lp[np.arange(T), np.where(emit, tok, blank)] += boost
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def assert_candidates_bounded(lp, thresh):
    """Test precondition: the host candidate set never exceeds the device
    path's max_candidates, so the two searches see identical candidates."""
    n = ((lp > lp.max(-1, keepdims=True) + thresh) & (np.arange(C) >= 1)).sum(-1)
    assert n.max() <= K_DEV, int(n.max())


def run_both(lm_model_and_vars, lp, **kw):
    model, variables = lm_model_and_vars
    T = lp.shape[0]
    host = FrameSyncBeamSearch(
        lm=CachedTransformerLM(
            model, variables, width=kw["beam_width"], max_len=T + 2
        ),
        **kw,
    )
    host_ids = host.run_search(lp)
    dev = DeviceFrameSyncBeamSearch(
        model, variables, max_tokens=T + 2, max_candidates=K_DEV,
        frame_bucket=16, **kw,
    )
    dev_ids = dev.run_search(lp)
    return host, host_ids, dev, dev_ids


def test_device_matches_host_basic(lm_model_and_vars):
    lp = synth_log_probs(T=48, emit_rate=0.3, seed=1)
    kw = dict(beam_width=6, alpha=0.5, beta=0.2, top_am_threshold=-6.0, bos_id=2)
    assert_candidates_bounded(lp, -6.0)
    host, host_ids, dev, dev_ids = run_both(lm_model_and_vars, lp, **kw)
    assert dev_ids == host_ids
    best = host.beams[0]
    assert dev.timestamps == list(best.stimes[1:])
    np.testing.assert_allclose(dev.score, best.score, rtol=1e-4, atol=1e-3)


def test_device_matches_host_penalties_and_prune(lm_model_and_vars):
    lp = synth_log_probs(T=60, emit_rate=0.25, seed=7, boost=7.0)
    kw = dict(beam_width=5, alpha=0.4, beta=0.4, top_am_threshold=-5.0,
              blank_penalty=-0.4, repetition_penalty=-0.25,
              prune_less_than_val=6.0, bos_id=2)
    assert_candidates_bounded(lp, -5.0)
    host, host_ids, dev, dev_ids = run_both(lm_model_and_vars, lp, **kw)
    assert dev_ids == host_ids
    np.testing.assert_allclose(dev.score, host.beams[0].score, rtol=1e-4, atol=1e-3)


def test_device_matches_host_long_drift(lm_model_and_vars):
    """Multi-hundred-frame search: fp32 score accumulation must not flip
    merge/prune decisions on realistic blank-dominated posteriors."""
    lp = synth_log_probs(T=320, emit_rate=0.12, seed=3)
    kw = dict(beam_width=8, alpha=0.5, beta=0.3, top_am_threshold=-6.0,
              prune_less_than_val=8.0, bos_id=2)
    assert_candidates_bounded(lp, -6.0)
    host, host_ids, dev, dev_ids = run_both(lm_model_and_vars, lp, **kw)
    assert dev_ids == host_ids
    assert dev.timestamps == list(host.beams[0].stimes[1:])


def test_device_frame_bucket_padding_is_inert(lm_model_and_vars):
    """Results must not depend on the compile-shape bucket (pad frames
    produce no candidates)."""
    model, variables = lm_model_and_vars
    lp = synth_log_probs(T=37, emit_rate=0.3, seed=5)
    kw = dict(beam_width=4, alpha=0.5, beta=0.2, top_am_threshold=-6.0, bos_id=2)
    out = []
    for bucket in (16, 64, 37):
        dev = DeviceFrameSyncBeamSearch(
            model, variables, max_tokens=64, max_candidates=K_DEV,
            frame_bucket=bucket, **kw,
        )
        out.append((dev.run_search(lp), dev.timestamps, dev.score))
    assert out[0][:2] == out[1][:2] == out[2][:2]
    np.testing.assert_allclose(out[0][2], out[1][2], rtol=1e-6)


def test_rescore_device_multiple_recordings(lm_model_and_vars):
    """Batched search: recordings of DIFFERENT lengths share one scan (the
    shorter ones ride on inert pad frames) and each must match its own
    host search exactly."""
    model, variables = lm_model_and_vars
    recs = [synth_log_probs(T=T, emit_rate=0.3, seed=s)
            for T, s in ((40, 11), (23, 12), (33, 13))]
    kw = dict(beam_width=4, alpha=0.5, beta=0.2, top_am_threshold=-6.0, bos_id=2)
    dev_out = rescore_device(
        model, variables, recs, max_tokens=64, max_candidates=K_DEV,
        frame_bucket=16, batch_recordings=3, **kw,
    )
    for lp, ids in zip(recs, dev_out):
        host = FrameSyncBeamSearch(
            lm=CachedTransformerLM(model, variables, width=4, max_len=42), **kw
        )
        assert ids == host.run_search(lp)


def test_lm_rescore_cli_device_search_matches_host(tmp_path):
    """cli/lm_rescore beam --device_search decodes the same transcripts as
    the host frame_sync decoder (real 4096-class layout, blank-dominated
    logits so the bounded candidate set is exact)."""
    from lcasr_tpu.cli.lm_rescore import beam_stage
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.training import checkpointing

    tokenizer = load_tokenizer()
    vocab = tokenizer.vocab_size()
    lm_cfg = dict(vocab_size=vocab, d_model=32, n_layers=1, n_heads=2, head_dim=16)
    model = TransformerLM(**lm_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ckpt = checkpointing.save_checkpoint(
        str(tmp_path / "lm"), step=1, params=variables["params"],
        config=Config({"model_class": "TransformerLM", "model": lm_cfg}),
    )

    rng = np.random.default_rng(0)
    Cc = vocab + 1
    ldir = tmp_path / "logits"
    ldir.mkdir()
    for name, T, seed in (("rec1", 24, 1), ("rec2", 16, 2)):
        lp = rng.normal(size=(T, Cc)).astype(np.float32)
        emit = rng.random(T) < 0.4
        tok = rng.integers(1, Cc - 1, size=T)
        lp[np.arange(T), np.where(emit, tok, Cc - 1)] += 10.0
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        np.savez_compressed(ldir / f"{name}.npz", logits=lp.astype(np.float16),
                            gold="hello world")

    wer_host = beam_stage(str(ldir), alpha=0.3, beta=0.3, beam_width=4,
                          lm=ckpt, decoder="frame_sync")
    wer_dev = beam_stage(str(ldir), alpha=0.3, beta=0.3, beam_width=4,
                         lm=ckpt, decoder="frame_sync", device_search=True)
    assert wer_dev == wer_host


def test_device_token_capacity_guard(lm_model_and_vars):
    model, variables = lm_model_and_vars
    lp = synth_log_probs(T=40, emit_rate=0.9, seed=2)  # ~36 emits
    dev = DeviceFrameSyncBeamSearch(
        model, variables, beam_width=4, alpha=0.5, beta=0.2,
        top_am_threshold=-6.0, bos_id=2, max_tokens=8, max_candidates=K_DEV,
        frame_bucket=16,
    )
    with pytest.raises(RuntimeError, match="max_tokens"):
        dev.run_search(lp)

"""Frame-synchronous LM beam search vs the reference implementation.

The reference `lcasr/decoding/ctc_beam_search.py` is loaded as a test oracle
with a deterministic mock LM (full-history-dependent next-token log-probs
carried through the reference's own stacked-KV cache plumbing), and
`decoding/frame_sync.py` must produce identical sequences and scores.
"""
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

V = 12  # LM vocab (ids 0..11); AM classes = V + 1 (blank last)
C = V + 1


def fake_lm_scores(history):
    """Deterministic, genuinely history-dependent next-token log-probs."""
    seed = 0
    for tok in history:
        seed = (seed * 31 + int(tok) + 1) % 997
    v = np.sin(np.arange(V, dtype=np.float64) * 0.37 * (seed + 1))
    v = v - np.log(np.exp(v).sum())
    return v.astype(np.float64)


@pytest.fixture(scope="module")
def reference_search_cls():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import (
        install_reference_package_stubs,
        load_reference_module,
        reference_available,
    )

    if not reference_available():
        pytest.skip("reference checkout not present")
    install_reference_package_stubs()
    mod = load_reference_module("lcasr/decoding/ctc_beam_search.py", "ref_beam")
    return mod, torch


def _make_ref_mock_lm(torch, bos_id=2):
    """LanguageModel-compatible mock: the KV 'cache' stores raw token ids in
    the reference layout (l=1, kv=2, b, h=1, n, d=1), so the reference's own
    pad_sequence/rearrange/grab_state/trim_cache plumbing is exercised."""

    class MockLM:
        def __init__(self):
            self.bos_id = bos_id

        def get_initial_state(self):
            lps = torch.tensor(fake_lm_scores([self.bos_id]))
            cache = torch.zeros((1, 2, 1, 1, 1, 1), dtype=torch.float64)
            cache[0, :, 0, 0, 0, 0] = float(self.bos_id)
            state = {"cache": cache, "cache_lengths": torch.LongTensor([1])}
            return lps, state

        def __call__(self, input_ids, input_lengths, states):
            cache, clens = states["cache"], states["cache_lengths"]
            B = input_ids.shape[0]
            n = cache.shape[4]
            new_cache = torch.zeros((1, 2, B, 1, n + 1, 1), dtype=torch.float64)
            new_cache[:, :, :, :, :n] = cache
            lps = torch.zeros((B, 1, V), dtype=torch.float64)
            for b in range(B):
                ln = int(clens[b])
                hist = [int(cache[0, 0, b, 0, j, 0]) for j in range(ln)]
                tok = int(input_ids[b, 0])
                hist.append(tok)
                new_cache[0, :, b, 0, ln, 0] = float(tok)
                lps[b, 0] = torch.tensor(fake_lm_scores(hist))
            return lps, {"cache": new_cache, "cache_lengths": clens + 1}

    return MockLM()


class _Tok:
    def vocab_size(self):
        return V

    def decode(self, ids):
        return " ".join(map(str, ids))


@pytest.mark.parametrize("prune_val", [None, 8.0])
def test_frame_sync_matches_reference(reference_search_cls, prune_val):
    mod, torch = reference_search_cls
    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM

    rng = np.random.default_rng(0)
    T = 24
    logits = rng.normal(size=(T, C)) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    ref = mod.BeamSearch(
        tokenizer=_Tok(),
        beam_width=8,
        log_probs=torch.tensor(log_probs, dtype=torch.float64),
        language_model=_make_ref_mock_lm(torch),
        alpha=0.4,
        beta=0.4,
        blank_id=C - 1,
        top_am_threshold=-6,
        prune_less_than_val=prune_val,
    )
    ref.run_search(use_tqdm=False)
    ref_beams = [(tuple(b.am_sequence), float(b.score)) for b in ref.beams]

    mine = FrameSyncBeamSearch(
        lm=HistoryLM(
            lambda hists: np.stack([fake_lm_scores(h) for h in hists]),
            bos_id=2,
        ),
        tokenizer=_Tok(),
        beam_width=8,
        alpha=0.4,
        beta=0.4,
        blank_id=C - 1,
        top_am_threshold=-6,
        prune_less_than_val=prune_val,
        bos_id=2,
    )
    ids = mine.run_search(log_probs)
    my_beams = [(tuple(b.am_sequence), float(b.score)) for b in mine.beams]

    assert len(ref_beams) == len(my_beams)
    for (ra, rs), (ma, ms) in zip(ref_beams, my_beams):
        assert ra == ma
        assert math.isclose(rs, ms, rel_tol=1e-9, abs_tol=1e-9)
    # best hypothesis ids match the reference lm_sequence
    assert ids == list(ref.beams[0].lm_sequence[1:])


@pytest.mark.slow  # fast-tier budget: covered by fast-tier siblings
def test_cached_transformer_lm_matches_full_forward():
    """Per-beam KV-cached single-token stepping == full-context forward."""
    from lcasr_tpu.models.lm import TransformerLM

    model = TransformerLM(vocab_size=V, d_model=32, n_layers=2, n_heads=2, head_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    rng = np.random.default_rng(1)
    seq = [2] + rng.integers(1, V, size=6).tolist()

    # full forward next-token lps at every position
    full = model.apply(variables, jnp.asarray([seq], jnp.int32))
    full_lps = np.asarray(jax.nn.log_softmax(full[0].astype(jnp.float32), -1))

    # cached stepping, one token at a time
    L, H, D = model.n_layers, model.n_heads, model.head_dim
    cache = jnp.zeros((L, 2, 1, H, len(seq) + 1, D), jnp.float32)
    lengths = jnp.zeros((1,), jnp.int32)
    for u, tok in enumerate(seq):
        logits, cache, lengths = model.apply(
            variables, jnp.asarray([[tok]], jnp.int32),
            cache=cache, cache_lengths=lengths,
        )
        step_lps = np.asarray(
            jax.nn.log_softmax(logits[0, 0].astype(jnp.float32), -1)
        )
        np.testing.assert_allclose(step_lps, full_lps[u], atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_frame_sync_with_cached_lm_matches_history_lm():
    """The on-device KV-cache BatchedCachedLM drives the search to the same
    result as recomputing every prefix from scratch."""
    from lcasr_tpu.decoding.frame_sync import (
        CachedTransformerLM,
        FrameSyncBeamSearch,
        HistoryLM,
    )
    from lcasr_tpu.models.lm import TransformerLM

    model = TransformerLM(vocab_size=V, d_model=32, n_layers=2, n_heads=2, head_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    def full_fn(hists):
        U = max(len(h) for h in hists)
        toks = np.zeros((len(hists), U), np.int32)
        last = []
        for i, h in enumerate(hists):
            toks[i, : len(h)] = h
            last.append(len(h) - 1)
        logits = model.apply(variables, jnp.asarray(toks))
        lps = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return np.asarray(lps)[np.arange(len(hists)), last]

    rng = np.random.default_rng(2)
    T = 12
    logits = rng.normal(size=(T, C)) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    kw = dict(beam_width=6, alpha=0.5, beta=0.2, blank_id=C - 1,
              top_am_threshold=-6, bos_id=2)
    ids_hist = FrameSyncBeamSearch(
        lm=HistoryLM(full_fn, bos_id=2), **kw
    ).run_search(log_probs)
    ids_cached = FrameSyncBeamSearch(
        lm=CachedTransformerLM(model, variables, width=6, max_len=T + 2),
        **kw,
    ).run_search(log_probs)
    assert ids_hist == ids_cached


def test_lm_rescore_cli_loads_lm_checkpoint(tmp_path):
    """cli/lm_rescore beam stage loads a trained TransformerLM checkpoint
    (the r1 NotImplementedError is gone) and runs both decoders."""
    from lcasr_tpu.cli.lm_rescore import beam_stage, load_lm_checkpoint
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.lm import TransformerLM
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
    m2, v2 = load_lm_checkpoint(ckpt)
    assert m2.d_model == 32

    # one tiny fake logits recording
    rng = np.random.default_rng(0)
    T, Cc = 10, vocab + 1
    logits = rng.normal(size=(T, Cc)).astype(np.float32) * 2
    logits = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ldir = tmp_path / "logits"
    ldir.mkdir()
    np.savez_compressed(ldir / "rec1.npz", logits=logits.astype(np.float16),
                        gold="hello world")

    np.savez_compressed(ldir / "rec2.npz", logits=logits[:8].astype(np.float16),
                        gold="hello again")

    for decoder in ["prefix", "frame_sync"]:
        wer = beam_stage(str(ldir), alpha=0.3, beta=0.3, beam_width=4,
                         lm=ckpt, decoder=decoder)
        assert np.isfinite(wer)

    # batched multi-recording rescoring through the CLI must agree with the
    # serial frame_sync path
    wer_par = beam_stage(str(ldir), alpha=0.3, beta=0.3, beam_width=4,
                         lm=ckpt, decoder="frame_sync", parallel_recordings=2)
    assert wer_par == wer

def test_rescore_many_matches_per_recording_history_lm():
    """`rescore_many` (N searches in lockstep off ONE wide LM — the
    TPU-native replacement for the reference's ray fan-out,
    tlm_beam.py:55-61) must produce EXACTLY the per-recording `run_search`
    results: the per-row LM math is row-independent, so batching across
    recordings is a pure scheduling change.  Recordings of different
    lengths + a wave smaller than the recording count exercise the
    finished-slot identity rows and the multi-wave path."""
    from lcasr_tpu.decoding.frame_sync import (
        FrameSyncBeamSearch,
        HistoryLM,
        rescore_many,
    )

    fn = lambda hists: np.stack([fake_lm_scores(h) for h in hists])  # noqa: E731
    rng = np.random.default_rng(3)
    recs = []
    for T in (18, 7, 25):
        lg = rng.normal(size=(T, C)) * 2.0
        recs.append(lg - np.log(np.exp(lg).sum(-1, keepdims=True)))

    kw = dict(beam_width=5, alpha=0.4, beta=0.4, blank_id=C - 1,
              top_am_threshold=-6, prune_less_than_val=8.0, bos_id=2)
    serial = [
        FrameSyncBeamSearch(lm=HistoryLM(fn, bos_id=2), **kw).run_search(lp)
        for lp in recs
    ]
    batched = rescore_many(HistoryLM(fn, bos_id=2), recs, n_slots=2, **kw)
    assert batched == serial


def test_rescore_many_matches_per_recording_cached_lm():
    """Same lockstep-batching parity through the real on-device KV-cached
    TransformerLM (wide cache: slot r owns rows [rW, (r+1)W))."""
    from lcasr_tpu.decoding.frame_sync import (
        CachedTransformerLM,
        FrameSyncBeamSearch,
        rescore_many,
    )
    from lcasr_tpu.models.lm import TransformerLM

    model = TransformerLM(vocab_size=V, d_model=32, n_layers=2, n_heads=2,
                          head_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    rng = np.random.default_rng(4)
    recs = []
    for T in (14, 9):
        lg = rng.normal(size=(T, C)) * 2.0
        recs.append(lg - np.log(np.exp(lg).sum(-1, keepdims=True)))

    W = 4
    kw = dict(beam_width=W, alpha=0.5, beta=0.2, blank_id=C - 1,
              top_am_threshold=-6, bos_id=2)
    max_len = max(r.shape[0] for r in recs) + 2
    serial = [
        FrameSyncBeamSearch(
            lm=CachedTransformerLM(model, variables, width=W, max_len=max_len),
            **kw,
        ).run_search(lp)
        for lp in recs
    ]
    wide = CachedTransformerLM(model, variables, width=2 * W, max_len=max_len)
    batched = rescore_many(wide, recs, n_slots=2, **kw)
    assert batched == serial


def test_rescore_many_handles_recording_with_no_lm_steps():
    """A recording whose frames never emit (all-blank posteriors) finishes
    at generator prime time — its slot must drop out cleanly (identity
    parent rows thereafter) while other recordings keep decoding."""
    from lcasr_tpu.decoding.frame_sync import (
        FrameSyncBeamSearch,
        HistoryLM,
        rescore_many,
    )

    fn = lambda hists: np.stack([fake_lm_scores(h) for h in hists])  # noqa: E731
    rng = np.random.default_rng(5)
    # recording 0: blank wins every frame by a margin beyond the AM threshold
    silent = np.full((10, C), -20.0)
    silent[:, C - 1] = 0.0
    silent = silent - np.log(np.exp(silent).sum(-1, keepdims=True))
    noisy = rng.normal(size=(16, C)) * 2.0
    noisy = noisy - np.log(np.exp(noisy).sum(-1, keepdims=True))
    recs = [silent, noisy]

    kw = dict(beam_width=4, alpha=0.4, beta=0.4, blank_id=C - 1,
              top_am_threshold=-6, bos_id=2)
    serial = [
        FrameSyncBeamSearch(lm=HistoryLM(fn, bos_id=2), **kw).run_search(lp)
        for lp in recs
    ]
    assert serial[0] == []  # silent recording decodes to nothing
    batched = rescore_many(HistoryLM(fn, bos_id=2), recs, n_slots=2, **kw)
    assert batched == serial


def test_lm_rescore_cli_grid_sweep(tmp_path, monkeypatch, capsys):
    """`-alpha a1,a2` sweeps a grid in one command (reference scripts/*.sh
    loops) and reports the best (wer, alpha, beta) point."""
    import sys

    from lcasr_tpu.cli import lm_rescore
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.lm import TransformerLM
    from lcasr_tpu.training import checkpointing

    tok = load_tokenizer()
    vocab = tok.vocab_size()
    lm_cfg = dict(vocab_size=vocab, d_model=32, n_layers=1, n_heads=2, head_dim=16)
    model = TransformerLM(**lm_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ckpt = checkpointing.save_checkpoint(
        str(tmp_path / "lm"), step=1, params=variables["params"],
        config=Config({"model_class": "TransformerLM", "model": lm_cfg}),
    )
    rng = np.random.default_rng(0)
    lg = rng.normal(size=(8, vocab + 1)).astype(np.float32) * 2
    lg = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    ldir = tmp_path / "logits"
    ldir.mkdir()
    np.savez_compressed(ldir / "rec.npz", logits=lg.astype(np.float16), gold="hi")

    monkeypatch.setattr(sys, "argv", [
        "lm_rescore", "beam", "-i", str(ldir), "-alpha", "0.2,0.5",
        "-beta", "0.3", "-beam_width", "3", "-lm", ckpt,
        "-decoder", "frame_sync",
    ])
    lm_rescore.main()
    out = capsys.readouterr().out
    import json as _json

    best = _json.loads([l for l in out.splitlines() if "best_wer" in l][-1])
    assert best["grid_points"] == 2 and best["alpha"] in (0.2, 0.5)


def test_rescore_many_device_call_count_is_max_not_sum():
    """The throughput mechanism itself: serial rescoring pays SUM of the
    per-recording LM-step counts in device round trips; the lockstep driver
    pays MAX (each tick serves every blocked search at once).  This is the
    structural guarantee behind the ~N x batched-rescoring speedup on a
    dispatch-latency-bound link."""
    from lcasr_tpu.decoding.frame_sync import (
        FrameSyncBeamSearch,
        HistoryLM,
        rescore_many,
    )

    class CountingLM(HistoryLM):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.steps = 0

        def step(self, state, parent_idx, tokens, update_mask):
            self.steps += 1
            return super().step(state, parent_idx, tokens, update_mask)

    fn = lambda hists: np.stack([fake_lm_scores(h) for h in hists])  # noqa: E731
    rng = np.random.default_rng(6)
    recs = []
    for T in (30, 14, 22):
        lg = rng.normal(size=(T, C)) * 2.0
        recs.append(lg - np.log(np.exp(lg).sum(-1, keepdims=True)))

    kw = dict(beam_width=4, alpha=0.4, beta=0.4, blank_id=C - 1,
              top_am_threshold=-6, bos_id=2)
    per_rec = []
    for lp in recs:
        lm = CountingLM(fn, bos_id=2)
        FrameSyncBeamSearch(lm=lm, **kw).run_search(lp)
        per_rec.append(lm.steps)
    assert all(n > 0 for n in per_rec)

    wide = CountingLM(fn, bos_id=2)
    rescore_many(wide, recs, n_slots=len(recs), **kw)
    assert wide.steps == max(per_rec), (wide.steps, per_rec)


def test_frame_sync_survives_candidate_less_frame():
    """A frame whose argmax is id 0 (pad — never proposed) with every other
    id below the AM threshold must carry the beams over unchanged instead
    of emptying the beam set and crashing the next frame (r3 self-review)."""
    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM

    fn = lambda hists: np.stack([fake_lm_scores(h) for h in hists])  # noqa: E731
    rng = np.random.default_rng(7)
    lg = rng.normal(size=(6, C)) * 2.0
    lp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    # frame 2: all mass on id 0, everything else 20 nats below
    lp[2] = -20.0
    lp[2, 0] = 0.0
    lp[2] = lp[2] - np.log(np.exp(lp[2]).sum())

    kw = dict(beam_width=4, alpha=0.4, beta=0.4, blank_id=C - 1,
              top_am_threshold=-6, bos_id=2)
    ids = FrameSyncBeamSearch(lm=HistoryLM(fn, bos_id=2), **kw).run_search(lp)
    assert isinstance(ids, list)

    # and the skipped frame is equivalent to that frame not existing
    lp_without = np.concatenate([lp[:2], lp[3:]])
    ids_without = FrameSyncBeamSearch(
        lm=HistoryLM(fn, bos_id=2), **kw
    ).run_search(lp_without)
    assert ids == ids_without


def test_frame_sync_matches_reference_with_cache_trim(reference_search_cls):
    """max_cache_length parity: the reference trims the LM context AFTER
    scoring (trim_cache, :176-193); trimming before scoring diverges
    beam-for-beam."""
    mod, torch = reference_search_cls
    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM

    rng = np.random.default_rng(0)
    T = 24
    logits = rng.normal(size=(T, C)) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    ref = mod.BeamSearch(
        tokenizer=_Tok(), beam_width=8,
        log_probs=torch.tensor(log_probs, dtype=torch.float64),
        language_model=_make_ref_mock_lm(torch),
        alpha=0.4, beta=0.4, blank_id=C - 1, top_am_threshold=-6,
        max_cache_length=3,
    )
    ref.run_search(use_tqdm=False)
    ref_beams = [(tuple(b.am_sequence), float(b.score)) for b in ref.beams]

    mine = FrameSyncBeamSearch(
        lm=HistoryLM(
            lambda hists: np.stack([fake_lm_scores(h) for h in hists]),
            bos_id=2, max_cache_length=3,
        ),
        tokenizer=_Tok(), beam_width=8, alpha=0.4, beta=0.4,
        blank_id=C - 1, top_am_threshold=-6, bos_id=2,
    )
    mine.run_search(log_probs)
    my_beams = [(tuple(b.am_sequence), float(b.score)) for b in mine.beams]

    assert len(ref_beams) == len(my_beams)
    for (ra, rs), (ma, ms) in zip(ref_beams, my_beams):
        assert ra == ma
        assert math.isclose(rs, ms, rel_tol=1e-9, abs_tol=1e-9)


def test_cached_lm_overflow_raises():
    """A beam exceeding the KV cache capacity must fail loudly, not score
    silently wrong (the device write mask just stops writing)."""
    import jax

    from lcasr_tpu.decoding.frame_sync import CachedTransformerLM
    from lcasr_tpu.models.lm import TransformerLM

    lm = TransformerLM(vocab_size=V, d_model=32, n_layers=1, n_heads=2,
                       head_dim=16)
    variables = lm.init(jax.random.PRNGKey(0), np.zeros((1, 4), np.int32))
    clm = CachedTransformerLM(lm, variables, width=2, max_len=2)
    state, _ = clm.init(2)
    parent = np.array([0, 1])
    tok = np.array([3, 4])
    upd = np.array([True, True])
    state, _ = clm.step(state, parent, tok, upd)  # len 2
    state, _ = clm.step(state, parent, tok, upd)  # len 3 == max_len + 1 (ok)
    with pytest.raises(RuntimeError, match="KV cache overflow"):
        clm.step(state, parent, tok, upd)  # would need slot 4


def test_vocab_layout_guard_raises():
    """Non-blank candidate ids past the LM vocab must be refused, not
    silently clipped onto the wrong LM column."""
    from lcasr_tpu.decoding.frame_sync import FrameSyncBeamSearch, HistoryLM

    lm = HistoryLM(lambda hists: np.zeros((len(hists), V)), bos_id=2)
    # blank placed mid-vocab: id C-1 becomes a REAL emit candidate > LM vocab
    search = FrameSyncBeamSearch(lm=lm, beam_width=4, blank_id=3, bos_id=2)
    log_probs = np.log(np.full((4, V + 1), 1.0 / (V + 1)))
    with pytest.raises(ValueError, match="only a trailing blank"):
        search.run_search(log_probs)

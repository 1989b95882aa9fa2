"""Online (streaming-input) transcriber: incremental mel parity with the
offline frontend, and finalized-output exactness vs a full-recording forward
for a local-attention model whose receptive field fits the window margins."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.data.audio import mel_spectrogram
from lcasr_tpu.models.sconformer_xl import SCConformerXL
from lcasr_tpu.serving import OnlineTranscriber

TINY = dict(
    vocab_size=16,
    d_model=64,
    n_layers=1,
    n_heads=2,
    head_dim=32,
    subsampling_conv_channels=32,
    attention_window_size=4,  # local attention → bounded receptive field
    use_pallas=False,
)


class _IdTokenizer:
    """Integer-token stand-in: decode = space-joined ids."""

    def vocab_size(self):
        return TINY["vocab_size"]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def model_and_vars():
    model = SCConformerXL(**TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 256)))
    return model, variables


def _random_wave(seconds, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(int(16000 * seconds),)).astype(np.float32)


def _feed_in_chunks(tr, wave, seed):
    rng = np.random.default_rng(seed)
    pieces, pos = [], 0
    while pos < len(wave):
        n = int(rng.integers(800, 24000))
        pieces.append(tr.feed(wave[pos : pos + n]))
        pos += n
    pieces.append(tr.finish())
    return pieces


def test_incremental_mel_matches_offline_frontend(model_and_vars):
    model, variables = model_and_vars
    wave = _random_wave(3.0, 0)
    tr = OnlineTranscriber(model, variables, _IdTokenizer(), context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="none")
    _feed_in_chunks(tr, wave, 1)
    offline = np.asarray(mel_spectrogram(jnp.asarray(wave),
                                         global_normalisation=False))[0]
    assert tr._mel.shape == offline.shape
    np.testing.assert_allclose(tr._mel, offline, rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # fast-tier budget: covered by fast-tier siblings
def test_streamed_transcript_matches_full_forward(model_and_vars):
    """Final transcript == offline greedy over ONE full-recording forward:
    the window margins (ctx - stride - delay = 256 frames left, delay = 128
    right) exceed the 1-layer local-attention receptive field, so finalized
    logits are argmax-exact."""
    model, variables = model_and_vars
    wave = _random_wave(8.0, 2)  # 801 frames: windows slide past the start
    tok = _IdTokenizer()
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="none")
    pieces = _feed_in_chunks(tr, wave, 3)

    # offline: the offline frontend's (unnormalized) mel through one full
    # forward (incremental-mel parity is covered by the test above; tr._mel
    # is trimmed to the live window, so it cannot be used here)
    mel = np.asarray(mel_spectrogram(jnp.asarray(wave),
                                     global_normalisation=False))[0]
    out = model.apply(variables, jnp.asarray(mel[None]),
                      length=jnp.asarray([mel.shape[1]], np.int32))
    lp = np.asarray(out["final_posteriors"])[0, : int(out["length"][0])]
    blank = tok.vocab_size()
    ids, prev = [], blank
    for i in lp.argmax(-1).tolist():
        if i != blank and i != prev:
            ids.append(i)
        prev = i

    assert tr.text == tok.decode(ids)
    # emitted deltas concatenate to the final transcript (monotone emission)
    assert "".join(pieces) == tr.text
    # and the stream actually emitted something before finish()
    assert any(p for p in pieces[:-1])


def test_running_normalization_converges(model_and_vars):
    """Running-stat normalization approaches the offline per-recording
    normalizer as the stream grows (same argmax transcript here)."""
    model, variables = model_and_vars
    wave = _random_wave(6.0, 4)
    tok = _IdTokenizer()
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running")
    _feed_in_chunks(tr, wave, 5)
    n = tr._n_mel
    mean = tr._mel_sum / n
    var = (tr._mel_sumsq - n * mean**2) / (n - 1)
    offline = np.asarray(mel_spectrogram(jnp.asarray(wave)))[0]
    unnorm = np.asarray(mel_spectrogram(jnp.asarray(wave),
                                        global_normalisation=False))[0]
    online_full = (unnorm - mean[:, None]) / (np.sqrt(var)[:, None] + tr.eps)
    # final running stats == offline global stats (same formula, whole stream)
    np.testing.assert_allclose(online_full, offline, rtol=1e-3, atol=1e-3)
    assert isinstance(tr.text, str)


def test_streaming_with_real_tokenizer(model_and_vars):
    """Drive the real BPE tokenizer through the streaming API: deltas
    concatenate to the final transcript."""
    from lcasr_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer()
    model = SCConformerXL(**{**TINY, "vocab_size": tok.vocab_size()})
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 256)))
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running")
    pieces = _feed_in_chunks(tr, _random_wave(5.0, 6), 7)
    assert "".join(pieces) == tr.text


def test_finish_on_tiny_stream_does_not_crash(model_and_vars):
    """Streams shorter than the STFT padding must not crash finish() (the
    end-reflection used to produce negative sample indices); a 6 ms stream
    still yields one mel frame, so SOME output is legitimate."""
    model, variables = model_and_vars
    tr = OnlineTranscriber(model, variables, _IdTokenizer(), context_frames=512,
                           stride_frames=128, right_delay_frames=128)
    assert tr.feed(np.zeros(100, np.float32)) == ""
    out = tr.finish()
    assert isinstance(out, str) and out == tr.text

    # sub-2-sample stream: nothing to transcribe at all
    tr2 = OnlineTranscriber(model, variables, _IdTokenizer(), context_frames=512,
                            stride_frames=128, right_delay_frames=128)
    tr2.feed(np.zeros(1, np.float32))
    assert tr2.finish() == ""
    assert tr2.text == ""


def test_single_compiled_shape_for_whole_stream(model_and_vars):
    """The forward must see ONE (1, 80, ctx) shape for the entire stream —
    including the final flush when total frames exceed ctx and are not a
    multiple of the subsampling factor (801 frames here)."""
    model, variables = model_and_vars
    tr = OnlineTranscriber(model, variables, _IdTokenizer(), context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="none", max_batch_strides=1)
    shapes = set()
    inner = tr._forward

    def spy(variables, window, length, scale=None):
        shapes.add(tuple(window.shape))
        return inner(variables, window, length, scale)

    tr._forward = spy
    _feed_in_chunks(tr, _random_wave(8.0, 2), 3)
    assert shapes == {(1, 80, 512)}


def test_buffers_stay_bounded(model_and_vars):
    """Consumed samples/mel are dropped: memory must not grow with stream
    length (only the live decode window + lookback is retained)."""
    model, variables = model_and_vars
    tr = OnlineTranscriber(model, variables, _IdTokenizer(), context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="none")
    wave = _random_wave(20.0, 10)  # 2001 frames >> ctx
    for pos in range(0, len(wave), 8000):
        tr.feed(wave[pos : pos + 8000])
        # mel kept: at most ctx behind the frontier + un-finalized backlog
        assert tr._mel.shape[1] <= 512 + 128 + 128 + 16
        # samples kept: one frame's lookback + one feed chunk + STFT pad
        assert len(tr._samples) <= 8000 + 2 * 256 + 160
    tr.finish()


# ---------------- batched multi-stream server ----------------

def test_server_matches_single_stream(model_and_vars):
    """N interleaved server sessions produce exactly the transcripts the
    single-stream OnlineTranscriber produces for the same audio."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    tok = _IdTokenizer()
    rng = np.random.default_rng(7)
    kw = dict(context_frames=128, stride_frames=32, right_delay_frames=32)

    streams = [
        rng.normal(size=(16000 * s,)).astype(np.float32) * 0.1
        for s in (2, 3, 1)
    ]
    singles = []
    for audio in streams:
        t = OnlineTranscriber(model, variables, tok, norm="running", **kw)
        t.feed(audio)
        t.finish()
        singles.append(t.text)

    server = TranscriptionServer(model, variables, tok, max_streams=4, **kw)
    sids = [server.open() for _ in streams]
    # interleave ragged chunks; collect deltas per session
    got = {sid: "" for sid in sids}
    chunk = 4000
    pos = [0] * len(streams)
    tick = 0
    while any(p < len(a) for p, a in zip(pos, streams)):
        # alternate eager pumping with the event-loop pattern (ingest all,
        # pump once) — transcripts must be identical either way
        eager = tick % 2 == 0
        for i, sid in enumerate(sids):
            if pos[i] < len(streams[i]):
                got[sid] += server.feed(
                    sid, streams[i][pos[i] : pos[i] + chunk], pump=eager)
                pos[i] += chunk
        if not eager:
            server.pump()
            for sid in sids:
                got[sid] += server.poll(sid)
        tick += 1
    # finish in a different order than opened
    for i in (1, 2, 0):
        got[sids[i]] += server.poll(sids[i])
        got[sids[i]] += server.finish(sids[i])
    assert server.n_open == 0
    for i, sid in enumerate(sids):
        assert got[sid] == singles[i], (i, got[sid], singles[i])


def test_server_ingest_only_feed_never_drains(model_and_vars):
    """feed(pump=False) is a pure ingest: it must return "" and must NOT
    drain the session's delta buffer (regression: it used to _take() the
    buffer, so text finalized for this session by ANOTHER session's
    finish() between polls was returned to a caller that discards the
    ingest-only return — the CLI loop — and silently dropped)."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    tok = _IdTokenizer()
    rng = np.random.default_rng(13)
    kw = dict(context_frames=128, stride_frames=32, right_delay_frames=32)

    # unequal lengths: the short stream's finish() pumps mid-tick and can
    # finalize text for the long stream between the long stream's polls
    streams = [rng.normal(size=(16000 * s,)).astype(np.float32) * 0.1
               for s in (3, 1)]
    chunk = 4000
    # singles fed at the SAME chunk granularity: running normalization is
    # cumulative over frames ingested so far, so feed granularity is part
    # of the (documented) semantics
    singles = []
    for audio in streams:
        t = OnlineTranscriber(model, variables, tok, norm="running", **kw)
        for p in range(0, len(audio), chunk):
            t.feed(audio[p : p + chunk])
        t.finish()
        singles.append(t.text)

    server = TranscriptionServer(model, variables, tok, max_streams=2, **kw)
    sids = [server.open() for _ in streams]
    got = {sid: "" for sid in sids}
    pos, open_ = 0, set(range(len(streams)))
    while open_:  # exactly the CLI loop: discard the pump=False return
        for i in sorted(open_):
            if pos < len(streams[i]):
                ret = server.feed(sids[i], streams[i][pos : pos + chunk],
                                  pump=False)
                assert ret == ""  # ingest-only: nothing may come back here
        server.pump()
        pos += chunk
        for i in sorted(open_):
            got[sids[i]] += server.poll(sids[i])
            if pos >= len(streams[i]):
                got[sids[i]] += server.finish(sids[i])
                open_.discard(i)
    for i, sid in enumerate(sids):
        assert got[sid] == singles[i], (i, got[sid], singles[i])


def test_server_capacity_and_slot_reuse(model_and_vars):
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    server = TranscriptionServer(
        model, variables, _IdTokenizer(), max_streams=2,
        context_frames=128, stride_frames=32, right_delay_frames=32,
    )
    a, b = server.open(), server.open()
    with pytest.raises(RuntimeError, match="capacity"):
        server.open()
    server.finish(a)
    c = server.open()  # slot freed
    assert server.n_open == 2
    for sid in (b, c):
        server.finish(sid)
    with pytest.raises(KeyError):
        server.feed(a, np.zeros(100, np.float32))


def test_server_one_compiled_shape(model_and_vars, monkeypatch):
    """The server compiles exactly ONE program regardless of how many
    sessions run or how ragged their feeds are."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    server = TranscriptionServer(
        model, variables, _IdTokenizer(), max_streams=3,
        context_frames=128, stride_frames=32, right_delay_frames=32,
    )
    calls = []
    inner_full = server._forward_full
    inner_delta = server._forward_delta

    def spy_full(variables, buf, rows, due, scale, mean, std, lengths):
        calls.append(("full", rows.shape, lengths.shape))
        return inner_full(variables, buf, rows, due, scale, mean, std, lengths)

    def spy_delta(variables, buf, deltas, due, scale, mean, std, lengths):
        calls.append(("delta", deltas.shape, lengths.shape))
        return inner_delta(variables, buf, deltas, due, scale, mean, std, lengths)

    server._forward_full = spy_full
    server._forward_delta = spy_delta
    rng = np.random.default_rng(0)
    sids = [server.open() for _ in range(3)]
    for _ in range(3):  # 3 s/session: windows fill, steady state reached
        for sid in sids:
            server.feed(sid, rng.normal(size=(16000,)).astype(np.float32))
    for sid in sids:
        server.finish(sid)
    # exactly TWO programs: the full (S, 80, ctx) ramp-in/flush wave and
    # the (S, 80, stride) delta wave — each at one fixed shape
    fulls = [c for c in calls if c[0] == "full"]
    deltas = [c for c in calls if c[0] == "delta"]
    assert fulls and all(c == fulls[0] for c in fulls)
    assert fulls[0][1] == (3, 80, 128)
    # lockstep 1-s feeds MUST hit the steady-state delta waves
    assert deltas and all(c == deltas[0] for c in deltas)
    assert deltas[0][1] == (3, 80, 32)


@pytest.mark.parametrize("transfer_dtype", ["bfloat16", "int8"])
def test_server_compressed_transfer_matches_float32(model_and_vars,
                                                    transfer_dtype):
    """bf16/int8 wave uploads keep the greedy transcripts at the tiny-model
    scale (the decode path's transfer_dtype machinery; WER-certified on a
    trained model in the closed loop)."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    tok = _IdTokenizer()
    kw = dict(max_streams=2, context_frames=128, stride_frames=32,
              right_delay_frames=32)
    rng = np.random.default_rng(3)
    streams = [rng.normal(size=(16000 * 2,)).astype(np.float32) * 0.1
               for _ in range(2)]

    def run(dtype):
        srv = TranscriptionServer(model, variables, tok,
                                  transfer_dtype=dtype, **kw)
        sids = [srv.open() for _ in streams]
        out = {}
        for sid, a in zip(sids, streams):
            srv.feed(sid, a)
        for sid in sids:
            out[sid - sids[0]] = srv.text(sid) + srv.finish(sid)
        return out

    assert run(transfer_dtype) == run("float32")


def test_word_timestamps(model_and_vars):
    """`words` yields {'word','start','end'} entries whose words join back
    to the transcript, with monotonically non-decreasing, in-stream times."""
    from lcasr_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer()
    model = SCConformerXL(**{**TINY, "vocab_size": tok.vocab_size()})
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 256)))
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running")
    wave = _random_wave(6.0, 9)
    tr.feed(wave)
    tr.finish()
    words = tr.words
    assert words, "random-weight decode should emit something"
    joined = " ".join(w["word"] for w in words)
    assert joined == tr.text.strip(), (joined, tr.text)
    audio_s = len(wave) / 16000
    prev_start = 0.0
    for w in words:
        assert 0.0 <= w["start"] < w["end"] <= audio_s + 1.0, w
        assert w["start"] >= prev_start
        prev_start = w["start"]


def test_beam_serving_matches_offline(model_and_vars):
    """decoder='beam': the final streamed transcript equals the offline
    prefix beam search over the full-recording logits (the finalized rows
    are exact by the finalization contract), and mid-stream deltas
    concatenate to it."""
    from lcasr_tpu.decoding.beam_search import BeamSearch

    model, variables = model_and_vars
    tok = _IdTokenizer()
    wave = _random_wave(4.0, 11)
    opts = dict(beam_width=4, alpha=0.0, beta=0.0)

    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running", decoder="beam", beam_opts=opts)
    pieces = [tr.feed(c) for c in np.array_split(wave, 7)]
    pieces.append(tr.finish())

    # offline: full forward over the identically-normalized full mel
    spec = mel_spectrogram(wave[None])
    mean = np.asarray(spec).mean(axis=(0, 2), keepdims=True)
    std = np.asarray(spec).std(axis=(0, 2), ddof=1, keepdims=True) + 1e-8
    out = model.apply(variables, (np.asarray(spec) - mean) / std)
    lp = np.asarray(out["final_posteriors"][0], np.float32)
    bs = BeamSearch(tokenizer=tok, blank_id=tok.vocab_size(), pad_id=0,
                    **opts)
    offline = bs.run_search(lp)

    assert tr.text == offline, (tr.text, offline)
    # deltas append corrected suffixes from any divergence point; the final
    # transcript must end with the last emitted delta
    assert pieces[-1] == "" or tr.text.endswith(pieces[-1])


def test_beam_serving_lm_fusion_matches_offline(model_and_vars):
    """LM-fused beam serving (alpha>0 with a deterministic toy LM): the
    incremental search's lm memoization across streamed blocks must land on
    the offline result."""
    from lcasr_tpu.decoding.beam_search import BeamSearch

    model, variables = model_and_vars
    tok = _IdTokenizer()
    V = tok.vocab_size()
    rng_lm = np.random.default_rng(99)
    table = rng_lm.normal(size=(V, V)).astype(np.float32)  # last-token cond.

    def lm_scores(prefixes):
        rows = [table[p[-1] if p else 0] for p in prefixes]
        return np.stack(rows)

    opts = dict(beam_width=4, alpha=0.3, beta=0.1, lm_scores=lm_scores)
    wave = _random_wave(3.0, 13)
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running", decoder="beam", beam_opts=opts)
    for c in np.array_split(wave, 5):
        tr.feed(c)
    tr.finish()

    spec = mel_spectrogram(wave[None])
    mean = np.asarray(spec).mean(axis=(0, 2), keepdims=True)
    std = np.asarray(spec).std(axis=(0, 2), ddof=1, keepdims=True) + 1e-8
    out = model.apply(variables, (np.asarray(spec) - mean) / std)
    lp = np.asarray(out["final_posteriors"][0], np.float32)
    bs = BeamSearch(tokenizer=tok, blank_id=V, pad_id=0, **opts)
    assert tr.text == bs.run_search(lp)


def _offline_beam(model, variables, tok, wave, opts):
    spec = mel_spectrogram(wave[None])
    mean = np.asarray(spec).mean(axis=(0, 2), keepdims=True)
    std = np.asarray(spec).std(axis=(0, 2), ddof=1, keepdims=True) + 1e-8
    out = model.apply(variables, (np.asarray(spec) - mean) / std)
    lp = np.asarray(out["final_posteriors"][0], np.float32)
    from lcasr_tpu.decoding.beam_search import BeamSearch

    bs = BeamSearch(tokenizer=tok, blank_id=tok.vocab_size(), pad_id=0,
                    **opts)
    return bs.run_search(lp)


def _stream_beam(model, variables, tok, wave, opts, topk, n_chunks=6):
    tr = OnlineTranscriber(model, variables, tok, context_frames=512,
                           stride_frames=128, right_delay_frames=128,
                           norm="running", decoder="beam", beam_opts=opts,
                           beam_topk=topk)
    for c in np.array_split(wave, n_chunks):
        tr.feed(c)
    tr.finish()
    return tr


def test_beam_serving_sparse_topk_matches_dense(model_and_vars):
    """The sparse top-K beam fetch is exact: with K >= vocab the scatter
    densification reproduces the dense path bit-for-bit, and with a tight
    AM threshold a small K matches too (count check guards exactness)."""
    model, variables = model_and_vars
    tok = _IdTokenizer()
    wave = _random_wave(4.0, 21)

    # K clamps to the full vocab: sparse machinery, zero information loss
    full = dict(beam_width=4, alpha=0.0, beta=0.0)
    tr = _stream_beam(model, variables, tok, wave, full, 64)
    assert tr.sparse_refetches == 0  # count <= K=C always
    assert tr.text == _offline_beam(model, variables, tok, wave, full)

    # small K with a tight threshold: equality regardless of which blocks
    # rode the sparse path vs the overflow fallback
    tight = dict(beam_width=4, alpha=0.0, beta=0.0, top_am_threshold=-0.5)
    tr = _stream_beam(model, variables, tok, wave, tight, 4)
    assert tr.text == _offline_beam(model, variables, tok, wave, tight)


def test_beam_serving_sparse_overflow_fallback(model_and_vars):
    """A threshold that keeps the whole vocab with K=2 overflows every
    block: the dense-refetch fallback engages and the result still equals
    the offline search."""
    model, variables = model_and_vars
    tok = _IdTokenizer()
    wave = _random_wave(3.0, 23)
    loose = dict(beam_width=4, alpha=0.0, beta=0.0, top_am_threshold=-50.0)
    tr = _stream_beam(model, variables, tok, wave, loose, 2)
    assert tr.sparse_refetches > 0  # fallback engaged
    assert tr.text == _offline_beam(model, variables, tok, wave, loose)


def test_server_beam_matches_single_stream(model_and_vars):
    """Beam-mode server sessions (sparse fetch) produce exactly the
    single-stream beam transcriber's transcripts."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    tok = _IdTokenizer()
    opts = dict(beam_width=4, alpha=0.0, beta=0.0)
    kw = dict(context_frames=128, stride_frames=32, right_delay_frames=32)
    rng = np.random.default_rng(31)
    streams = [rng.normal(size=(16000 * s,)).astype(np.float32) * 0.1
               for s in (2, 1)]

    singles = []
    for audio in streams:
        t = OnlineTranscriber(model, variables, tok, norm="running",
                              decoder="beam", beam_opts=opts, beam_topk=8,
                              **kw)
        t.feed(audio)
        t.finish()
        singles.append(t.text)

    srv = TranscriptionServer(model, variables, tok, max_streams=2,
                              decoder="beam", beam_opts=opts, beam_topk=8,
                              **kw)
    sids = [srv.open() for _ in streams]
    got = ["" for _ in streams]
    chunk = 6000
    pos = 0
    while any(pos < len(a) for a in streams):
        for i, sid in enumerate(sids):
            if pos < len(streams[i]):
                srv.feed(sid, streams[i][pos : pos + chunk], pump=False)
        srv.pump()
        for i, sid in enumerate(sids):
            got[i] += srv.poll(sid)
        pos += chunk
    for i, sid in enumerate(sids):
        got[i] += srv.finish(sid)
    assert got == singles


def test_backlog_stride_batching_bit_equal(model_and_vars):
    """Feeding a whole recording at once (backlog: many strides due in one
    drain) routes through the batched (k, 80, ctx) forward — the transcript,
    token frames, and per-step text deltas must be IDENTICAL to the serial
    per-stride path (max_batch_strides=1), for greedy AND beam decoders."""
    model, variables = model_and_vars
    wave = _random_wave(14.0, 11)

    for decoder in ("greedy", "beam"):
        kw = dict(context_frames=256, stride_frames=64,
                  right_delay_frames=64, decoder=decoder)
        if decoder == "beam":
            kw["beam_opts"] = {"beam_width": 4}
        tr_serial = OnlineTranscriber(
            model, variables, _IdTokenizer(), max_batch_strides=1, **kw)
        tr_batched = OnlineTranscriber(
            model, variables, _IdTokenizer(), max_batch_strides=8, **kw)

        out_s = tr_serial.feed(wave) + tr_serial.finish()
        out_b = tr_batched.feed(wave) + tr_batched.finish()
        assert out_b == out_s
        assert tr_batched.text == tr_serial.text
        assert tr_batched._ids == tr_serial._ids
        assert tr_batched._id_frames == tr_serial._id_frames

    # interleaved feeding (partial backlogs of varying size) must also match
    tr_serial = OnlineTranscriber(
        model, variables, _IdTokenizer(), context_frames=256,
        stride_frames=64, right_delay_frames=64, max_batch_strides=1)
    tr_batched = OnlineTranscriber(
        model, variables, _IdTokenizer(), context_frames=256,
        stride_frames=64, right_delay_frames=64, max_batch_strides=4)
    deltas_s = _feed_in_chunks(tr_serial, wave, 5)
    deltas_b = _feed_in_chunks(tr_batched, wave, 5)
    assert deltas_b == deltas_s
    assert tr_batched.text == tr_serial.text


def test_int8_transfer_serving_close_to_float(model_and_vars):
    """transfer_dtype='int8' on the online transcriber: per-upload
    symmetric quantization must keep the transcript essentially unchanged
    (argmax-level; WER neutrality on a TRAINED model is certified by the
    closed-loop serving leg).  Applies to the serial, batched-stacked and
    strip paths alike."""
    model, variables = model_and_vars
    wave = _random_wave(12.0, 31)
    tok = _IdTokenizer()
    kw = dict(context_frames=256, stride_frames=64, right_delay_frames=64,
              norm="none")
    # a RANDOM-init head is near-flat over the vocab, so even tiny input
    # quantization noise flips near-tie argmaxes — transcript-level WER
    # certification on a TRAINED model (real margins) is the closed-loop
    # serving arm; here we bound the LOGIT perturbation, which is the
    # correctness property of the quantized upload path itself
    from lcasr_tpu.serving.transcriber import _shared_forward

    mel = np.asarray(
        mel_spectrogram(jnp.asarray(wave), global_normalisation=False))[0]
    win = mel[None, :, :256].astype(np.float32)
    fw_f = _shared_forward(model, "beam_dense")
    fw_q = _shared_forward(model, "beam_dense", q8=True)
    tr_q = OnlineTranscriber(model, variables, tok, transfer_dtype="int8", **kw)
    qwin, scale = tr_q._upload(win)
    lp_f, _ = fw_f(variables, jnp.asarray(win), jnp.asarray([256], np.int32))
    lp_q, _ = fw_q(variables, qwin, jnp.asarray([256], np.int32), scale)
    # input rounding error <= scale/2 per mel value; through this tiny net
    # the log-prob perturbation stays small and, critically, FINITE and
    # centered — a wrong scale/dequant would blow this up by orders
    diff = np.abs(np.asarray(lp_f) - np.asarray(lp_q)).max()
    assert diff < 0.2, diff

    # and the full pipeline runs end to end with int8 on (all three upload
    # paths: serial, batched-stacked ramp-in, strip steady-state)
    tr_q.feed_frames(mel)
    tr_q.finish()
    assert isinstance(tr_q.text, str)

    with pytest.raises(ValueError, match="transfer_dtype"):
        OnlineTranscriber(model, variables, tok, transfer_dtype="int4", **kw)


def test_server_int8_heterogeneous_loudness(model_and_vars):
    """Compressed server waves must survive sessions of wildly different
    raw magnitude sharing one wave (review r4): uploads travel in
    NORMALIZED units, so the shared int8 scale cannot zero out a quiet
    session's (or a quiet mel bin's) information.  Quantizing the RAW
    power-mel with one symmetric scale — the pre-fix behavior — reduces
    the quiet session's windows to all-zeros and its transcript to the
    blank-collapse of zeros."""
    from lcasr_tpu.serving import TranscriptionServer

    model, variables = model_and_vars
    tok = _IdTokenizer()
    rng = np.random.default_rng(17)
    base = rng.normal(size=(80, 900)).astype(np.float32)
    mels = [base * 100.0, base * 0.01]  # loud and quiet sessions, one wave

    def run(td):
        server = TranscriptionServer(
            model, variables, tok, max_streams=2, context_frames=128,
            stride_frames=32, right_delay_frames=32, transfer_dtype=td)
        sids = [server.open(norm="running") for _ in mels]
        for t in range(0, 900, 100):
            for sid, m in zip(sids, mels):
                server.feed_frames(sid, m[:, t:t + 100], pump=False)
            server.pump()
        return [server.finish(sid) for sid in sids]

    ref = run("float32")
    got = run("int8")
    # running-norm makes both sessions' normalized windows IDENTICAL
    # (same base pattern), so both transcripts must match the fp32 run's
    assert got == ref, (got, ref)

"""Parity of the C++ no-LM prefix-beam block advance (native/beam_native.cpp)
against the pure-Python implementation in decoding/beam_search.py —
identical prefixes, scores (bit-for-bit doubles), ranking order, and
timestamps, across sharp and flat posteriors, streamed blocks, pad
filtering, and prune_less_than."""
import numpy as np
import pytest

from lcasr_tpu.decoding.beam_search import BeamSearch
from lcasr_tpu.native import load_beam_native

pytestmark = pytest.mark.skipif(
    load_beam_native() is None, reason="native toolchain unavailable"
)


class _Tok:
    def __init__(self, C):
        self._C = C

    def vocab_size(self):
        return self._C - 1

    def decode(self, ids):
        return " ".join(map(str, ids))


def _random_blocks(rng, T, C, sharp=True, n=1):
    out = []
    for _ in range(n):
        if sharp:
            lp = np.full((T, C), -30.0, np.float32)
            for t in range(T):
                # never draw id 0: a pad-only frame is a carry-unchanged
                # no-op on both paths (covered by
                # test_native_pad_only_frame_carries_beams), so drawing it
                # here would just waste frames
                k = rng.choice(C - 1, size=rng.integers(1, 6),
                               replace=False) + 1
                v = rng.normal(size=len(k)).astype(np.float32) * 3
                lp[t, k] = v - v.max()
        else:
            lp = rng.normal(size=(T, C)).astype(np.float32)
            lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
            lp = lp.astype(np.float32)
        out.append(lp)
    return out


def _beams_equal(a: BeamSearch, b: BeamSearch):
    ba, bb = list(a._beams.values()), list(b._beams.values())
    assert len(ba) == len(bb)
    for x, y in zip(ba, bb):
        assert x.prefix == y.prefix
        assert x.p_blank == y.p_blank, (x.prefix, x.p_blank, y.p_blank)
        assert x.p_non_blank == y.p_non_blank
        assert x.frames == y.frames
        assert x.lm_score == y.lm_score == 0.0


@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("opts", [
    dict(beam_width=8),
    dict(beam_width=25, top_am_threshold=-3.0),
    dict(beam_width=4, prune_less_than_val=5.0),
    dict(beam_width=8, pad_id=0),
])
def test_native_matches_python(sharp, opts):
    rng = np.random.default_rng(hash((sharp, str(opts))) % 2**31)
    C = 40
    kw = dict(tokenizer=_Tok(C), blank_id=C - 1, alpha=0.0, beta=0.0, **opts)
    nat = BeamSearch(**kw)
    pyt = BeamSearch(**kw)
    pyt._force_python = True
    t0 = 0
    for blk in _random_blocks(rng, 37, C, sharp=sharp, n=4):
        nat.advance(blk, t0=t0)
        pyt.advance(blk, t0=t0)
        t0 += blk.shape[0]
        _beams_equal(nat, pyt)
    assert nat.best().prefix == pyt.best().prefix
    assert [b for b in nat.live_prefixes()] == [b for b in pyt.live_prefixes()]


def test_native_pad_equals_blank_no_filter():
    """pad_id == blank must NOT filter (python: `blank != self.pad_id`)."""
    rng = np.random.default_rng(7)
    C = 16
    kw = dict(tokenizer=_Tok(C), blank_id=C - 1, pad_id=C - 1,
              alpha=0.0, beta=0.0, beam_width=6)
    nat, pyt = BeamSearch(**kw), BeamSearch(**kw)
    pyt._force_python = True
    blk = _random_blocks(rng, 25, C, sharp=False)[0]
    nat.advance(blk)
    pyt.advance(blk)
    _beams_equal(nat, pyt)


def test_native_pad_only_frame_carries_beams():
    """A frame whose only above-threshold candidate is pad must carry the
    beams unchanged — NOT empty the beam set for all remaining frames
    (regression: both paths used to permanently kill the search, then
    crash best()/live_prefixes on the next emit)."""
    rng = np.random.default_rng(3)
    C = 16
    kw = dict(tokenizer=_Tok(C), blank_id=C - 1, pad_id=0,
              alpha=0.0, beta=0.0, beam_width=6, top_am_threshold=-6.0)
    blk = _random_blocks(rng, 10, C, sharp=True)[0]
    # mid-block frame where pad dominates everything by > |threshold|
    blk[4, :] = -30.0
    blk[4, 0] = 0.0
    nat, pyt = BeamSearch(**kw), BeamSearch(**kw)
    pyt._force_python = True
    for search in (pyt, nat):
        search.advance(blk[:4])
        prefixes_before = search.live_prefixes()
        search.advance(blk[4:5], t0=4)
        assert search.live_prefixes() == prefixes_before  # carried, not []
        search.advance(blk[5:], t0=5)
        assert search.live_prefixes()  # still alive; best() must not raise
        search.best()
    _beams_equal(nat, pyt)


def test_native_run_search_and_timestamps():
    rng = np.random.default_rng(11)
    C = 32
    kw = dict(tokenizer=_Tok(C), blank_id=C - 1, pad_id=0,
              alpha=0.0, beta=0.0, beam_width=12)
    blk = _random_blocks(rng, 60, C, sharp=True)[0]
    nat, pyt = BeamSearch(**kw), BeamSearch(**kw)
    pyt._force_python = True
    assert nat.run_search(blk) == pyt.run_search(blk)
    assert nat.best().frames == pyt.best().frames


def test_native_float64_takes_python_path():
    """float64 log-probs must not silently round through the native path."""
    rng = np.random.default_rng(3)
    C = 16
    kw = dict(tokenizer=_Tok(C), blank_id=C - 1, alpha=0.0, beta=0.0,
              beam_width=4)
    blk64 = _random_blocks(rng, 10, C, sharp=False)[0].astype(np.float64)
    a, b = BeamSearch(**kw), BeamSearch(**kw)
    b._force_python = True
    a.advance(blk64)
    b.advance(blk64)
    _beams_equal(a, b)

import numpy as np
import pytest

from lcasr_tpu.decoding.beam_search import BeamSearch
from lcasr_tpu.decoding.greedy import GreedyCTCDecoder


def _peaked_log_probs(path, C, peak=8.0):
    """Frame-wise log-probs strongly peaked on `path` (list of class ids)."""
    T = len(path)
    logits = np.full((T, C), 0.0, np.float32)
    for t, c in enumerate(path):
        logits[t, c] = peak
    m = logits.max(-1, keepdims=True)
    return logits - (m + np.log(np.exp(logits - m).sum(-1, keepdims=True)))


def test_beam_equals_greedy_on_peaked_posteriors():
    C, blank = 8, 7
    path = [1, 1, blank, 2, blank, 3, 3, blank, 1]
    lp = _peaked_log_probs(path, C)
    bs = BeamSearch(beam_width=8, blank_id=blank)
    greedy = GreedyCTCDecoder(blank_id=blank)
    assert bs.run_search(lp, decode=False) == greedy(lp, decode=False) == [1, 2, 3, 1]


def test_beam_beats_greedy_on_ambiguous_frame():
    """Classic prefix-beam case: probability mass split across two frames
    favors a different sequence than frame-wise argmax."""
    C, blank = 4, 3
    # both frames: blank .6, a .4 → greedy yields "" (argmax blank twice),
    # but P("a") = .4·.6 + .6·.4 + .4·.4 = .64 > P("") = .36
    lp = np.log(np.array([
        [0.3998, 0.0001, 0.0001, 0.6],
        [0.3998, 0.0001, 0.0001, 0.6],
    ], np.float32))
    greedy = GreedyCTCDecoder(blank_id=blank)
    assert greedy(lp, decode=False) == []
    bs = BeamSearch(beam_width=8, blank_id=blank, top_am_threshold=-20.0)
    assert bs.run_search(lp, decode=False) == [0]


def test_lm_fusion_changes_ranking():
    C, blank = 4, 3
    # two near-tied tokens at one frame
    lp = np.log(np.array([[0.49, 0.5, 0.005, 0.005]], np.float32))

    def lm_scores(prefixes):
        # LM strongly prefers token 0
        out = np.full((len(prefixes), C), np.log(0.01), np.float32)
        out[:, 0] = np.log(0.97)
        return out

    no_lm = BeamSearch(beam_width=4, blank_id=blank).run_search(lp, decode=False)
    assert no_lm == [1]
    with_lm = BeamSearch(
        beam_width=4, blank_id=blank, alpha=1.0, beta=0.0, lm_scores=lm_scores
    ).run_search(lp, decode=False)
    assert with_lm == [0]


def test_tokenizer_decode_path():
    from lcasr_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer()
    blank = tok.vocab_size()
    ids = tok.encode("hello world")
    path = []
    for i in ids:
        path += [i, blank]
    lp = _peaked_log_probs(path, tok.vocab_size() + 1)
    bs = BeamSearch(tokenizer=tok, beam_width=4, blank_id=blank)
    assert bs.run_search(lp) == "hello world"


def test_decode_beams_word_timestamps():
    from lcasr_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer()
    blank = tok.vocab_size()
    ids = tok.encode("hello world")
    path = []
    for i in ids:
        path += [i, blank, blank]
    lp = _peaked_log_probs(path, tok.vocab_size() + 1, peak=14.0)
    bs = BeamSearch(tokenizer=tok, beam_width=4, blank_id=blank)
    out = bs.decode_beams(lp, ds_factor=8)
    assert out["text"] == "hello world"
    words = [w["word"] for w in out["frames"]]
    assert words == ["hello", "world"]
    # monotonically increasing, start < end
    starts = [w["start"] for w in out["frames"]]
    assert starts == sorted(starts)
    assert all(w["start"] < w["end"] for w in out["frames"])


def test_prune_margin_and_pad_exclusion():
    """prune_less_than_val drops beams below best - val (it used to be
    silently ignored), and pad_id is excluded from candidates when set."""
    C, blank = 4, 3
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, C))
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    wide = BeamSearch(beam_width=8, blank_id=blank, top_am_threshold=-20.0)
    wide.run_search(lp, decode=False)
    # a huge margin trims nothing: bit-identical to no pruning
    loose = BeamSearch(beam_width=8, blank_id=blank, top_am_threshold=-20.0,
                       prune_less_than_val=1000.0)
    loose.run_search(lp, decode=False)
    assert wide._best.prefix == loose._best.prefix
    assert wide._best.score == loose._best.score
    # a tiny margin collapses the beam set to (near) greedy but still runs
    tight = BeamSearch(beam_width=8, blank_id=blank, top_am_threshold=-20.0,
                       prune_less_than_val=1e-6)
    ids = tight.run_search(lp, decode=False)
    assert isinstance(ids, list)

    no_pad = BeamSearch(beam_width=8, blank_id=blank, top_am_threshold=-20.0,
                        pad_id=0)
    ids = no_pad.run_search(lp, decode=False)
    assert 0 not in ids


def test_lm_memo_scores_each_prefix_once():
    """The stateless LM hook is called only for NEWLY-created prefixes
    (per-prefix memoization), not for every live beam on every frame."""
    C, blank = 4, 3
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, C)) * 2
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    seen = []

    def lm(prefixes):
        seen.extend(tuple(p) for p in prefixes)
        return np.zeros((len(prefixes), C - 1))

    bs = BeamSearch(beam_width=4, blank_id=blank, top_am_threshold=-20.0,
                    lm_scores=lm, alpha=0.3, beta=0.1)
    bs.run_search(lp, decode=False)
    assert len(seen) == len(set(seen))  # no prefix scored twice

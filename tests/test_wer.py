import math

from lcasr_tpu.evaluation.wer import word_error_rate_detail


def test_perfect_match():
    wer, words, ins, dels, subs = word_error_rate_detail(["a b c"], ["a b c"])
    assert wer == 0.0 and words == 3 and ins == dels == subs == 0.0


def test_substitution():
    wer, words, ins, dels, subs = word_error_rate_detail(["a x c"], ["a b c"])
    assert wer == 1 / 3 and subs == 1 / 3 and ins == 0 and dels == 0


def test_insertion_and_deletion():
    wer, _, ins, dels, _ = word_error_rate_detail(["a b c d"], ["a b c"])
    assert wer == 1 / 3 and ins == 1 / 3
    wer, _, ins, dels, _ = word_error_rate_detail(["a c"], ["a b c"])
    assert wer == 1 / 3 and dels == 1 / 3


def test_empty_reference_counts_insertions():
    wer, words, ins, dels, subs = word_error_rate_detail(["a b", ""], ["", "x y"])
    # ref1 empty: 2 insertions; ref2: 2 deletions; 2 ref words total
    assert words == 2 and wer == 2.0


def test_all_empty_is_inf():
    wer, words, *_ = word_error_rate_detail([""], [""])
    assert math.isinf(wer) and words == 0


def test_cer_mode():
    wer, words, *_ = word_error_rate_detail(["abc"], ["abd"], use_cer=True)
    assert words == 3 and abs(wer - 1 / 3) < 1e-9


def test_mixed_batch_aggregation():
    hyps = ["the cat sat", "on the mat"]
    refs = ["the cat sat", "on a mat"]
    wer, words, *_ = word_error_rate_detail(hyps, refs)
    assert words == 6 and abs(wer - 1 / 6) < 1e-9


def test_rapidfuzz_alignment_matches_python_dp_totals():
    """The C++ editops fast path produces identical TOTAL edit counts to the
    pure-Python DP (splits may differ among co-optimal alignments)."""
    import random

    import lcasr_tpu.evaluation.wer as W

    if W._rf_lev is None:
        import pytest

        pytest.skip("rapidfuzz not available")
    rng = random.Random(0)
    for _ in range(200):
        ref = [rng.choice("abcde") for _ in range(rng.randint(0, 12))]
        hyp = [rng.choice("abcde") for _ in range(rng.randint(0, 12))]
        fast = W._edit_ops(ref, hyp)
        rf, W._rf_lev = W._rf_lev, None
        try:
            slow = W._edit_ops(ref, hyp)
        finally:
            W._rf_lev = rf
        assert fast["total"] == slow["total"]
        assert fast["total"] == (fast["substitutions"] + fast["insertions"]
                                 + fast["deletions"])


def test_spelling_normalization_standardizes_british_forms():
    """The reference Whisper normalizer maps British to American spellings
    (english.json); the curated map must cover the common forms so e.g.
    ref 'colour' vs hyp 'color' scores as a MATCH."""
    from lcasr_tpu.evaluation.normalizer import normalize
    from lcasr_tpu.evaluation.wer import word_error_rate_detail

    hyp = normalize("the color of the theater was gray")
    ref = normalize("the colour of the theatre was grey")
    wer, *_ = word_error_rate_detail([hyp], [ref])
    assert wer == 0.0

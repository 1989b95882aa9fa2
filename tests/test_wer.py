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

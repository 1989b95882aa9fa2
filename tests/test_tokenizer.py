import pytest

from lcasr_tpu.data.tokenizer import load_tokenizer, normalize_nmt_nfkc_cf


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


def test_vocab_and_special_ids(tok):
    # Reference tokenizer: vocab 4095, pad=0, unk=1, bos=2
    # (reference lcasr/utils/audio_tools.py:167-189)
    assert tok.vocab_size() == 4095
    assert tok.pad_id() == 0
    assert tok.unk_id() == 1
    assert tok.bos_id() == 2


def test_roundtrip(tok):
    for text in [
        "hello world",
        "the quick brown fox jumped over the lazy dog",
        "a b c one two three",
    ]:
        ids = tok.encode(text)
        assert all(0 <= i < tok.vocab_size() for i in ids)
        assert tok.decode(ids) == text


def test_casefolding_normalization(tok):
    assert tok.encode("HELLO World") == tok.encode("hello world")
    assert normalize_nmt_nfkc_cf("  A\tB\nC  ") == "a b c"


def test_pieces_are_valid_merges(tok):
    ids = tok.encode("miscellaneous extraordinarily")
    pieces = [tok.id_to_piece(i) for i in ids]
    assert "".join(pieces).replace("▁", " ").strip() == "miscellaneous extraordinarily"


def test_empty(tok):
    assert tok.encode("") == []
    assert tok.decode([]) == ""

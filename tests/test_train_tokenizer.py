from lcasr_tpu.data.tokenizer import SentencePieceBPE
from lcasr_tpu.data.train_tokenizer import learn_bpe, train_tokenizer


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs sat together",
    "the the the cat cat dog",
] * 20


def test_learn_bpe_produces_merges():
    pieces = learn_bpe(CORPUS, vocab_size=80)
    names = [p for (p, _, _) in pieces]
    assert names[:3] == ["[PAD]", "[UNK]", "[BOS]"]
    # frequent words should have become single pieces
    assert any("the" in n for n in names)
    assert len(names) <= 80


def test_roundtrip_through_our_loader(tmp_path):
    path = str(tmp_path / "tok.model")
    train_tokenizer(CORPUS, path, vocab_size=80)
    tok = SentencePieceBPE(path, use_native=False)
    assert tok.pad_id() == 0 and tok.unk_id() == 1 and tok.bos_id() == 2
    ids = tok.encode("the cat sat")
    assert ids and tok.decode(ids) == "the cat sat"
    # unseen chars hit unk
    ids2 = tok.encode("zebra ∆")
    assert tok.unk_id() in ids2 or all(i < tok.vocab_size() for i in ids2)


def test_native_extension_loads_trained_model(tmp_path):
    path = str(tmp_path / "tok.model")
    train_tokenizer(CORPUS, path, vocab_size=80)
    tok_n = SentencePieceBPE(path)
    tok_p = SentencePieceBPE(path, use_native=False)
    for text in CORPUS[:4] + ["dogs and cats", "unseen words here"]:
        assert tok_n.encode(text) == tok_p.encode(text)

"""Native (C++) BPE extension vs the pure-Python merge loop."""
import random
import string

import pytest

from lcasr_tpu.data.tokenizer import SentencePieceBPE


@pytest.fixture(scope="module")
def toks():
    native = SentencePieceBPE()
    if native._native is None:
        pytest.skip("native extension not built (no toolchain)")
    python = SentencePieceBPE(use_native=False)
    return native, python


def test_fuzz_native_matches_python(toks):
    native, python = toks
    rng = random.Random(0)
    words = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 12)))
        for _ in range(1000)
    ]
    for _ in range(100):
        text = " ".join(rng.choices(words, k=rng.randint(1, 40)))
        assert native.encode(text) == python.encode(text)


def test_edge_cases(toks):
    native, python = toks
    for text in ["", "a", "é", "ß", "ﬁ ligature", "x" * 500, "多语言 mixed 文本"]:
        assert native.encode(text) == python.encode(text)

"""BPE tokenizer training → SentencePiece-compatible .model artifact.

Counterpart of reference `lcasr/utils/audio_tools.py:167-189` (train_tokenizer
via the sentencepiece C++ trainer, vocab 4095, pad/unk/bos = 0/1/2,
nmt_nfkc_cf).  This trainer learns standard BPE merges over the normalized
corpus and SERIALIZES the result in the sentencepiece ModelProto wire format,
so the output .model loads through `lcasr_tpu.data.tokenizer` (and through
real sentencepiece) interchangeably.

Scoring follows sentencepiece's BPE convention: merged pieces get score
−rank; single characters get score ≈ log-frequency ranking below all merges.
"""
from __future__ import annotations

import struct
from collections import Counter
from typing import Dict, Iterable, List, Tuple

from lcasr_tpu.data.tokenizer import _WS, normalize_nmt_nfkc_cf

_NORMAL, _UNKNOWN, _CONTROL = 1, 2, 3


def _encode_varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num: int, wire: int) -> bytes:
    return _encode_varint((num << 3) | wire)


def _piece_msg(piece: str, score: float, ptype: int) -> bytes:
    body = (
        _field(1, 2) + _encode_varint(len(piece.encode())) + piece.encode()
        + _field(2, 5) + struct.pack("<f", score)
        + _field(3, 0) + _encode_varint(ptype)
    )
    return _field(1, 2) + _encode_varint(len(body)) + body


def learn_bpe(
    texts: Iterable[str],
    vocab_size: int = 4095,
    max_word_count: int = 5_000_000,
) -> List[Tuple[str, float, int]]:
    """Learn BPE merges; returns the piece table [(piece, score, type), ...]."""
    # word frequency over normalized, ▁-prefixed words
    word_freq: Counter = Counter()
    for text in texts:
        norm = normalize_nmt_nfkc_cf(text)
        for w in norm.split(" "):
            if w:
                word_freq[_WS + w] += 1
        if len(word_freq) > max_word_count:
            break

    # initial symbol inventory: characters
    char_freq: Counter = Counter()
    for w, f in word_freq.items():
        for ch in w:
            char_freq[ch] += f

    specials = [("[PAD]", 0.0, _CONTROL), ("[UNK]", 0.0, _UNKNOWN), ("[BOS]", 0.0, _CONTROL)]
    n_merges = vocab_size - len(specials) - len(char_freq)
    if n_merges < 0:
        raise ValueError(f"vocab_size {vocab_size} too small for {len(char_freq)} chars")

    words: Dict[Tuple[str, ...], int] = {tuple(w): f for w, f in word_freq.items()}
    merges: List[str] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        (a, b), f = pair_freq.most_common(1)[0]
        if f < 2:
            break
        merged = a + b
        merges.append(merged)
        new_words: Dict[Tuple[str, ...], int] = {}
        for sym, fq in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + fq
        words = new_words

    pieces: List[Tuple[str, float, int]] = list(specials)
    for rank, m in enumerate(merges):
        pieces.append((m, float(-rank), _NORMAL))
    # single characters below all merges (so merges win ties)
    base = -len(merges)
    for i, (ch, _) in enumerate(char_freq.most_common()):
        pieces.append((ch, float(base - i - 1), _NORMAL))
    return pieces[:vocab_size]


def write_sentencepiece_model(pieces: List[Tuple[str, float, int]], path: str) -> None:
    with open(path, "wb") as f:
        for piece, score, ptype in pieces:
            f.write(_piece_msg(piece, score, ptype))


def train_tokenizer(
    texts: Iterable[str],
    save_path: str,
    vocab_size: int = 4095,
) -> str:
    """Train + save; returns the .model path (loadable by load_tokenizer)."""
    pieces = learn_bpe(texts, vocab_size=vocab_size)
    write_sentencepiece_model(pieces, save_path)
    return save_path


def retrieve_all_text(pairs: Dict[str, Dict[str, str]], save_path: str | None = None) -> List[str]:
    """Collect transcript text from a pairs JSON (reference
    `audio_tools.py:149-165`)."""
    import json

    out: List[str] = []
    for entry in pairs.values():
        with open(entry["txt"]) as f:
            j = json.load(f)
        words = j["results"][-1]["alternatives"][0]["words"]
        out.append(" ".join(w["word"] for w in words))
    if save_path:
        with open(save_path, "w") as f:
            f.write("\n".join(out) + "\n")
    return out

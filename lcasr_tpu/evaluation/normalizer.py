"""Text normalization applied before WER scoring.

The reference normalizes hypotheses and references with Whisper's
EnglishTextNormalizer before scoring (reference `eval/run.py:9-10,91`).
transformers ships the same normalizer; a conservative fallback keeps eval
functional if that import ever disappears.
"""
from __future__ import annotations

import re


def _basic_normalize(text: str) -> str:
    text = text.lower()
    text = re.sub(r"[\(\[].*?[\)\]]", "", text)  # drop bracketed annotations
    text = re.sub(r"[^\w\s']", " ", text)
    return " ".join(text.split())


try:
    from transformers.models.whisper.english_normalizer import EnglishTextNormalizer

    _spelling: dict = {}
    _normalizer = EnglishTextNormalizer(_spelling)

    def normalize(text: str) -> str:
        return _normalizer(text)

except Exception:  # pragma: no cover - exercised only without transformers

    def normalize(text: str) -> str:
        return _basic_normalize(text)

"""Greedy CTC decoding: argmax → collapse repeats → drop blank → detokenize.

Counterpart of reference `lcasr/decoding/greedy.py:4-22` (blank = last id in
the lcasr convention, passed explicitly).
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class GreedyCTCDecoder:
    def __init__(self, tokenizer=None, blank_id: int = 0):
        self.tokenizer = tokenizer
        self.blank = blank_id

    def __call__(self, emission, decode: bool = True) -> Union[str, List[int]]:
        """emission: (T, C) logits or log-probs → transcript (or raw ids)."""
        emission = np.asarray(emission)
        indices = emission.argmax(-1)
        # collapse consecutive repeats
        keep = np.ones_like(indices, dtype=bool)
        keep[1:] = indices[1:] != indices[:-1]
        collapsed = indices[keep]
        ids = [int(i) for i in collapsed if i != self.blank]
        if decode and self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return ids

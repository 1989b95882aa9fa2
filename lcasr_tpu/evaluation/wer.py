"""Word/character error rate with insertion/deletion/substitution detail.

API-compatible with the reference metric (reference `lcasr/eval/wer.py:5-73`,
itself NeMo-style), but self-contained: the Levenshtein alignment with
operation counts is computed here directly instead of through jiwer.
"""
from __future__ import annotations

from typing import Dict, List, Tuple


try:  # C++ alignment (reference uses C-accelerated jiwer); identical counts
    from rapidfuzz.distance import Levenshtein as _rf_lev
except Exception:  # pragma: no cover - rapidfuzz is in the baked image
    _rf_lev = None


def _edit_ops(ref: List[str], hyp: List[str]) -> Dict[str, int]:
    """Minimal-edit alignment counts via Levenshtein DP.

    Tie-breaking prefers substitutions over insert+delete pairs, matching the
    canonical WER alignment.

    The pure-Python DP is O(n·m) tuple churn — ~20 s for 4k×4k words, hours
    at the 10 h recordings this framework decodes — so when rapidfuzz is
    present the alignment runs through its C++ editops (~10,000× faster,
    fuzz-verified identical TOTALS; the S/I/D split may differ among
    co-optimal alignments, and rapidfuzz's split is the one modern jiwer —
    the reference's metric backend — reports too).
    """
    if _rf_lev is not None:
        subs = ins = dels = 0
        for op in _rf_lev.editops(ref, hyp):
            if op.tag == "replace":
                subs += 1
            elif op.tag == "insert":
                ins += 1
            else:
                dels += 1
        return {
            "substitutions": subs, "insertions": ins, "deletions": dels,
            "total": subs + ins + dels,
        }
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels) for current row
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = prev[j - 1]
            else:
                c_sub = (prev[j - 1][0] + 1, prev[j - 1][1] + 1, prev[j - 1][2], prev[j - 1][3])
                c_ins = (cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2] + 1, cur[j - 1][3])
                c_del = (prev[j][0] + 1, prev[j][1], prev[j][2], prev[j][3] + 1)
                cand = min(c_sub, c_ins, c_del, key=lambda t: t[0])
            cur.append(cand)
        prev = cur
    cost, subs, ins, dels = prev[m]
    return {"substitutions": subs, "insertions": ins, "deletions": dels, "total": cost}


def compute_measures(reference: str, hypothesis: str) -> Dict[str, int]:
    return _edit_ops(reference.split(), hypothesis.split())


def word_error_rate_detail(
    hypotheses: List[str], references: List[str], use_cer: bool = False
) -> Tuple[float, int, float, float, float]:
    """Returns (wer, n_ref_words, insertion_rate, deletion_rate, substitution_rate).

    Same contract as reference `lcasr/eval/wer.py:5-73`, including the
    empty-reference convention (all hypothesis words count as insertions).
    """
    if len(hypotheses) != len(references):
        raise ValueError(
            "hypotheses and references must have the same number of elements "
            f"(got {len(hypotheses)} and {len(references)})"
        )
    scores = words = 0
    ops = {"substitutions": 0, "insertions": 0, "deletions": 0}
    for h, r in zip(hypotheses, references):
        h_list = list(h) if use_cer else h.split()
        r_list = list(r) if use_cer else r.split()
        if len(r_list) == 0:
            errors = len(h_list)
            ops["insertions"] += errors
        else:
            m = _edit_ops(r_list, h_list)
            errors = m["total"]
            for k in ops:
                ops[k] += m[k]
        scores += errors
        words += len(r_list)

    if words != 0:
        return (
            scores / words,
            words,
            ops["insertions"] / words,
            ops["deletions"] / words,
            ops["substitutions"] / words,
        )
    inf = float("inf")
    return inf, 0, inf, inf, inf


def word_error_rate(hypotheses: List[str], references: List[str]) -> float:
    return word_error_rate_detail(hypotheses, references)[0]

"""Loss-based evaluation: per-recording CTC loss instead of WER.

Counterpart of reference `eval/rev16_loss/run.py:83-144` /
`eval/spotify_loss/run.py:95-127` — a domain-shift probe that scores a
checkpoint by CTC negative log-likelihood over the FULL recording's
averaged-moving-window logits (the same `fetch_logits` pass the WER eval
uses), normalized per target token.  `target` picks the reference variant:

  * "gold" — NLL of the gold transcript (spotify_loss `:107-120`),
  * "hypothesis" — NLL of the model's own greedy transcript re-tokenized
    (rev16_loss `:106-117`, its `decode_beams_lm(beam_width=1)`) — a
    confidence probe that needs no gold text.

Using the full-recording logits (not a truncated prefix) keeps the CTC
lattice feasible for recordings of any length: label_length ≤ output_length
holds whenever it held for the reference.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.evaluation.datasets import get_dataset_fn
from lcasr_tpu.evaluation.run import load_any_checkpoint
from lcasr_tpu.models.registry import get_model_class, load_model
from lcasr_tpu.ops.ctc import ctc_loss


def evaluate_loss(
    checkpoint: str,
    dataset: str,
    split: str = "test",
    seq_len: int = 16384,
    overlap: int = -1,
    target: str = "gold",
    dataset_kwargs: Optional[Dict[str, Any]] = None,
    verbose: bool = True,
) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.decoding.greedy import GreedyCTCDecoder
    from lcasr_tpu.evaluation.streaming import StreamingDecoder

    if target not in ("gold", "hypothesis"):
        raise ValueError(f"target must be gold|hypothesis, got {target}")
    cfg, variables = load_any_checkpoint(checkpoint)
    tokenizer = load_tokenizer()
    n_classes = tokenizer.vocab_size() + 1
    model = load_model(cfg, tokenizer.vocab_size(), get_model_class(cfg))
    streamer = StreamingDecoder(model, variables, n_classes)
    decoder = GreedyCTCDecoder(tokenizer, blank_id=n_classes - 1)
    if overlap == -1:
        overlap = int(seq_len * 0.875)

    @jax.jit
    def nll_fn(log_probs, t_len, labels, label_len):
        return ctc_loss(
            log_probs[None].astype(jnp.float32), labels[None],
            t_len[None], label_len[None],
        )

    def _bucket(a: np.ndarray, axis0_mult: int) -> np.ndarray:
        pad = (-a.shape[0]) % axis0_mult
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        return a

    data = get_dataset_fn(dataset)(split, **(dataset_kwargs or {}))
    rows: List[Dict[str, Any]] = []
    total_nll, total_tokens = 0.0, 0
    for item in data:
        spec, gold = item["process_fn"](item)
        spec = np.asarray(spec)
        log_probs = streamer.logits(spec, seq_len=seq_len, overlap=overlap)
        text = decoder(np.asarray(log_probs)) if target == "hypothesis" else gold
        ids = tokenizer.encode(text)
        if not ids:
            continue
        # bucket both axes so the jitted lattice compiles once per size
        # class, not once per recording (length masking makes padding inert)
        lp_b = _bucket(np.asarray(log_probs, np.float32), 1024)
        ids_b = _bucket(np.asarray(ids, np.int32), 64)
        nll = float(
            nll_fn(
                jnp.asarray(lp_b),
                jnp.asarray(log_probs.shape[0]),
                jnp.asarray(ids_b),
                jnp.asarray(len(ids)),
            )
        )
        rows.append({
            "recording": item["id"],
            "nll": nll,
            "tokens": len(ids),
            "frames": int(log_probs.shape[0]),
            "nll_per_token": nll / len(ids),
        })
        total_nll += nll
        total_tokens += len(ids)
        if verbose:
            print(f"{item['id']}: nll/token {nll / len(ids):.4f}")
    return {
        "dataset": dataset,
        "split": split,
        "target": target,
        # the reference's final_loss = sum(losses) / sum(target_lengths)
        "nll_per_token": total_nll / max(total_tokens, 1),
        "rows": rows,
    }

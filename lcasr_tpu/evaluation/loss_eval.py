"""Loss-based evaluation: per-recording CTC loss instead of WER.

Counterpart of reference `eval/rev16_loss/run.py:83-144` /
`eval/spotify_loss/run.py` — a domain-shift probe that scores a checkpoint by
its CTC negative log-likelihood on held-out recordings (no decoding).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from lcasr_tpu.config import Config
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
    dataset_kwargs: Optional[Dict[str, Any]] = None,
    verbose: bool = True,
) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    cfg, variables = load_any_checkpoint(checkpoint)
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size(), get_model_class(cfg))

    @jax.jit
    def chunk_loss(variables, audio, a_len, labels, t_len):
        out = model.apply(variables, audio, length=a_len)
        nll = ctc_loss(
            out["final_posteriors"].astype(jnp.float32), labels, out["length"], t_len
        )
        return nll

    data = get_dataset_fn(dataset)(split, **(dataset_kwargs or {}))
    rows: List[Dict[str, Any]] = []
    total_nll, total_frames = 0.0, 0
    for item in data:
        spec, gold = item["process_fn"](item)
        spec = np.asarray(spec)[:, :, :seq_len]
        ids = tokenizer.encode(gold)
        if not ids:
            continue
        T = spec.shape[-1]
        nll = float(
            chunk_loss(
                variables,
                jnp.asarray(spec),
                jnp.asarray([T]),
                jnp.asarray([ids]),
                jnp.asarray([len(ids)]),
            )
        )
        rows.append({"recording": item["id"], "nll": nll, "frames": T,
                     "nll_per_frame": nll / T})
        total_nll += nll
        total_frames += T
        if verbose:
            print(f"{item['id']}: nll/frame {nll / T:.4f}")
    return {
        "dataset": dataset,
        "split": split,
        "nll_per_frame": total_nll / max(total_frames, 1),
        "rows": rows,
    }

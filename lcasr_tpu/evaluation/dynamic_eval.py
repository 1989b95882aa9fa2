"""Dynamic evaluation: per-recording test-time adaptation via pseudo-labels.

Counterpart of reference `lcasr/eval/dynamic_eval.py:11-142`: for each
recording, chunk as in the moving-window decode, then for N epochs per chunk:
run (num_negatives SpecAugmented copies + 1 clean) through the model, greedy-
decode pseudo-labels from the CLEAN copy, take CTC loss of the augmented
outputs against those pseudo-labels (normalized by tokens-in-loss), and do a
MADGRAD step.  The adapted logits of the clean copy are merged with the usual
overlap averaging; the original parameters are restored afterwards (here:
trivially, since params are immutable — the caller's variables are untouched).

Gradients-at-inference are first-class in JAX: the adaptation step is one
jitted value_and_grad + optimizer update, compiled once per chunk shape.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lcasr_tpu.data.augmentation import SpecAugment
from lcasr_tpu.decoding.greedy import GreedyCTCDecoder
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.optim.madgrad import madgrad

DEFAULT_SPEC_AUGMENT = {
    "n_time_masks": 2,
    "n_freq_masks": 3,
    "freq_mask_param": 42,
    "time_mask_param": -1,
    "min_p": 0.05,
    "zero_masking": False,
}


@functools.lru_cache(maxsize=None)
def _tta_programs(model, num_negatives: int, blank_id: int, lr: float):
    """Cached jitted TTA programs (fresh per-call closures recompiled the
    flagship fwd+bwd for EVERY recording — ~1 min per recording on a
    remote-compile tunnel; the cache keys on the hashable flax module so all
    recordings of an eval run share two compiled programs per chunk shape)."""
    optimizer = madgrad(learning_rate=lr)

    @jax.jit
    def forward_clean(params, batch_stats, audio, lengths):
        # the pseudo-label pass only needs the CLEAN chunk: rows are
        # independent in eval mode, so forwarding the augmented negatives
        # here (as a naive port of the reference's single shared forward
        # would) is num_negatives x pure waste — the adapt step re-forwards
        # them with fresh augmentation anyway
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, audio, length=lengths
        )
        return out["final_posteriors"], out["length"]

    @jax.jit
    def adapt_step(params, batch_stats, opt_state, audio_batch, lengths,
                   pseudo, pseudo_len):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, audio_batch,
                length=lengths,
            )
            lp = out["final_posteriors"][:num_negatives].astype(jnp.float32)
            N = lp.shape[1]
            total = N * num_negatives
            nll = ctc_loss(
                lp,
                pseudo,
                out["length"][:num_negatives],
                pseudo_len,
                blank_id=blank_id,
            )
            return nll / total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    return forward_clean, adapt_step, optimizer


def dynamic_eval_ctc_loss(
    model,
    variables: Dict,
    spec: np.ndarray,  # (1, 80, T)
    seq_len: int,
    overlap: int,
    tokenizer,
    num_negatives: int = 2,
    epochs: int = 1,
    lr: float = 8e-5,
    spec_augment_config: Optional[Dict] = None,
    subsampling_factor: int = 8,
    seed: int = 0,
    shuffle: bool = False,
) -> np.ndarray:
    spec_n = spec.shape[-1]
    n_classes = tokenizer.vocab_size() + 1
    blank_id = n_classes - 1

    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    assert overlap % subsampling_factor == 0

    augmentation = SpecAugment(**(spec_augment_config or DEFAULT_SPEC_AUGMENT))
    decoder = GreedyCTCDecoder(tokenizer, blank_id=blank_id)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    forward_clean, adapt_step, optimizer = _tta_programs(
        model, num_negatives, blank_id, float(lr)
    )
    opt_state = optimizer.init(params)

    # chunk exactly like the moving-window decode
    chunks = {}
    last_ulen, kill_next = None, False
    for i in range(0, spec_n, seq_len - overlap):
        chunk = spec[:, :, i : i + seq_len]
        u_len = chunk.shape[-1]
        if kill_next:
            break
        if last_ulen is not None and u_len < last_ulen:
            kill_next = True
        last_ulen = u_len
        if u_len < seq_len:
            chunk = np.pad(chunk, ((0, 0), (0, 0), (0, seq_len - u_len)))
        chunks[i] = (chunk, u_len)

    key = jax.random.PRNGKey(seed)
    model_outputs = {}
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        keys_order = list(chunks.keys())
        if shuffle:
            rng.shuffle(keys_order)
        for i in keys_order:
            chunk, u_len = chunks[i]
            audio = jnp.asarray(chunk)
            lp, out_len = forward_clean(
                params, batch_stats, audio, jnp.full((1,), u_len, jnp.int32)
            )
            n_valid = int(np.asarray(out_len)[0])
            clean_lp = np.asarray(lp[0][:n_valid], dtype=np.float64)

            pseudo_text = decoder(clean_lp)
            pseudo_ids = tokenizer.encode(pseudo_text) if pseudo_text else []
            # an empty decode still takes the step (zero-length CTC targets =
            # pure blank supervision) — the reference always steps
            # (`dynamic_eval.py:93-111` builds the loss from whatever the
            # greedy decode produced, including nothing).  U is bucketed to
            # 64-token steps so adapt_step compiles a handful of shapes per
            # chunk size instead of one per distinct pseudo-label length.
            U = max(64, -(-len(pseudo_ids) // 64) * 64)
            pseudo = np.full((num_negatives, U), tokenizer.pad_id(), np.int32)
            pseudo[:, : len(pseudo_ids)] = pseudo_ids
            pseudo_len = np.full((num_negatives,), len(pseudo_ids), np.int32)
            reps = jnp.repeat(audio, num_negatives + 1, axis=0)
            lengths = jnp.full((num_negatives + 1,), u_len, jnp.int32)
            key, k2 = jax.random.split(key)
            aug = augmentation(k2, reps[:num_negatives], lengths[:num_negatives])
            batch = jnp.concatenate([aug, reps[num_negatives:]], axis=0)
            params, opt_state, _ = adapt_step(
                params, batch_stats, opt_state, batch, lengths,
                jnp.asarray(pseudo), jnp.asarray(pseudo_len),
            )

            probs = np.exp(clean_lp)
            ratio = u_len / n_valid
            model_outputs[i] = {
                "probs": probs,
                "ds_len": n_valid,
                "overlap_ds": int(overlap / ratio),
            }

    # merge with overlap averaging (params restoration is implicit: the
    # caller's `variables` were never mutated)
    total = spec_n // subsampling_factor + seq_len // subsampling_factor + 16
    all_logits = np.zeros((total, n_classes), np.float64)
    count = np.zeros((total, 1), np.float64)
    pos = 0
    for i in sorted(model_outputs.keys()):
        mo = model_outputs[i]
        if i != 0:
            pos -= mo["overlap_ds"]
        all_logits[pos : pos + mo["ds_len"]] += mo["probs"]
        count[pos : pos + mo["ds_len"]] += 1
        pos += mo["ds_len"]
    seen = count[:, 0] != 0
    return np.log(all_logits[seen] / count[seen]).astype(np.float32)

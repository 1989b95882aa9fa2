"""Single-utterance self-training wrapper.

Counterpart of reference `lcasr/eval/su_selftrain_wrapper.py:12-66`: wraps a
model so each forward first runs n iterations of pseudo-label adaptation on
THAT input (SpecAugmented copies vs greedy pseudo-labels of the clean pass),
then produces the adapted posteriors.  Weight reset is implicit — the
caller's variables are never mutated (pure-functional params).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lcasr_tpu.data.augmentation import SpecAugment
from lcasr_tpu.decoding.greedy import GreedyCTCDecoder
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.optim.madgrad import madgrad


class SelfTrainWrapper:
    def __init__(
        self,
        model,
        variables: Dict,
        tokenizer,
        n_iterations: int = 10,
        num_negatives: int = 1,
        lr: float = 9e-5,
        spec_augment_config: Optional[Dict] = None,
        seed: int = 0,
    ):
        # defaults mirror the reference wrapper (`su_selftrain_wrapper.py:
        # 12-21`): 10 iterations, lr 9e-5, ONE augmented copy vs the clean
        # pass, freq-only SpecAugment (0 time masks, 6 freq masks, param 34)
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.n_iterations = n_iterations
        self.num_negatives = num_negatives
        self.blank_id = tokenizer.vocab_size()
        self.augmentation = SpecAugment(
            **(spec_augment_config or {
                "n_time_masks": 0,
                "n_freq_masks": 6,
                "freq_mask_param": 34,
            })
        )
        self.decoder = GreedyCTCDecoder(tokenizer, blank_id=self.blank_id)
        self.optimizer = madgrad(learning_rate=lr)
        self.key = jax.random.PRNGKey(seed)

        # jitted ONCE here — defining these inside __call__ made every
        # wrapped forward a cold jit cache (full model recompile per
        # utterance even at repeated shapes).  lengths is an argument, so
        # one compile per (T, pseudo-U bucket) serves the whole dataset.
        batch_stats = variables.get("batch_stats", {})
        num_negatives = self.num_negatives
        blank_id = self.blank_id
        optimizer = self.optimizer

        @jax.jit
        def fwd(params, batch, lengths):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                length=lengths,
            )

        @jax.jit
        def adapt(params, opt_state, batch, lengths, pseudo, pseudo_len):
            def loss_fn(p):
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch, length=lengths
                )
                lp = out["final_posteriors"][:num_negatives].astype(jnp.float32)
                return ctc_loss(
                    lp, pseudo, out["length"][:num_negatives], pseudo_len,
                    blank_id=blank_id,
                ) / (lp.shape[0] * lp.shape[1])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return jax.tree.map(lambda a, u: a + u, params, updates), opt_state, loss

        self._fwd, self._adapt = fwd, adapt

    def __call__(self, audio: np.ndarray, length: Optional[np.ndarray] = None):
        """audio (1, 80, T) → adapted model output dict (variables untouched)."""
        model = self.model
        fwd, adapt = self._fwd, self._adapt
        batch_stats = self.variables.get("batch_stats", {})
        params = self.variables["params"]
        opt_state = self.optimizer.init(params)
        audio = jnp.asarray(audio)
        T = audio.shape[-1]
        lengths_all = jnp.full((self.num_negatives + 1,), T, jnp.int32)

        for _ in range(self.n_iterations):
            self.key, k = jax.random.split(self.key)
            reps = jnp.repeat(audio, self.num_negatives + 1, axis=0)
            aug = self.augmentation(k, reps[: self.num_negatives])
            batch = jnp.concatenate([aug, reps[self.num_negatives :]], axis=0)
            out = fwd(params, batch, lengths_all)
            clean_lp = np.asarray(out["final_posteriors"][-1], np.float32)
            pseudo_text = self.decoder(clean_lp)
            ids = self.tokenizer.encode(pseudo_text) if pseudo_text else []
            # an empty decode still adapts (zero-length targets = blank
            # supervision) — the reference wrapper always steps
            # (`su_selftrain_wrapper.py:43-56`)
            # bucket U to bound adapt recompiles (pseudo_len masks the pad)
            U = max(16, -(-len(ids) // 16) * 16)
            row = ids + [self.tokenizer.pad_id()] * (U - len(ids))
            pseudo = jnp.asarray([row] * self.num_negatives, jnp.int32)
            pseudo_len = jnp.full((self.num_negatives,), len(ids), jnp.int32)
            params, opt_state, _ = adapt(
                params, opt_state, batch, lengths_all, pseudo, pseudo_len
            )

        final = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audio,
            length=jnp.asarray(length) if length is not None else None,
        )
        return final

"""Meta-loss-prediction trainer (reference `exp/train_utterance_meta_loss_pred.py`).

Trains ONLY the meta branch of `SCConformerMeta` to predict the gradient of
the CTC loss w.r.t. the encoder's output representations:

  * forward the frozen encoder → `reprs` (reference keeps `retain_grad` on
    the live tensor, `sconformer_meta.py:444-446`; here `encode` /
    `decode_reprs` are split methods so the true gradient is one `jax.grad`),
  * `repr_grads = d ctc_loss / d reprs` (reference trainer `:192-194`),
  * meta branch predicts them from (logits, initial_signal) (`:196-199`),
  * objective l2 | mse | cosine (`:103-108`), row-normalized by
    `batch·chunk·6` (the reference's hard-coded divisor, `:199`),
  * a permuted-rows control loss (`meta_loss_2`, `:200`) and the mean
    cosine dissimilarity (`cosim`, `:201`) are logged each step,
  * optimizer updates are MASKED to the meta parameters (the reference
    freezes everything else via requires_grad, `sconformer_meta.py:287-295`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lcasr_tpu.config import Config
from lcasr_tpu.models.base import decay_mask
from lcasr_tpu.models.sconformer_meta import SCConformerMeta, meta_param_mask
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.optim.factory import build_optimizer, set_learning_rate
from lcasr_tpu.optim.scheduling import CosineLRScheduler
from lcasr_tpu.training.metrics import MetricsLogger


def make_meta_loss_fn(kind: str):
    """Reference `train_utterance_meta_loss_pred.py:103-108`.  Inputs are
    (rows, V) flattened; `d` is the normalizing divisor."""
    if kind == "l2":
        return lambda a, b, d: jnp.sqrt(((a - b) ** 2).sum(-1) + 1e-12).sum() / d
    if kind == "mse":
        return lambda a, b, d: ((a - b) ** 2).sum() / d
    if kind == "cosine":
        return lambda a, b, d: (1.0 - _cos_sim(a, b)).mean()
    raise ValueError(f"unknown meta loss {kind!r}")


def _cos_sim(a, b, eps: float = 1e-8):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return (an * bn).sum(-1)


class MetaTrainer:
    """Utterance-level meta-gradient-prediction training loop."""

    def __init__(self, config: Config, model: SCConformerMeta, tokenizer,
                 checkpoint_dir: Optional[str] = None):
        self.config = config
        self.model = model
        self.tokenizer = tokenizer
        tr = config.get("training", Config({}))
        self.loss_kind = tr.get("loss", "l2")
        self.clip_value = tr.get("clip_value", 0.8)
        self.max_epochs = tr.get("max_epochs", 1)
        self.batch_size = tr.get("batch_size", 2)
        self.chunk_size = config.get("audio_chunking", Config({})).get("size", 2048)
        self.blank_id = tokenizer.vocab_size() if tokenizer is not None else (
            model.vocab_size
        )
        opt_cfg = config.get("optimizer", Config({}))
        self.opt_args = opt_cfg.get("args", Config({}))
        self.optimizer_name = opt_cfg.get("name", "madgrad")
        sched_cfg = config.get("scheduler", Config({}))
        self.scheduler = CosineLRScheduler(
            warmup_steps=sched_cfg.get("warmup_steps", 0),
            peak_value=self.opt_args.get("lr", 1e-3),
            # reference decays the cosine to ZERO (general.py:92)
            final_value=sched_cfg.get("final_value", 0.0),
        )
        self.metrics = MetricsLogger(
            log_dir=checkpoint_dir or "./checkpoints",
            use_wandb=config.get("wandb", Config({})).get("use", False),
        )
        self._step = None

    # -- state -----------------------------------------------------------------
    def init_state(self, rng_key=None):
        key = rng_key if rng_key is not None else jax.random.PRNGKey(12345)
        dummy = jnp.zeros((1, 80, 256), jnp.float32)
        variables = self.model.init(key, dummy, jnp.array([256]))
        params = variables["params"]
        # the masked wrapper runs clip+optimizer over meta params ONLY — the
        # frozen encoder's (ignored) grads can't pollute the global-norm clip.
        # optax.masked passes UNMASKED updates through unchanged, so frozen
        # params are additionally forced to zero updates (ADVICE r2): without
        # it, correctness would rest on the meta objective having exactly-zero
        # encoder gradients — silently broken if meta_predict ever gained a
        # dependence on shared params (e.g. learned rotary frequencies).
        mask = meta_param_mask(params)
        inv_mask = jax.tree.map(lambda m: not m, mask)
        self.optimizer = optax.chain(
            optax.masked(
                build_optimizer(
                    name=self.optimizer_name,
                    lr=self.opt_args.get("lr", 1e-3),
                    weight_decay=self.opt_args.get("weight_decay", 0.0),
                    clip_value=self.clip_value,
                    # reference-effective grouping (models/base.decay_mask):
                    # of the meta branch only its norm scales decay.  Passed
                    # as a CALLABLE so it is evaluated on the MaskedNode-
                    # pruned params optax.masked hands the inner optimizer
                    weight_decay_mask=lambda p: decay_mask(p, model=self.model),
                ),
                mask,
            ),
            optax.masked(optax.set_to_zero(), inv_mask),
        )
        return {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.optimizer.init(params),
            "key": jax.random.PRNGKey(999),
        }

    # -- one jitted step ---------------------------------------------------------
    def _step_fn(self):
        if self._step is not None:
            return self._step
        model = self.model
        meta_loss_fn = make_meta_loss_fn(self.loss_kind)
        blank_id = self.blank_id
        norm_div = float(self.batch_size * self.chunk_size * 6)

        @jax.jit
        def step(params, batch_stats, opt_state, audio, audio_lengths,
                 labels, label_lengths, key):
            variables = {"params": params, "batch_stats": batch_stats}
            enc, enc_mut = model.apply(
                variables, audio, audio_lengths, True,
                method=SCConformerMeta.encode, mutable=["batch_stats"],
            )
            reprs = jax.lax.stop_gradient(enc["reprs"])
            initial = jax.lax.stop_gradient(enc["initial_signal"])

            def am_loss(r):
                lp = model.apply(variables, r, method=SCConformerMeta.decode_reprs)
                return ctc_loss(lp, labels, enc["length"], label_lengths,
                                blank_id=blank_id)

            original_loss, repr_grads = jax.value_and_grad(am_loss)(reprs)
            repr_grads = jax.lax.stop_gradient(repr_grads)
            logits = jax.lax.stop_gradient(
                model.apply(variables, reprs, True,
                            method=SCConformerMeta.decode_reprs)
            )

            def meta_obj(p):
                gp, mut = model.apply(
                    {"params": p, "batch_stats": enc_mut["batch_stats"]},
                    logits, initial, enc["lengths_arg"], True,
                    method=SCConformerMeta.meta_predict, mutable=["batch_stats"],
                )
                a = repr_grads.reshape(-1, repr_grads.shape[-1])
                b = gp.astype(jnp.float32).reshape(-1, gp.shape[-1])
                return meta_loss_fn(a, b, norm_div), (mut["batch_stats"], b)

            (meta_loss_1, (new_stats, pred_rows)), grads = jax.value_and_grad(
                meta_obj, has_aux=True
            )(params)

            # control: same objective against ROW-PERMUTED true gradients
            # (reference `:200`) — how much better than chance the fit is
            rows = repr_grads.reshape(-1, repr_grads.shape[-1])
            perm = jax.random.permutation(key, rows.shape[0])
            meta_loss_2 = meta_loss_fn(rows[perm], pred_rows, norm_div)
            cosim = (1.0 - _cos_sim(rows, pred_rows)).mean()

            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            blank_p = (logits.argmax(-1) == blank_id).mean()
            return (new_params, new_stats, new_opt, meta_loss_1, meta_loss_2,
                    cosim, original_loss, blank_p)

        self._step = step
        return step

    # -- loop (reference `:120-250`) --------------------------------------------
    def train_utterances(self, state, dataloader, epochs: Optional[int] = None):
        step_fn = self._step_fn()
        step = 0
        for epoch in range(epochs if epochs is not None else self.max_epochs):
            for batch_np in dataloader:
                a = np.asarray(batch_np["audio"], np.float32)
                audio = np.zeros((a.shape[0], 80, -(-a.shape[-1] // 256) * 256),
                                 np.float32)
                audio[:, :, : a.shape[-1]] = a
                t = np.asarray(batch_np["text"], np.int64)
                labels = np.zeros((t.shape[0], -(-t.shape[-1] // 16) * 16), np.int64)
                labels[:, : t.shape[-1]] = t
                state["key"], sub = jax.random.split(state["key"])
                lr = self.scheduler.step()
                state["opt_state"] = set_learning_rate(state["opt_state"], lr)
                (state["params"], state["batch_stats"], state["opt_state"],
                 ml1, ml2, cosim, orig, blank_p) = step_fn(
                    state["params"], state["batch_stats"], state["opt_state"],
                    jnp.asarray(audio),
                    jnp.asarray(np.asarray(batch_np["audio_lengths"], np.int32)),
                    jnp.asarray(labels),
                    jnp.asarray(np.asarray(batch_np["text_lengths"], np.int32)),
                    sub,
                )
                frames = max(int(np.asarray(batch_np["audio_lengths"]).sum()), 1)
                step += 1
                self.metrics.log({
                    "meta_loss_1": float(ml1),
                    "meta_loss_2": float(ml2),
                    "cosim": float(cosim),
                    "original_loss": float(orig) / frames * 100,
                    "blank_p": float(blank_p),
                    "learning_rate": lr,
                    "epoch": epoch,
                    "utterance_step": step,
                })
        return state

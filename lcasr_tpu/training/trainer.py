"""Chunked long-form CTC training loop.

TPU-native counterpart of reference `exp/train.py:80-349`:

  * one batch = a set of full podcasts; chunk_spectogram / chunk_text_json
    split them into `chunk_size`-frame windows trained sequentially,
  * gradient accumulation split into `backwards_every` (grad computation per
    n chunks) and `backprop_every` (optimizer step per n chunks), loss
    weighted by 100·steps_since_backwards/(chunk_size·batch_size)
    (reference `:274-293` — weighting kept faithful, including the
    steps_since_backwards factor),
  * loss logged per acoustic frame (`:280-284`), blank-probability metric,
  * NaN-loss skip with accumulator reset + abort after 100 consecutive NaNs
    (`:253-261`),
  * mid-epoch checkpointing every save_every_n_steps podcasts (`:156-171`),
    epoch rollover reshuffles with fresh seed (`:135-148`),
  * SequenceWarmupManager integration: ×2 seq len / ×0.5 batch, dataloader
    rebuild, optional rotary-interpolation bump (`:322-335`),
  * warmup-by-steps → cosine-by-podcasts scheduler handoff (`:203-207,319-320`).

XLA-specific design:
  * every chunk is padded to the static (batch, 80, chunk_size) shape with a
    per-sample validity mask instead of the reference's shrinking batches —
    one compiled program per (chunk_size, batch, label-bucket),
  * finished samples get weight 0 rather than being removed (static shapes),
  * label tensors are bucketed to multiples of 64 to bound recompiles,
  * grad accumulation happens on-device in an fp32 tree; the LR is a dynamic
    scalar through inject_hyperparams (no recompile on schedule changes),
  * multi-chip: `config.parallel.mesh` (e.g. {data: 8}) builds a
    (data, model, seq) mesh; inputs are batch-sharded on `data` (B padded to
    a data-axis multiple with weight-0 rows), params laid out by
    `parallel.partition.param_shardings` (TP on the model axis), and the
    jitted micro/apply steps run SPMD with XLA-inserted collectives,
  * the dreaded "CUDA illegal memory access skip" (`:311-314`) has no TPU
    analogue and is intentionally absent.
"""
from __future__ import annotations

import functools
import random
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lcasr_tpu.config import Config
from lcasr_tpu.data.augmentation import SpecAugment
from lcasr_tpu.data.dataloading import (
    VariableBatchSimpleDataloader,
    chunk_spectogram,
    chunk_text_json,
    reset_seen_ids,
)
from lcasr_tpu.models.base import decay_mask
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.optim.factory import build_optimizer, set_learning_rate
from lcasr_tpu.optim.scheduling import CosineLRScheduler, SequenceWarmupManager
from lcasr_tpu.training import checkpointing
from lcasr_tpu.training.metrics import MetricsLogger

LABEL_BUCKET = 64


def _bucket(n: int, multiple: int = LABEL_BUCKET) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def make_chunks(
    audio: np.ndarray,  # (B, 80, T)
    audio_lengths: np.ndarray,  # (B,)
    txt: List[list],
    tokenizer,
    chunk_size: int,
    chunk_overlap: int,
    pad_id: int,
) -> List[Dict[str, np.ndarray]]:
    """Chunk a batch of podcasts into fixed-shape training chunks.

    Mirrors reference `exp/train.py:174-201` but keeps the batch dimension
    static: finished samples stay in the batch with weight 0.
    """
    B = audio.shape[0]
    audio_chunks = chunk_spectogram(audio, chunk_size, chunk_overlap)
    txt_chunks = [
        chunk_text_json(t, chunk_size, chunk_overlap, audio.shape[-1]) for t in txt
    ]
    culm = np.zeros(B, np.int64)
    out = []
    for ix, chunk in enumerate(audio_chunks):
        active = culm <= audio_lengths  # sample still has frames left
        u_len = chunk.shape[-1]
        # reference length formula (exp/train.py:185): the -chunk_overlap
        # term compensates culm's per-chunk overshoot when overlap > 0
        # (identical to audio_lengths - culm at overlap 0)
        cur_lengths = u_len - np.clip(
            culm + u_len - audio_lengths - chunk_overlap, 0, None
        )
        cur_lengths = np.clip(cur_lengths, 0, u_len) * active

        enc = [
            tokenizer.encode(txt_chunks[b][ix]) if active[b] else []
            for b in range(B)
        ]
        t_lens = np.array([len(e) for e in enc], np.int64)
        if t_lens.max(initial=0) == 0:
            culm += u_len - (chunk_overlap if ix != 0 else 0)
            continue  # skip textless chunk (reference :191-192)
        U = _bucket(int(t_lens.max()))
        labels = np.full((B, U), pad_id, np.int64)
        for b, e in enumerate(enc):
            labels[b, : len(e)] = e

        padded = chunk
        if u_len < chunk_size:
            padded = np.pad(chunk, ((0, 0), (0, 0), (0, chunk_size - u_len)))

        # NOTE: live rows with EMPTY transcripts keep weight 1 — the
        # reference's CTCLoss accepts zero-length targets, training the
        # model to emit blanks on silent/untranscribed spans (only an
        # all-empty chunk is skipped, above); ops/ctc.py handles
        # label_length == 0 the same way
        weight = (active & (cur_lengths > 0)).astype(np.float32)
        out.append(
            {
                "audio": padded.astype(np.float32),
                "audio_lengths": cur_lengths.astype(np.int32),
                "labels": labels,
                "label_lengths": t_lens.astype(np.int32),
                "weight": weight,
            }
        )
        culm += u_len - (chunk_overlap if ix != 0 else 0)
    return out


class Trainer:
    def __init__(
        self,
        config: Config,
        model,
        tokenizer,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.tokenizer = tokenizer

        # multi-chip execution: a (data, model, seq) mesh either passed in or
        # built from config.parallel.mesh — batch-axis (data) sharding is the
        # primary scaling strategy (SURVEY §7 step 7; the reference trained
        # one GPU per run, so DP over a v5e-8 is this framework's main win).
        # TP falls out of param_shardings on the model axis.
        self.mesh = mesh
        par_cfg = config.get("parallel", Config({}))
        mesh_shape = par_cfg.get("mesh", None)
        if self.mesh is None and mesh_shape:
            from lcasr_tpu.parallel.mesh import make_mesh

            shape = (
                mesh_shape.to_dict() if hasattr(mesh_shape, "to_dict") else dict(mesh_shape)
            )
            need = int(np.prod([max(1, int(v)) for v in shape.values()]))
            if need <= len(jax.devices()):
                self.mesh = make_mesh(shape)
            else:
                print(
                    f"parallel.mesh {shape} needs {need} devices, have "
                    f"{len(jax.devices())} — running single-device"
                )
        self._param_sh = None  # set by init_state when a mesh is active
        # ZeRO-style optimizer-state sharding over the data axis: MADGRAD's
        # three fp32 trees + both grad accumulators shard over `data`
        # (partition.zero_spec); XLA computes the update data-sharded and
        # all-gathers only the param delta once per optimizer step
        self.zero_opt = bool(par_cfg.get("zero_optimizer", False))
        self._grads_sh = None
        # context parallelism: seq-axis mesh shards split every chunk's time
        # axis across devices (full-model CP — parallel/cp_model.py).  This
        # is how the reference's longest config (360k frames = 1 h, batch 1,
        # reference exp/configs/README.md:84-93) trains when one chip's HBM
        # can't hold the activations.
        # .get: an externally passed mesh (the `mesh=` constructor arg) may
        # carry only a 'data' axis — absent seq means no context parallelism
        self.cp_shards = self.mesh.shape.get("seq", 1) if self.mesh is not None else 1
        self.checkpoint_dir = checkpoint_dir or config.get("checkpointing", Config({})).get("dir", "./checkpoints")

        tr = config.get("training", Config({}))
        # 'ctc' (SCConformerXL/Mamba) or 'enc_dec' (AED joint loss,
        # reference exp/train_enc_dec.py)
        self.loss_mode = tr.get("loss_mode", "ctc")
        self.ctc_loss_weight = config.get("model", Config({})).get("ctc_loss_weight", 0.5)
        self.backprop_every = tr.get("backprop_every", 1)
        self.backwards_every = tr.get("backwards_every", 1)
        assert self.backprop_every >= self.backwards_every
        self.clip_value = tr.get("clip_value", 0.8)
        # segmented CTC backward (ops/ctc.py): O((T/K + K)·S) residuals
        # instead of O(T·S) — set for 1-hour lattices where the monolithic
        # alphas/emissions are ~3.2 GB each (docs/MEMORY_BUDGET_1H.md)
        self.ctc_segment_size = tr.get("ctc_segment_size", None)
        self.max_epochs = tr.get("max_epochs", 1)
        self.batch_size = tr.get("batch_size", 2)
        self.chunk_size = config.get("audio_chunking", Config({})).get("size", 2048)
        self.chunk_overlap = 0  # reference uses 0 in training (exp/train.py:115)

        self.blank_id = tokenizer.vocab_size()  # blank is last of vocab+1

        opt_cfg = config.get("optimizer", Config({}))
        self.opt_args = opt_cfg.get("args", Config({}))
        self.optimizer_name = opt_cfg.get("name", "madgrad")
        # reference general.py:72-77: 'default' = model param groups,
        # 'none' = decay on all params
        self.weight_decay_groups = opt_cfg.get("weight_decay_groups", "default")
        if self.weight_decay_groups not in ("default", "none"):
            raise NotImplementedError(
                f"Unknown weight_decay_groups {self.weight_decay_groups}, "
                f"must be one of [default, none]"
            )

        sched_cfg = config.get("scheduler", Config({}))
        self.scheduler = CosineLRScheduler(
            warmup_steps=sched_cfg.get("warmup_steps", 0),
            peak_value=self.opt_args.get("lr", 1e-3),
            # reference decays the cosine to ZERO (general.py:92)
            final_value=sched_cfg.get("final_value", 0.0),
        )

        self.sequence_scheduler = None
        if "sequence_scheduler" in config:
            self.sequence_scheduler = SequenceWarmupManager(
                initial_batch_size=self.batch_size,
                initial_sequence_length=self.chunk_size,
                **config["sequence_scheduler"].to_dict(),
            )
            self.chunk_size = self.sequence_scheduler.cur_sequence_length
            self.batch_size = self.sequence_scheduler.cur_batch_size

        if self.cp_shards > 1:
            assert self.loss_mode == "ctc", (
                "context-parallel training supports loss_mode='ctc' only"
            )
            sf = getattr(self.model, "subsampling_factor", 8)
            assert self.chunk_size % (self.cp_shards * sf) == 0, (
                f"audio_chunking.size={self.chunk_size} must divide seq "
                f"shards ({self.cp_shards}) x subsampling factor ({sf})"
            )

        self.augmentation = None
        if "spec_augment" in config:
            self.augmentation = SpecAugment(**config["spec_augment"].to_dict())
        self.start_augment_after_n_epochs = tr.get("start_spec_augment_after_n_epochs", -1)
        if self.augmentation is not None and self.start_augment_after_n_epochs == -1:
            # reference-parity gate (exp/train.py:64-68): -1 disables the
            # augment even when a spec_augment block exists — warn, because
            # a config author who wrote the block almost certainly wants
            # training.start_spec_augment_after_n_epochs set (e.g. 0)
            import warnings

            warnings.warn(
                "spec_augment is configured but "
                "training.start_spec_augment_after_n_epochs is unset/-1 — "
                "augmentation will NEVER be applied",
                stacklevel=2,
            )

        self.rotary_interp_bump = bool(
            config.get("model", Config({})).get("use_rotary", False)
            and config.get("sequence_scheduler", Config({})).get("interpolate_rotary", False)
        )
        self.rotary_interpolation_factor = config.get("model", Config({})).get(
            "rotary_interpolation_factor", 1.0
        )

        self.metrics = MetricsLogger(
            log_dir=self.checkpoint_dir,
            use_wandb=config.get("wandb", Config({})).get("use", False),
            wandb_config=config.get("wandb", Config({})).to_dict() if "wandb" in config else None,
        )

        self.debug_hooks = False  # per-parameter grad stats (reference -debug_hooks)

    # -- state ----------------------------------------------------------------
    def init_state(self, rng_key=None):
        key = rng_key if rng_key is not None else jax.random.PRNGKey(12345)
        dummy = jnp.zeros((1, 80, 256), jnp.float32)
        if self.loss_mode == "enc_dec":
            # flax init is lazy: without a text_sequence the AED decoder
            # branch never runs and its params are never created, crashing
            # the first enc_dec micro step with ScopeParamNotFoundError
            variables = self.model.init(
                key, dummy, jnp.zeros((1, 4), jnp.int32), length=jnp.array([256])
            )
        else:
            variables = self.model.init(key, dummy, length=jnp.array([256]))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.optimizer = build_optimizer(
            name=self.optimizer_name,
            lr=self.opt_args.get("lr", 1e-3),
            weight_decay=self.opt_args.get("weight_decay", 0.0),
            momentum=self.opt_args.get("momentum", 0.9),
            clip_value=self.clip_value,
            weight_decay_mask=(
                decay_mask(params, model=self.model)
                if self.weight_decay_groups == "default" else None
            ),
        )
        if self.mesh is not None:
            from lcasr_tpu.parallel.partition import (
                opt_state_shardings,
                param_shardings,
                zero_shardings,
            )

            self._param_sh = param_shardings(params, self.mesh)
            params = jax.device_put(params, self._param_sh)
            if batch_stats:
                batch_stats = jax.device_put(
                    batch_stats, NamedSharding(self.mesh, P())
                )
            # optimizer-state shardings PINNED to the param layout (madgrad's
            # gss/s/x0 mirror params) — jit inference could pick a replicated
            # layout that silently triples per-chip optimizer memory under TP.
            # zero_optimizer additionally shards them over `data`.
            opt_shapes = jax.eval_shape(self.optimizer.init, params)
            self._opt_sh = opt_state_shardings(
                opt_shapes, params, self._param_sh, self.mesh,
                zero=self.zero_opt,
            )
            if self.zero_opt:
                self._grads_sh = zero_shardings(
                    self._param_sh, params, self.mesh
                )
            opt_state = jax.jit(
                self.optimizer.init, out_shardings=self._opt_sh
            )(params)
        else:
            opt_state = self.optimizer.init(params)
        return {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "key": jax.random.PRNGKey(999),
        }

    # -- batch placement --------------------------------------------------------
    def _device_batch(self, chunk: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Put one chunk on device.  Under a mesh the batch axis is sharded
        over `data`; B is padded up to a data-axis multiple with weight-0
        rows (static shapes — the finished-sample convention already gives
        zero-length rows zero loss and zero batch-stat contribution).  Under
        context parallelism the audio time axis is additionally sharded over
        `seq` so each device uploads/holds only its shard."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in chunk.items()}
        d = self.mesh.shape["data"]
        B = chunk["audio"].shape[0]
        pad = (-B) % d
        out = {}
        for k, v in chunk.items():
            if pad:
                v = np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                )
            if k == "audio" and self.cp_shards > 1:
                spec = P("data", None, "seq")
            else:
                spec = P("data", *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def _zero_grads_fn(self, params):
        """Zero fp32 gradient tree, laid out like the params (sharded under
        a mesh so accumulation never gathers)."""
        zeros = lambda p: jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), p
        )
        if self._grads_sh is not None:  # ZeRO: accumulators shard over data
            return jax.jit(zeros, out_shardings=self._grads_sh)
        if self._param_sh is not None:
            return jax.jit(zeros, out_shardings=self._param_sh)
        return jax.jit(zeros)

    # -- compiled steps ---------------------------------------------------------
    def _micro_step_fn(self):
        model = self.model
        blank_id = self.blank_id
        augmentation = self.augmentation

        # NOTE: no buffer donation — the axon tunnel backend does not
        # support input/output aliasing (donated buffers trigger
        # INVALID_ARGUMENT on reuse); revisit on direct-attached TPUs.
        loss_mode = self.loss_mode
        ctc_w = self.ctc_loss_weight
        ctc_seg = self.ctc_segment_size
        cp = self.cp_shards > 1
        mesh = self.mesh
        grads_sh = self._grads_sh

        def forward(p, batch_stats, audio, lengths):
            """model.apply — or, under context parallelism, the seq-sharded
            shard_map apply (subsampling/conv halo exchange, offset rotary,
            CP attention, psum'd renorm stats) composed with the data axis."""
            if cp:
                from lcasr_tpu.parallel.cp_model import context_parallel_apply

                return context_parallel_apply(
                    model, {"params": p, "batch_stats": batch_stats},
                    audio, mesh, lengths=lengths, train=True,
                    data_axis="data", mutable=True,
                )
            return model.apply(
                {"params": p, "batch_stats": batch_stats},
                audio, length=lengths, train=True, mutable=["batch_stats"],
            )

        @functools.partial(jax.jit, static_argnames=("augment",))
        def micro_step(params, batch_stats, batch, key, grads_acc, augment=False):
            audio = batch["audio"]
            if augment and augmentation is not None:
                audio = augmentation(key, audio, batch["audio_lengths"])

            def loss_fn(p):
                if loss_mode == "enc_dec":
                    # joint CTC + CE (reference exp/train_enc_dec.py:240-247;
                    # loss normalizations per enc_dec_sconformer.py:193-228:
                    # the BACKWARD loss is w·ctc_sum/(B·N)·100 +
                    # (1-w)·ce_sum/(B·U1) — normalized per chunk BEFORE the
                    # outer 100·group/(chunk·batch) accumulation weighting,
                    # unlike the plain-CTC protocol's raw sums.  B and N are
                    # the reference's COMPACTED-batch dims: live rows only,
                    # N = subsampled true window width (our padded batch
                    # carries dead rows and pad frames the reference never
                    # sees), U1 = true max label length + 1 (bos), not our
                    # 64-bucketed pad width.
                    # bos_id=0, matching calc_loss's default — the reference
                    # training loop never overrides it
                    # (exp/train_enc_dec.py:240, enc_dec_sconformer.py:184)
                    text_bos = jnp.pad(
                        batch["labels"], ((0, 0), (1, 0)), constant_values=0
                    )
                    out, mutated = model.apply(
                        {"params": p, "batch_stats": batch_stats},
                        audio,
                        text_sequence=text_bos,
                        length=batch["audio_lengths"],
                        train=True,
                        mutable=["batch_stats"],
                    )
                    lm_out = out["final_posteriors_lm"].astype(jnp.float32)
                    ctc_out = out["final_posteriors_ctc"]
                    live = batch["weight"] > 0
                    n_live = jnp.maximum(live.sum().astype(jnp.float32), 1.0)
                    # reference N = ctc_out.shape[1] of the compacted chunk
                    # tensor = subsampled(window width); the window's longest
                    # live row spans it, so max(out_length) is exact whenever
                    # any row fills the window (always, except a final chunk
                    # in which every sample ended early)
                    n_sub = jnp.maximum(
                        jnp.max(out["length"]).astype(jnp.float32), 1.0
                    )
                    loss = 0.0
                    if ctc_out is not None and ctc_w > 0:
                        nll = ctc_loss(
                            ctc_out.astype(jnp.float32),
                            batch["labels"],
                            out["length"],
                            batch["label_lengths"],
                            blank_id=blank_id,
                            reduction="none",
                            segment_size=ctc_seg,
                        )
                        # impossible alignments return the ~1e30 lattice
                        # sentinel (finite, so the NaN skip never fires);
                        # their grads are already exact-zero, so excluding
                        # them here only keeps the loss metric honest
                        nll = jnp.where(nll < 1e29, nll, 0.0)
                        ctc_sum = (nll * batch["weight"]).sum()
                        loss = loss + ctc_w * ctc_sum / (n_live * n_sub) * 100.0
                    # CE on shifted targets with eos=0 at final position
                    B, U1 = text_bos.shape
                    targets = jnp.concatenate(
                        [text_bos[:, 1:], jnp.zeros((B, 1), text_bos.dtype)], axis=1
                    )
                    pos = jnp.arange(U1)[None, :]
                    t_len_bos = batch["label_lengths"] + 1
                    targets = jnp.where(pos == (t_len_bos - 1)[:, None], 0, targets)
                    valid = (pos < t_len_bos[:, None]) & (batch["weight"] > 0)[:, None]
                    logp = jax.nn.log_softmax(lm_out, axis=-1)
                    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
                    ce_sum = jnp.where(valid, ce, 0.0).sum()
                    # reference lm_loss_to_bwd divisor: predictions.shape[0]
                    # × shape[1] = B_live · (true max label len + 1 bos)
                    u1_ref = jnp.maximum(
                        jnp.max(
                            jnp.where(live, batch["label_lengths"], 0)
                        ).astype(jnp.float32) + 1.0,
                        1.0,
                    )
                    loss = loss + (1 - ctc_w) * ce_sum / (n_live * u1_ref)
                    blank_p = jnp.asarray(0.0)
                    return loss, (mutated["batch_stats"], blank_p)

                out, mutated = forward(
                    p, batch_stats, audio, batch["audio_lengths"]
                )
                log_probs = out["final_posteriors"].astype(jnp.float32)
                nll = ctc_loss(
                    log_probs,
                    batch["labels"],
                    out["length"],
                    batch["label_lengths"],
                    blank_id=blank_id,
                    reduction="none",
                    segment_size=ctc_seg,
                )
                # see enc_dec branch: exclude the impossible-alignment
                # sentinel (~1e30, grads already zero) from the loss metric
                nll = jnp.where(nll < 1e29, nll, 0.0)
                loss = (nll * batch["weight"]).sum()
                # blank probability metric (reference exp/train.py:35-43) —
                # over LIVE frames only: the static batch carries weight-0
                # rows and padded frames the reference's shrinking batches
                # never have, which would skew the collapse metric late in a
                # podcast
                am = log_probs.argmax(-1)
                t_live = (
                    jnp.arange(am.shape[1])[None, :] < out["length"][:, None]
                )
                live = t_live & (batch["weight"] > 0)[:, None]
                blank_p = jnp.where(live, am == blank_id, False).sum() / jnp.maximum(
                    live.sum(), 1
                )
                return loss, (mutated["batch_stats"], blank_p)

            (loss, (new_stats, blank_p)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), grads_acc, grads
            )
            if grads_sh is not None:
                # ZeRO: keep the accumulator data-sharded — the fresh grad is
                # data-replicated (post-psum), so the add slices it locally
                grads_acc = jax.lax.with_sharding_constraint(
                    grads_acc, grads_sh
                )
            return loss, grads_acc, new_stats, blank_p

        return micro_step

    def _apply_updates_fn(self):
        optimizer = self.optimizer
        param_sh = self._param_sh
        opt_sh = getattr(self, "_opt_sh", None)

        def apply_updates(params, opt_state, grads, weight):
            grads = jax.tree.map(lambda g: g * weight, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            if param_sh is not None:
                # keep the TP layout stable across optimizer steps
                params = jax.lax.with_sharding_constraint(params, param_sh)
            return params, opt_state

        if param_sh is not None and opt_sh is not None:
            # pin BOTH output layouts: under zero_optimizer the update runs
            # data-sharded (state operands) and only the param delta
            # all-gathers back to the param layout
            return jax.jit(
                apply_updates, out_shardings=(param_sh, opt_sh)
            )
        return jax.jit(apply_updates)

    @staticmethod
    @jax.jit
    def _fold_group(grads_acc, group_grads, weight):
        """Fold a backwards_every group's raw gradient into the main
        accumulator with the reference's per-group loss weight
        (exp/train.py:275: backward of group_loss·100·group_size/(chunk·batch)
        — by linearity, the raw group gradient scaled by that factor)."""
        return jax.tree.map(lambda a, g: a + g * weight, grads_acc, group_grads)

    # -- training loop ----------------------------------------------------------
    def train(
        self,
        state: Dict[str, Any],
        dataloader: VariableBatchSimpleDataloader,
        step: int = 0,
        epoch: int = 0,
        seen_ids: Optional[List[str]] = None,
    ):
        cfg = self.config
        seen_ids = list(seen_ids or [])
        pad_id = self.tokenizer.pad_id()
        save_every = cfg.get("checkpointing", Config({})).get("save_every_n_steps", 1000)

        micro_step = self._micro_step_fn()
        apply_updates = self._apply_updates_fn()

        zero_fn = self._zero_grads_fn(state["params"])
        zero_grads = lambda: zero_fn(state["params"])
        grads_acc = zero_grads()

        cur_podcast, last_save = step, step
        total_recordings = dataloader.total_recordings() * self.max_epochs
        nans_in_a_row = 0
        # resuming an already-completed run must not train an extra epoch
        finished = epoch >= self.max_epochs
        data_iter = iter(dataloader)
        rng = random.Random(cfg.get("training", Config({})).get("random_seed", 12345))

        while not finished:
            try:
                audio, audio_lengths, txt, ids = next(data_iter)
            except StopIteration:
                epoch += 1
                seen_ids = reset_seen_ids(seen_ids, epoch - 1)
                if epoch >= self.max_epochs:
                    finished = True
                    continue
                dataloader.update(
                    batch_size=dataloader.batch_size,
                    seen_ids=seen_ids,
                    random_seed=rng.randint(0, 10000),
                )
                data_iter = iter(dataloader)
                continue

            # reference parity (exp/train.py:152): the batch is marked seen
            # BEFORE training it, so a crash mid-batch skips it on resume —
            # deliberate upstream ("avoid dodgy batch that caused the
            # crash", run_restarter.py:69); worst case one batch of data
            # per crash
            seen_ids.extend(ids)
            cur_batch_size = audio.shape[0]
            cur_podcast += cur_batch_size

            if cur_podcast - last_save > save_every:
                self.save(state, cur_podcast, epoch, seen_ids)
                last_save = cur_podcast
                # marker row: lets post-processing (ladder/throughput
                # analysis) attribute the wall-time gap to checkpoint I/O
                # instead of the next training step
                self.metrics.log({"checkpoint_saved": cur_podcast})

            # warmup → cosine handoff (reference :203-207)
            if self.scheduler.is_warmup and not self.scheduler.is_warming_up():
                self.scheduler.set_cosine_schedule(
                    total_recordings=total_recordings, cur_podcast=cur_podcast
                )

            chunks = make_chunks(
                audio, audio_lengths, txt, self.tokenizer,
                self.chunk_size, self.chunk_overlap, pad_id,
            )
            # marker row at batch start (host chunking done): the ts delta
            # from here to the first loss row isolates upload+compile+step
            # of the batch's first chunk from the host-side chunking cost
            self.metrics.log({
                "batch_chunks": len(chunks),
                "podcast": cur_podcast,
                "sequence_length": self.chunk_size,
                "batch_size": self.batch_size,
            })

            augment = (
                self.start_augment_after_n_epochs != -1
                and epoch >= self.start_augment_after_n_epochs
                and self.augmentation is not None
                and not self.scheduler.is_warmup
            )

            cur_loss, cur_frames, steps_since_bw = 0.0, 0, 0
            blank_prob = 0.0
            group_grads = zero_grads()

            for ix, chunk in enumerate(chunks):
                batch = self._device_batch(chunk)
                state["key"], sub = jax.random.split(state["key"])
                loss, group_grads, new_stats, blank_p = micro_step(
                    state["params"], state["batch_stats"], batch, sub, group_grads,
                    augment=augment,
                )
                loss_f = float(loss)
                if not np.isfinite(loss_f):
                    # reference :253-261 zeroes ALL pending gradients on NaN
                    self.metrics.log({"nan": True})
                    grads_acc = zero_grads()
                    group_grads = zero_grads()
                    steps_since_bw = 0
                    nans_in_a_row += 1
                    if nans_in_a_row > 100:
                        raise RuntimeError("100 NaNs in a row, aborting")
                    continue
                nans_in_a_row = 0
                state["batch_stats"] = new_stats
                blank_prob = float(blank_p)

                cur_loss += loss_f
                cur_frames += int(chunk["audio_lengths"].sum())
                steps_since_bw += 1

                is_last = ix + 1 == len(chunks)
                if (ix + 1) % self.backwards_every == 0 or is_last:
                    # reference per-GROUP loss weighting (exp/train.py:275):
                    # each backwards_every group's gradient is scaled by
                    # 100·group_size/(chunk·batch), not the whole accumulator
                    weight = (
                        100.0
                        * steps_since_bw
                        / (self.chunk_size * self.batch_size)
                    )
                    grads_acc = self._fold_group(grads_acc, group_grads, weight)
                    group_grads = zero_grads()
                    steps_since_bw = 0
                if (ix + 1) % self.backprop_every == 0 or is_last:
                    lr = self.scheduler.get_last_lr()
                    if self.debug_hooks:
                        from lcasr_tpu.training.debug_hooks import grad_statistics

                        self.metrics.log(grad_statistics(grads_acc))
                    state["opt_state"] = set_learning_rate(state["opt_state"], lr)
                    state["params"], state["opt_state"] = apply_updates(
                        state["params"], state["opt_state"], grads_acc, 1.0
                    )
                    grads_acc = zero_grads()
                    if self.scheduler.is_warmup:
                        self.scheduler.step()
                    loss_per_frame = 100.0 * cur_loss / max(cur_frames, 1)
                    self.metrics.log(
                        {
                            "loss": loss_per_frame,
                            "blank_p": blank_prob,
                            "learning_rate": lr,
                            "sequence_length": self.chunk_size,
                            "batch_size": self.batch_size,
                            "epoch": epoch,
                            "podcast": cur_podcast,
                            "spec_augment": int(augment),
                            # live acoustic frames in this optimizer step —
                            # ts deltas / frames give audio-s/s offline
                            "frames": cur_frames,
                        }
                    )
                    cur_loss, cur_frames = 0.0, 0

            if not self.scheduler.is_warmup:
                self.scheduler.step(epoch=cur_podcast)

            if self.sequence_scheduler is not None:
                updated, new_seq, new_bs = self.sequence_scheduler.step(steps=cur_batch_size)
                if updated:
                    self.chunk_size = new_seq
                    self.batch_size = new_bs
                    dataloader.update(batch_size=new_bs, seen_ids=seen_ids)
                    data_iter = iter(dataloader)
                    if self.rotary_interp_bump:
                        self.rotary_interpolation_factor *= (
                            self.sequence_scheduler.increase_by_multiplier
                        )
                        # rebuild the model with the new interpolation factor
                        self.model = self.model.clone(
                            rotary_interpolation_factor=self.rotary_interpolation_factor
                        )
                        micro_step = self._micro_step_fn()

        self.save(state, cur_podcast, epoch, seen_ids)
        return state

    def train_utterances(self, state, dataloader, epochs: int = 1):
        """Utterance-level training (reference exp/train_files/train_sa.py /
        train_mamba.py): presegmented batches, one optimizer step per batch."""
        micro_step = self._micro_step_fn()
        apply_updates = self._apply_updates_fn()
        zero_fn = self._zero_grads_fn(state["params"])
        zero_grads = lambda: zero_fn(state["params"])
        step = 0
        seen = 0
        if hasattr(dataloader, "total_recordings"):
            total = dataloader.total_recordings() * epochs
        else:  # plain list of batches (tests / ad-hoc loops)
            total = max(1, len(dataloader)) * epochs
        for epoch in range(epochs):
            for batch_np in dataloader:
                # warmup → cosine handoff, as in the podcast loop (the
                # reference's utterance trainer does the same,
                # train_sa.py:210-214 — without it the LR stays pinned at
                # peak forever)
                if self.scheduler.is_warmup and not self.scheduler.is_warming_up():
                    self.scheduler.set_cosine_schedule(
                        total_recordings=total, cur_podcast=seen
                    )
                a_bucket = _bucket(batch_np["audio"].shape[-1], 256)
                audio = np.zeros(
                    (batch_np["audio"].shape[0], 80, a_bucket), np.float32
                )
                audio[:, :, : batch_np["audio"].shape[-1]] = batch_np["audio"]
                U = _bucket(batch_np["text"].shape[-1])
                labels = np.zeros((batch_np["text"].shape[0], U), np.int64)
                labels[:, : batch_np["text"].shape[-1]] = batch_np["text"]
                batch = self._device_batch({
                    "audio": audio,
                    "audio_lengths": np.asarray(batch_np["audio_lengths"], np.int32),
                    "labels": labels,
                    "label_lengths": np.asarray(batch_np["text_lengths"], np.int32),
                    "weight": np.ones((audio.shape[0],), np.float32),
                })
                state["key"], sub = jax.random.split(state["key"])
                grads = zero_grads()
                loss, grads, new_stats, blank_p = micro_step(
                    state["params"], state["batch_stats"], batch, sub, grads
                )
                seen += audio.shape[0]
                if not np.isfinite(float(loss)):
                    continue
                state["batch_stats"] = new_stats
                # warmup: one scheduler tick per optimizer step; cosine:
                # re-based on utterances seen (reference train_sa.py:60-61,
                # 321-322 semantics)
                if self.scheduler.is_warmup:
                    lr = self.scheduler.step()
                else:
                    lr = self.scheduler.step(epoch=seen)
                state["opt_state"] = set_learning_rate(state["opt_state"], lr)
                weight = 1.0 / max(int(batch_np["audio_lengths"].sum()), 1) * 100
                state["params"], state["opt_state"] = apply_updates(
                    state["params"], state["opt_state"], grads, weight
                )
                step += 1
                self.metrics.log({
                    "loss": float(loss) / max(int(batch_np["audio_lengths"].sum()), 1) * 100,
                    "blank_p": float(blank_p),
                    "learning_rate": lr,
                    "epoch": epoch,
                    "utterance_step": step,
                })
        return state

    def save(self, state, step: int, epoch: int, seen_ids: List[str]) -> str:
        return checkpointing.save_checkpoint(
            self.checkpoint_dir,
            step=step,
            params=state["params"],
            opt_state=state["opt_state"],
            batch_stats=state["batch_stats"],
            config=self.config,
            scheduler_state=self.scheduler.state_dict(),
            sequence_scheduler_state=(
                self.sequence_scheduler.state_dict() if self.sequence_scheduler else None
            ),
            seen_ids=seen_ids,
            epoch=epoch,
        )

    def resume(self, state):
        """Load the latest checkpoint in checkpoint_dir into `state`;
        returns (state, step, epoch, seen_ids)."""
        latest = checkpointing.find_latest_checkpoint(self.checkpoint_dir)
        if latest is None:
            return state, 0, 0, []
        target = {
            "params": state["params"],
            "opt_state": state["opt_state"],
        }
        if state["batch_stats"]:
            target["batch_stats"] = state["batch_stats"]
        tree, meta = checkpointing.load_checkpoint(latest, target=target)
        state["params"] = tree["params"]
        state["opt_state"] = tree["opt_state"]
        state["batch_stats"] = tree.get("batch_stats", state["batch_stats"])
        self.scheduler.load_state_dict(meta["scheduler"]) if meta.get("scheduler") else None
        if self.sequence_scheduler is not None and meta.get("sequence_scheduler"):
            self.sequence_scheduler.load_state_dict(meta["sequence_scheduler"])
            self.chunk_size = self.sequence_scheduler.cur_sequence_length
            self.batch_size = self.sequence_scheduler.cur_batch_size
        return state, meta["podcast_step"], meta["epoch"], meta["seen_ids"]

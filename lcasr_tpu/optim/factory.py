"""Optimizer + scheduler factory from config.

Counterpart of reference `lcasr/utils/general.py:61-95`: name ∈ {adam/adamw,
madgrad, mirror_madgrad}, with the LR fed as a dynamic scalar through
`optax.inject_hyperparams` so host-side schedulers never trigger recompiles.
Grad clipping (reference clip 0.8 via clip_grad_norm, `exp/train.py:55`) is
chained in here.
"""
from __future__ import annotations

from typing import Optional, Tuple

import optax

from lcasr_tpu.config import Config
from lcasr_tpu.optim.madgrad import madgrad, mirror_madgrad
from lcasr_tpu.optim.scheduling import CosineLRScheduler


def build_optimizer(
    name: str,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: Optional[float] = None,
    clip_value: float = 0.8,
    weight_decay_mask=None,
    decouple_decay: bool = False,
) -> optax.GradientTransformation:
    name = name.lower()
    if name in ("madgrad",):
        inner = optax.inject_hyperparams(
            madgrad, static_args=("momentum", "weight_decay", "eps",
                                  "weight_decay_mask", "decouple_decay")
        )(
            learning_rate=lr,
            momentum=momentum,
            weight_decay=weight_decay,
            eps=1e-6 if eps is None else eps,
            weight_decay_mask=weight_decay_mask,
            decouple_decay=decouple_decay,
        )
    elif name in ("mirror_madgrad", "mirrormadgrad"):
        inner = optax.inject_hyperparams(
            mirror_madgrad,
            static_args=("momentum", "weight_decay", "eps",
                         "weight_decay_mask", "decouple_decay"),
        )(
            learning_rate=lr,
            momentum=momentum,
            weight_decay=weight_decay,
            eps=0.0 if eps is None else eps,
            weight_decay_mask=weight_decay_mask,
            decouple_decay=decouple_decay,
        )
    elif name in ("adam", "adamw"):
        # 'adam' = torch-style COUPLED L2 (decay added to the gradient
        # before the moment updates, like the reference's Adam/FusedAdam);
        # 'adamw' = decoupled.  Mapping adam onto adamw silently changed
        # the regularization path.
        def _coupled_adam(learning_rate, b1, b2, eps, weight_decay, mask):
            chain = []
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay, mask))
            chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
            chain.append(optax.scale(-learning_rate))
            return optax.chain(*chain)

        impl = optax.adamw if name == "adamw" else _coupled_adam
        inner = optax.inject_hyperparams(
            impl, static_args=("mask", "b1", "b2", "eps", "weight_decay")
        )(
            learning_rate=lr,
            b1=betas[0],
            b2=betas[1],
            eps=1e-8 if eps is None else eps,
            weight_decay=weight_decay,
            mask=weight_decay_mask,
        )
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    chain = []
    if clip_value and clip_value > 0:
        chain.append(optax.clip_by_global_norm(clip_value))
    chain.append(inner)
    return optax.chain(*chain)


def set_learning_rate(opt_state, lr: float):
    """Write the scheduler's current LR into the injected hyperparams."""
    import jax.numpy as jnp

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            # copy-on-write: mutating the dict in place would alias the NEW
            # lr into the caller's saved pre-update state (rollback paths)
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, state.hyperparams["learning_rate"].dtype
            )
            state = state._replace(hyperparams=hp)
        # wrappers (e.g. optax.masked's MaskedState) carry the real state in
        # inner_state — recurse so the injected LR is still reachable
        if hasattr(state, "inner_state"):
            state = state._replace(inner_state=set_learning_rate(state.inner_state, lr))
        return state

    # optax.chain state is a tuple of per-transform states
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_replace"):
        return tuple(visit(s) for s in opt_state)
    return visit(opt_state)


def load_optimizer(
    config: Config, weight_decay_mask=None
) -> Tuple[optax.GradientTransformation, CosineLRScheduler]:
    """Build (optimizer, scheduler) from config.optimizer / config.scheduler,
    mirroring the reference factory contract."""
    opt_cfg = config.get("optimizer", Config({}))
    name = opt_cfg.get("name", "madgrad")
    args = opt_cfg.get("args", Config({}))
    clip_value = config.get("training", Config({})).get("clip_value", 0.8)

    sched_cfg = config.get("scheduler", Config({}))
    scheduler = CosineLRScheduler(
        warmup_steps=sched_cfg.get("warmup_steps", 0),
        peak_value=args.get("lr", 1e-3),
        # reference hardcodes final_value=0.0 ("decay to 0", general.py:92)
        final_value=sched_cfg.get("final_value", 0.0),
    )

    known = {"lr", "weight_decay", "momentum", "betas", "eps", "decouple_decay"}
    extra = set(dict(args)) - known
    if extra:
        raise ValueError(
            f"unknown optimizer args {sorted(extra)} (the reference forwards "
            f"every optim arg; silently dropping them would change training)"
        )
    optimizer = build_optimizer(
        name=name,
        lr=args.get("lr", 1e-3),
        weight_decay=args.get("weight_decay", 0.0),
        momentum=args.get("momentum", 0.9),
        betas=tuple(args.get("betas", [0.9, 0.999])),
        eps=args.get("eps", None),
        clip_value=clip_value,
        weight_decay_mask=weight_decay_mask,
        decouple_decay=bool(args.get("decouple_decay", False)),
    )
    return optimizer, scheduler

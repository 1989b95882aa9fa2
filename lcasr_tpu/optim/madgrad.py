"""MADGRAD and MirrorMADGRAD as optax gradient transformations.

Re-implementation of the reference's default optimizer (facebookresearch
MADGRAD, arXiv:2101.11075; reference `lcasr/optim/madgrad.py:19-354` —
"madgrad is best" per `lcasr/utils/general.py:84`) in pure-functional optax
style.  State is kept in fp32 regardless of parameter dtype (the reference's
fp32 master-math path, `madgrad.py:115-122`); the whole update is elementwise
jnp, which XLA fuses into a single multi-tensor kernel — the TPU counterpart
of Apex's multi-tensor FusedAdam.

MADGRAD update (dense, momentum != 0), per step k with lr schedule λ_k:
    lamb   = lr_k * sqrt(k+1)
    ν_k+1  = ν_k + lamb * g²          (grad_sum_sq)
    s_k+1  = s_k + lamb * g
    rms    = ν_k+1^(1/3) + eps
    z      = x0 − s_k+1 / rms
    p_k+1  = (1−ck)·p_k + ck·z,   ck = 1 − momentum
where x0 is the initial parameter value (stored) — dual averaging.

MirrorMADGRAD:
    update_ratio = sqrt(k/(k+1)) scales ν before accumulation, λ = (k+1)^(1/3),
    z is persistent state updated by  z −= lr·λ·g/rms,  p = (1−ck)p + ck z.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Union, Callable

import chex
import jax
import jax.numpy as jnp
import optax


class MadgradState(NamedTuple):
    count: chex.Array  # step k
    grad_sum_sq: optax.Params
    s: optax.Params
    x0: optax.Params


ScalarOrSchedule = Union[float, Callable[[chex.Numeric], chex.Numeric]]


def _lr_at(lr: ScalarOrSchedule, count):
    return lr(count) if callable(lr) else lr


def madgrad(
    learning_rate: ScalarOrSchedule = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
    decouple_decay: bool = False,
    weight_decay_mask=None,
) -> optax.GradientTransformation:
    if not 0 <= momentum < 1:
        raise ValueError(f"Momentum {momentum} must be in the range [0,1)")

    ck = 1.0 - momentum

    def init_fn(params):
        f32 = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return MadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum_sq=jax.tree.map(f32, params),
            s=jax.tree.map(f32, params),
            x0=jax.tree.map(lambda p: p.astype(jnp.float32), params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("madgrad requires params")
        k = state.count
        # eps only added for stability when lr != 0 (reference madgrad.py:101-102)
        # — warmup schedules starting at lr=0 must leave params frozen
        lr_raw = _lr_at(learning_rate, k)
        lr = jnp.where(lr_raw != 0.0, lr_raw + eps, 0.0)
        lamb = lr * jnp.sqrt(k.astype(jnp.float32) + 1.0)

        def leaf(g, p, gss, s, x0, decay_on):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if weight_decay != 0.0 and not decouple_decay and decay_on:
                g = g + weight_decay * p32
            gss_new = gss + lamb * g * g
            rms = jnp.cbrt(gss_new) + eps
            # eps=0 + all-zero grad history → rms 0; reference sets inf so
            # the z-iterate stays at x0 instead of NaN (madgrad.py:186-187)
            rms = jnp.where(rms == 0.0, jnp.inf, rms)
            s_new = s + lamb * g
            z = x0 - s_new / rms
            p_new = (1.0 - ck) * p32 + ck * z
            if weight_decay != 0.0 and decouple_decay and decay_on:
                p_new = p_new - lr * weight_decay * p32
            return p_new - p32, gss_new, s_new

        # callable masks are evaluated on the params ACTUALLY seen here —
        # required under optax.masked, whose pruned MaskedNode params would
        # not match a mask pytree built from the full tree
        if callable(weight_decay_mask):
            mask = weight_decay_mask(params)
        elif weight_decay_mask is not None:
            mask = weight_decay_mask
        else:
            mask = jax.tree.map(lambda _: True, params)
        # flatten/unflatten instead of a result-tuple heuristic: a 3-tuple
        # CONTAINER inside the params pytree must not be mistaken for a
        # per-leaf (update, gss, s) triple (that silently scrambled state
        # across sibling leaves)
        treedef = jax.tree.structure(params)
        results = [
            leaf(g, p, gss_l, s_l, x0_l, m_l)
            for g, p, gss_l, s_l, x0_l, m_l in zip(
                treedef.flatten_up_to(grads), jax.tree.leaves(params),
                treedef.flatten_up_to(state.grad_sum_sq),
                treedef.flatten_up_to(state.s),
                treedef.flatten_up_to(state.x0),
                treedef.flatten_up_to(mask),
            )
        ]
        updates = jax.tree.unflatten(treedef, [r[0] for r in results])
        gss = jax.tree.unflatten(treedef, [r[1] for r in results])
        s = jax.tree.unflatten(treedef, [r[2] for r in results])
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        return updates, MadgradState(count=k + 1, grad_sum_sq=gss, s=s, x0=state.x0)

    return optax.GradientTransformation(init_fn, update_fn)


class MirrorMadgradState(NamedTuple):
    count: chex.Array
    grad_sum_sq: optax.Params
    z: optax.Params


def mirror_madgrad(
    learning_rate: ScalarOrSchedule = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 0.0,
    decouple_decay: bool = False,
    weight_decay_mask=None,
) -> optax.GradientTransformation:
    if not 0 <= momentum < 1:
        raise ValueError(f"Momentum {momentum} must be in the range [0,1)")

    ck = 1.0 - momentum

    def init_fn(params):
        return MirrorMadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum_sq=jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
            ),
            z=jax.tree.map(lambda p: p.astype(jnp.float32), params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("mirror_madgrad requires params")
        kf = state.count.astype(jnp.float32)
        # eps gated on lr != 0, as in the dense variant (reference :295-296)
        lr_raw = _lr_at(learning_rate, state.count)
        lr = jnp.where(lr_raw != 0.0, lr_raw + eps, 0.0)
        update_ratio = jnp.sqrt(kf / (kf + 1.0))
        lamb = jnp.cbrt(kf + 1.0)

        def leaf(g, p, gss, z, decay_on):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if weight_decay != 0.0 and decay_on:
                if decouple_decay:
                    z = z - lr * weight_decay * z
                else:
                    g = g + weight_decay * p32
            gss_new = gss * update_ratio + g * g
            rms = jnp.cbrt(gss_new) + eps
            rms = jnp.where(rms == 0.0, jnp.inf, rms)
            z_new = z - lr * lamb * g / rms
            p_new = (1.0 - ck) * p32 + ck * z_new
            return p_new - p32, gss_new, z_new

        # callable masks are evaluated on the params ACTUALLY seen here —
        # required under optax.masked, whose pruned MaskedNode params would
        # not match a mask pytree built from the full tree
        if callable(weight_decay_mask):
            mask = weight_decay_mask(params)
        elif weight_decay_mask is not None:
            mask = weight_decay_mask
        else:
            mask = jax.tree.map(lambda _: True, params)
        # see madgrad.update_fn: flatten/unflatten, no tuple heuristics
        treedef = jax.tree.structure(params)
        results = [
            leaf(g, p, gss_l, z_l, m_l)
            for g, p, gss_l, z_l, m_l in zip(
                treedef.flatten_up_to(grads), jax.tree.leaves(params),
                treedef.flatten_up_to(state.grad_sum_sq),
                treedef.flatten_up_to(state.z),
                treedef.flatten_up_to(mask),
            )
        ]
        updates = jax.tree.unflatten(treedef, [r[0] for r in results])
        gss = jax.tree.unflatten(treedef, [r[1] for r in results])
        z = jax.tree.unflatten(treedef, [r[2] for r in results])
        updates = jax.tree.map(lambda u, p: u.astype(p.dtype), updates, params)
        return updates, MirrorMadgradState(count=state.count + 1, grad_sum_sq=gss, z=z)

    return optax.GradientTransformation(init_fn, update_fn)

"""Per-parameter gradient statistics (debug instrumentation).

Counterpart of reference `lcasr/utils/hooks.py:43-56` (backward hooks logging
grad norm/std/%near-zero per parameter to wandb, enabled via -debug_hooks).
Functionally: a pure function over the gradient pytree, computed on device in
one fused program and logged through the MetricsLogger.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def grad_statistics(grads, near_zero_eps: float = 1e-8) -> Dict[str, Any]:
    """Pytree of grads → flat dict of per-parameter stats + global norm."""

    def leaf_stats(g):
        g = g.astype(jnp.float32)
        return {
            "norm": jnp.linalg.norm(g.reshape(-1)),
            "std": g.std(),
            "frac_near_zero": (jnp.abs(g) < near_zero_eps).mean(),
        }

    stats = jax.tree_util.tree_map_with_path(
        lambda path, g: (jax.tree_util.keystr(path), leaf_stats(g)), grads
    )
    flat: Dict[str, Any] = {}
    sq_sum = 0.0
    for name, s in jax.tree.leaves(
        stats, is_leaf=lambda x: isinstance(x, tuple) and isinstance(x[0], str)
    ):
        key = name.strip("[]'\"").replace("']['", "/")
        flat[f"grad/{key}/norm"] = float(s["norm"])
        flat[f"grad/{key}/std"] = float(s["std"])
        flat[f"grad/{key}/frac_near_zero"] = float(s["frac_near_zero"])
        sq_sum += float(s["norm"]) ** 2
    flat["grad/global_norm"] = sq_sum ** 0.5
    return flat

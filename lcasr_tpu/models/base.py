"""Model base utilities: parameter counting and weight-decay param grouping.

Counterpart of reference `lcasr/models/base.py:9-67` — minGPT-style grouping
of parameters into decay / no-decay sets.  In the functional world this is a
predicate over param-tree paths rather than module-instance whitelists:
norm scales/biases, all biases, batch-renorm affine params and rotary
frequencies are excluded from decay; dense/conv kernels decay.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))


def print_total_params(params, name: str = "model") -> int:
    n = count_params(params)
    print(f"{name}: {n / 1e6:.2f}M parameters")
    return n


_NO_DECAY_LEAF_NAMES = {"bias", "scale", "weight", "inv_freq", "w_r", "depthwise_bias"}
_NO_DECAY_MODULE_HINTS = ("norm", "rotary", "batchrenorm")


def decay_mask(params) -> Dict[str, Any]:
    """Pytree of bools: True = apply weight decay.

    Mirrors the reference's whitelist/blacklist split
    (`lcasr/models/sconformer_xl.py:106-107`): norm affine params, biases and
    rotary frequencies don't decay; linear / conv kernels do.  Note the
    BatchRenorm affine is stored as `weight`/`bias` under a `norm` scope, so
    both the leaf-name and scope-name rules catch it.
    """

    def rule(path, leaf) -> bool:
        names = [p.key for p in path if hasattr(p, "key")]
        leaf_name = names[-1] if names else ""
        if leaf_name in _NO_DECAY_LEAF_NAMES:
            return False
        if any(h in n.lower() for n in names for h in _NO_DECAY_MODULE_HINTS):
            return False
        return True

    return jax.tree_util.tree_map_with_path(rule, params)

"""Model base utilities: parameter counting and weight-decay param grouping.

Counterpart of reference `lcasr/models/base.py:9-67` — minGPT-style grouping
of parameters into decay / no-decay sets, reproduced with the reference's
EFFECTIVE semantics (see `decay_mask`).
"""
from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))


def print_total_params(params, name: str = "model") -> int:
    n = count_params(params)
    print(f"{name}: {n / 1e6:.2f}M parameters")
    return n


_NORM_SCOPE_HINTS = ("norm", "batchrenorm")
# models whose reference counterparts define the whitelist/blacklist tuples
# (sconformer_xl.py:106-107, sconformer_meta.py:178-179, mamba.py:91-93);
# everything else hits the reference's warning branch: decay on ALL params
_GROUPED_MODELS = {"SCConformerXL", "SCConformerMeta", "Mamba"}


def decay_mask(params, model: Any = None) -> Dict[str, Any]:
    """Pytree of bools: True = apply weight decay.

    Reproduces the reference's EFFECTIVE grouping, not its commented intent:
    the minGPT loop in `lcasr/models/base.py:33-45` puts `whitelist` modules
    in the DECAY set, but the models populate the tuples inverted relative
    to minGPT's meaning (`sconformer_xl.py:106` labels the norm tuple
    "don't decay" while the loop decays it).  The behavior that actually
    trained every reference checkpoint with weight_decay > 0
    (mamba_test.yaml, transformer_tuning, enc_dec_s.yaml) is therefore:

      * every bias (pn.endswith('bias'), checked first): no decay
      * Linear / feed-forward / Conv / rotary / Mamba A_log+D params: NO
        decay
      * norm affine scales (LayerNorm/RMSNorm/BatchRenorm/GroupNorm): DECAY

    i.e. decay applies ONLY to norm scales.  `model` (a module instance or
    class-name string) selects the branch: the enc_dec family defines no
    tuples upstream, so it falls into the reference's warning branch —
    decay on ALL parameters (`base.py:29-32`).  Params the reference loop
    would leave unclassified and assert on (e.g. LongConv's direct kernel)
    are mapped to no-decay here instead of crashing.
    """
    name: Optional[str]
    if model is None:
        name = None
    elif isinstance(model, str):
        name = model
    else:
        name = type(model).__name__
    if name is not None and name not in _GROUPED_MODELS:
        warnings.warn(
            f"{name} defines no weight-decay groups (matching the reference "
            f"warning branch, lcasr/models/base.py:29-32): weight decay "
            f"will apply to ALL parameters"
        )
        return jax.tree.map(lambda _: True, params)

    def rule(path, leaf) -> bool:
        names = [p.key for p in path if hasattr(p, "key")]
        leaf_name = names[-1] if names else ""
        if leaf_name.endswith("bias"):
            return False
        in_norm_scope = any(
            h in n.lower() for n in names[:-1] for h in _NORM_SCOPE_HINTS
        )
        return in_norm_scope and leaf_name in ("scale", "weight")

    return jax.tree_util.tree_map_with_path(rule, params)

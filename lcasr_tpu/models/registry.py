"""Model registry + config-driven construction.

Counterpart of reference `lcasr/utils/general.py:24-59` (`get_model_class`,
`load_model`): the checkpoint-embedded config selects the architecture and
supplies its kwargs, so eval can rebuild the model purely from a checkpoint.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type

import jax.numpy as jnp
from flax import linen as nn

from lcasr_tpu.config import Config
from lcasr_tpu.models.sconformer_xl import SCConformerXL

_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


_REGISTRY["SCConformerXL"] = SCConformerXL


def get_model_class(config: Config | Dict[str, Any] | None = None, model_class: str | None = None):
    """Resolve the model class from `config.model_class` (default
    SCConformerXL), mirroring the reference registry contract."""
    if model_class is None:
        if config is not None:
            model_class = (
                config.get("model_class", "SCConformerXL")
                if hasattr(config, "get")
                else config.get("model_class", "SCConformerXL")
            )
        else:
            model_class = "SCConformerXL"
    if model_class not in _REGISTRY:
        # late registration for optional families
        if model_class == "Mamba":
            from lcasr_tpu.models.mamba import Mamba  # noqa: F401
        elif model_class in ("EncDecSconformer", "EncDecSconformerV2"):
            from lcasr_tpu.models import enc_dec_sconformer  # noqa: F401
        elif model_class == "SCConformerMeta":
            from lcasr_tpu.models import sconformer_meta  # noqa: F401
    if model_class not in _REGISTRY:
        raise ValueError(
            f"unknown model_class {model_class!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[model_class]


def model_kwargs_from_config(model_cls: Type[nn.Module], cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Filter a config's `model` section down to the dataclass fields the
    flax module accepts (unknown keys are ignored, like **kwargs upstream)."""
    fields = {f.name for f in dataclasses.fields(model_cls)}
    return {k: v for k, v in cfg.items() if k in fields}


_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}


def load_model(config: Config, vocab_size: int, model_class=None) -> nn.Module:
    """Build the model from config.model (+ vocab size from the tokenizer).

    `training.dtype` (the reference's autocast dtype, `exp/train.py`'s
    bf16 context) sets the model COMPUTE dtype when `model.dtype` doesn't —
    params stay fp32 (flax param_dtype default), matching torch-autocast
    semantics of an fp32 master with bf16 compute."""
    model_cls = model_class or get_model_class(config)
    model_cfg = config["model"].to_dict() if hasattr(config["model"], "to_dict") else dict(config["model"])
    model_cfg["vocab_size"] = vocab_size
    if "dtype" not in model_cfg:
        training = config.get("training", {}) if hasattr(config, "get") else {}
        td = training.get("dtype", None) if hasattr(training, "get") else None
        if td is not None:
            model_cfg["dtype"] = _DTYPES.get(td, td) if isinstance(td, str) else td
    elif isinstance(model_cfg["dtype"], str):
        model_cfg["dtype"] = _DTYPES.get(model_cfg["dtype"], model_cfg["dtype"])
    kwargs = model_kwargs_from_config(model_cls, model_cfg)
    return model_cls(**kwargs)

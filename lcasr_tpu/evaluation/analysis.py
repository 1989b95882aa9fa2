"""Interpretability analysis tools: attention-probability dumps and
long-context attribution.

Counterparts of reference `eval/bin/get_attention_weights.py`,
`eval/bin/run_context_attribution.py` and the CollectAttentionProbs /
CollectFlashAttentionProbs hook machinery
(reference `lcasr/components/attention.py:259-318,556-595`).

In the functional world there are no forward hooks: the model is cloned with
`return_attention_weights=True`, which routes attention through the exact jnp
path and `sow`s per-layer probabilities into the flax `intermediates`
collection — one apply() yields all layers' maps.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_attention_weights(
    model,
    variables,
    audio: np.ndarray,  # (B, 80, T)
    lengths: Optional[np.ndarray] = None,
) -> List[np.ndarray]:
    """Per-layer attention probabilities [(B, H, T', T'), ...]."""
    probe = model.clone(return_attention_weights=True, use_pallas=False)
    kwargs = {}
    if lengths is not None:
        kwargs["length"] = jnp.asarray(lengths)
    _, inter = probe.apply(
        variables, jnp.asarray(audio), mutable=["intermediates"], **kwargs
    )
    probs = []
    layers = inter["intermediates"]
    for name in sorted(
        (k for k in layers if k.startswith("layers_")),
        key=lambda s: int(s.split("_")[1]),
    ):
        node = layers[name]
        # path: layers_i/attend/attention_probs -> tuple of sown values
        probs.append(np.asarray(node["attend"]["attention_probs"][0]))
    return probs


def context_attribution(
    model,
    variables,
    audio: np.ndarray,  # (1, 80, T)
    frame: int,
    lengths: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Gradient-based attribution of one output frame's max logit onto the
    input spectrogram (how much context the prediction actually used —
    reference `eval/bin/run_context_attribution.py` analysis).
    Returns |d logit / d input| summed over mel bins, shape (T,)."""

    audio = jnp.asarray(audio)

    length = jnp.asarray(lengths) if lengths is not None else None

    def target(a):
        out = model.apply(variables, a, length=length)
        lp = out["final_posteriors"][0, frame]
        return lp.max()

    g = jax.grad(target)(audio)
    return np.asarray(jnp.abs(g).sum(axis=(0, 1)))


def rotary_interpolation_probe(
    model,
    variables,
    spec: np.ndarray,  # (1, 80, T)
    factors=(1.0, 2.0, 4.0, 8.0),
    lengths: Optional[np.ndarray] = None,
):
    """Probe rotary position-interpolation factors at inference
    (reference `eval/bin/run_interp.py`): rebuild the model with each factor
    and report the mean max-posterior confidence per factor — a cheap proxy
    for which interpolation best matches the evaluated context length."""
    results = {}
    audio = jnp.asarray(spec)
    for f in factors:
        probe = model.clone(rotary_interpolation_factor=float(f))
        out = probe.apply(
            variables, audio,
            **({"length": jnp.asarray(lengths)} if lengths is not None else {}),
        )
        lp = np.asarray(out["final_posteriors"], np.float32)
        results[float(f)] = {
            "mean_max_logprob": float(lp.max(-1).mean()),
            "blank_fraction": float((lp.argmax(-1) == lp.shape[-1] - 1).mean()),
        }
    return results

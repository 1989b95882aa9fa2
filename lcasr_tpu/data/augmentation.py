"""SpecAugment: time + frequency masking, jit-friendly.

Counterpart of reference `lcasr/utils/augmentation.py:10-100`:
  * `min_p` mode derives the time-mask width from a target masked proportion
    (total coverage = T·min_p split across n_time_masks, reference `:79-81`),
  * non-zero masking fills with the length-aware spectrogram mean (`:69-73`),
  * iid masks per batch element (`:83-93`), `max_p` cap on each mask's width.

TPU-first: masks are drawn with `jax.random` inside jit (no host round trip,
no recompile — widths are data-independent given static shapes); the masked
fill value is a traced scalar.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mask_axis_iid(
    key: jax.Array,
    spec: jnp.ndarray,  # (B, F, T)
    mask_param: int,
    mask_value: jnp.ndarray,
    axis: int,  # 1 = freq, 2 = time
    p: float,
) -> jnp.ndarray:
    B = spec.shape[0]
    size = spec.shape[axis]
    k_val, k_start = jax.random.split(key)
    max_val = min(mask_param, int(size * p)) if p < 1.0 else mask_param
    max_val = max(1, max_val)
    value = jax.random.uniform(k_val, (B,), minval=0.0, maxval=float(max_val))
    min_start = jax.random.uniform(
        k_start, (B,), minval=0.0, maxval=jnp.maximum(size - value, 1e-6)
    )
    start = min_start.astype(jnp.int32)
    end = (min_start + value).astype(jnp.int32)
    idx = jnp.arange(size)[None, :]  # (1, size)
    masked = (idx >= start[:, None]) & (idx < end[:, None])  # (B, size)
    shape = [B, 1, 1]
    shape[axis] = size
    masked = masked.reshape(shape)
    return jnp.where(masked, mask_value, spec)


class SpecAugment:
    def __init__(
        self,
        n_time_masks: int,
        n_freq_masks: int,
        freq_mask_param: int,
        time_mask_param: int = -1,
        min_p: float = -1.0,
        max_p: float = 1.0,
        zero_masking: bool = False,
        **kwargs,
    ):
        if n_time_masks != 0:
            assert min_p != -1 or time_mask_param != -1, (
                "Either min_p or time_mask_param must be set"
            )
        assert min_p == -1 or 0 <= min_p <= 1
        assert 0 <= max_p <= 1
        self.n_time_masks = n_time_masks
        self.n_freq_masks = n_freq_masks
        self.freq_mask_param = freq_mask_param
        self.time_mask_param = time_mask_param
        self.min_p = min_p
        self.max_p = max_p
        self.zero_masking = zero_masking

    def __call__(
        self,
        key: jax.Array,
        spec: jnp.ndarray,  # (B, F, T)
        lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, F, T = spec.shape
        if self.zero_masking:
            mask_value = jnp.asarray(0.0, spec.dtype)
        elif lengths is None:
            mask_value = spec.mean()
        else:
            valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(spec.dtype)
            denom = jnp.maximum(valid.sum() * F, 1.0)
            mask_value = (spec * valid[:, None, :]).sum() / denom

        time_width = self.time_mask_param
        if self.min_p != -1 and self.n_time_masks > 0:
            time_width = int(T * self.min_p) // self.n_time_masks

        keys = jax.random.split(key, self.n_time_masks + self.n_freq_masks + 1)
        ki = 0
        for _ in range(self.n_time_masks):
            spec = _mask_axis_iid(keys[ki], spec, time_width, mask_value, axis=2, p=self.max_p)
            ki += 1
        for _ in range(self.n_freq_masks):
            spec = _mask_axis_iid(
                keys[ki], spec, self.freq_mask_param, mask_value, axis=1, p=self.max_p
            )
            ki += 1
        return spec

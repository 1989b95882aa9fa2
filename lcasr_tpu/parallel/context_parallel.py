"""Context parallelism: sequence-sharded flash attention over the `seq` axis.

A NEW capability vs the reference (SURVEY.md §2.9: no ring attention /
Ulysses / CP anywhere upstream): when a single recording's context exceeds
one chip's HBM (e.g. 120k mel frames → 15k tokens, or 1-hour training
windows), queries are sharded along time across the `seq` mesh axis; each
shard all-gathers K/V over ICI and runs the Pallas flash kernel on its local
query slice with a global `q_offset`, so window banding and length masks stay
exact.  Output stays sequence-sharded — the surrounding (position-local)
dense/conv ops never need resharding.

The KV all-gather costs O(T·D·H) per shard over ICI; a ring schedule
(streaming KV blocks with ppermute, overlapping compute) is the planned
upgrade once profiling shows the gather dominating.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lcasr_tpu.ops.flash_attention import flash_attention


def context_parallel_attention(
    q: jnp.ndarray,  # (B, T, H, D) — logically global
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    lengths: Optional[jnp.ndarray] = None,
    window: Tuple[int, int] = (-1, -1),
    seq_axis: str = "seq",
    softmax_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-sharded exact attention.  T must divide the seq-axis size."""
    B, T, H, D = q.shape
    n_shards = mesh.shape[seq_axis]
    assert T % n_shards == 0, f"T={T} must divide seq shards {n_shards}"
    t_local = T // n_shards

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    def local_fn(q_l, k_l, v_l, lengths_g):
        # q_l: (B, t_local, H, D); k_l/v_l: local KV slices
        idx = jax.lax.axis_index(seq_axis)
        k_full = jax.lax.all_gather(k_l, seq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, seq_axis, axis=1, tiled=True)
        return flash_attention(
            q_l,
            k_full,
            v_full,
            lengths=lengths_g,
            window=window,
            softmax_scale=softmax_scale,
            q_offset=idx * t_local,
        )

    seq_sharded = P(None, seq_axis, None, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(seq_sharded, seq_sharded, seq_sharded, P()),
        out_specs=seq_sharded,
        check_vma=False,
    )(q, k, v, lengths)

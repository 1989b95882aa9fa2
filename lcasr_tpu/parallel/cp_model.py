"""Full-model context parallelism: run a conformer forward/training step with
the audio time axis sharded over the `seq` mesh axis.

This is the framework's NEW capability vs the reference (SURVEY §2.9: the
reference handles long context with one big single-GPU forward + flash
attention's O(T) memory; here a 1-hour/360k-frame context that exceeds one
chip's HBM is sharded across chips).  The model itself is CP-native when
`seq_axis_name` is set (`models/sconformer_xl.py`):

  * ConvSubsampling stride-2 stages and the depthwise conformer convs
    halo-exchange across shard boundaries (`ops/conv.py:halo_exchange`),
  * rotary tables / pad masks run at global coordinates (shard offset),
  * attention gathers K/V over the axis and runs the Pallas kernel (or the
    chunked banded oracle off-TPU) with a global `q_offset` — or, with
    `attention_cp_impl="ring"`, keeps K/V local and rotates blocks around
    the ring (O(T/n) KV memory per device),
  * batch-renorm statistics are psum'd over `stat_axes`.

This module provides the shard_map entry points around that model.  With
`data_axis` set the batch axis is simultaneously sharded (DP × CP), which is
how the production Trainer launches it (`training/trainer.py`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def context_parallel_apply(
    model,
    variables,
    audio: jnp.ndarray,  # (B, feat, T) — logically global
    mesh: Mesh,
    lengths: Optional[jnp.ndarray] = None,
    train: bool = False,
    seq_axis: str = "seq",
    data_axis: Optional[str] = None,
    mutable: bool = False,
):
    """Sequence-sharded model.apply.  Returns the same output dict as the
    unsharded forward (posteriors re-assembled logically on the time axis;
    under jit they stay sharded).

    T must be a multiple of n_shards × subsampling_factor so every shard's
    local length survives the stride-2 stages (halo = 1 frame per stage).

    `data_axis`: additionally shard the batch axis over that mesh axis
    (DP × CP — the production Trainer's layout).  B must divide the data
    axis size; batch-renorm statistics are psum'd over BOTH axes so running
    stats match the global-batch computation.
    """
    n = mesh.shape[seq_axis]
    B, F, T = audio.shape
    sf = getattr(model, "subsampling_factor", 8)
    assert T % (n * sf) == 0, (
        f"T={T} must divide seq shards ({n}) x subsampling factor ({sf})"
    )
    stat_axes: Tuple[str, ...] = (seq_axis,)
    batch_spec = None
    if data_axis is not None and mesh.shape[data_axis] > 1:
        assert B % mesh.shape[data_axis] == 0, (
            f"B={B} must divide data shards ({mesh.shape[data_axis]})"
        )
        stat_axes = (data_axis, seq_axis)
        batch_spec = data_axis

    cp_model = model.clone(seq_axis_name=seq_axis, stat_axes=stat_axes)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    def local_fn(variables, audio_l, lengths_l):
        if mutable:
            out, mutated = cp_model.apply(
                variables, audio_l, length=lengths_l, train=train,
                mutable=["batch_stats"],
            )
            return out["final_posteriors"], out["length"], mutated["batch_stats"]
        out = cp_model.apply(variables, audio_l, length=lengths_l, train=train)
        return out["final_posteriors"], out["length"], {}

    out_specs = (P(batch_spec, seq_axis, None), P(batch_spec), P())
    posts, out_len, stats = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(batch_spec, None, seq_axis), P(batch_spec)),
        out_specs=out_specs,
        check_vma=False,
    )(variables, audio, lengths)
    result = {"final_posteriors": posts, "length": out_len}
    if mutable:
        return result, {"batch_stats": stats}
    return result

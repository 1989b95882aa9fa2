"""Sharding rules: parameter partition specs (TP) + activation shardings.

The tensor-parallel layout reproduces the reference's Megatron-style split
(reference `fused_dense.py:155-198,501-558`):
  * QKV / FFN-up projections: column-parallel → kernel P(None, "model")
  * attention-out / FFN-down:  row-parallel   → kernel P("model", None)
  * decoder vocab projection:  column-parallel (4096 classes shard well)
  * everything else (norms, biases, convs, subsampling): replicated

Sequence parallelism is expressed as activation sharding of the time axis
(P("data", "seq", None) on (B, T, D)) — the reference's explicit
all-gather-before-matmul / reduce-scatter-after (`fused_dense.py:51-53,
104-105`) becomes XLA-inserted collectives around the annotated ops.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL_LEAVES = ("qkv_proj", "fc1", "ff")  # kernel P(None, model)
_ROW_PARALLEL_LEAVES = ("out_proj", "fc2", "reprojection")  # kernel P(model, None)


def param_spec(path) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    if not names or names[-1] != "kernel":
        return P()  # biases / norms / conv kernels replicated
    parents = names[:-1]
    if any(n in _COLUMN_PARALLEL_LEAVES for n in parents):
        return P(None, "model")
    if any(n in _ROW_PARALLEL_LEAVES for n in parents):
        return P("model", None)
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP layout.

    Leaves whose dimensions don't divide the mesh axis fall back to
    replication (e.g. the vocab+1 = 4096+... decoder head on odd meshes).
    """

    def rule(path, leaf):
        spec = param_spec(path)
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Input batch (B, 80, T): batch on `data`."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, D) activations: batch on `data`, time on `seq`."""
    return NamedSharding(mesh, P("data", "seq", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh):
    """Device-put params according to the TP layout."""
    return jax.device_put(params, param_shardings(params, mesh))


def zero_spec(spec: P, shape, mesh: Mesh) -> P:
    """ZeRO-style spec: additionally shard the largest mesh-divisible,
    currently-unsharded dim over ``data``.

    Optimizer state is pure elementwise per-parameter memory — unlike the
    params themselves it is never consumed by a matmul — so it can shard
    over the DATA axis too (the reference's world-size axis, where torch
    would use ZeRO/FSDP).  XLA then computes the optimizer update
    data-sharded and all-gathers only the param delta, cutting MADGRAD's
    three fp32 trees (+ the two grad accumulators) by the data-axis size.
    """
    d = mesh.shape.get("data", 1)
    if d <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_dim = -1, 0
    for i, (dim, ax) in enumerate(zip(shape, entries)):
        if ax is None and dim % d == 0 and dim > best_dim:
            best, best_dim = i, dim
    if best < 0:
        return spec
    entries[best] = "data"
    return P(*entries)


def zero_shardings(tree_sh: Any, shapes: Any, mesh: Mesh):
    """Map a pytree of NamedShardings (+ matching shapes tree) through
    `zero_spec`."""
    return jax.tree.map(
        lambda sh, leaf: NamedSharding(
            mesh, zero_spec(sh.spec, leaf.shape, mesh)
        ),
        tree_sh,
        shapes,
    )


def opt_state_shardings(
    opt_state_shapes: Any, params: Any, param_sh: Any, mesh: Mesh,
    zero: bool = False,
):
    """NamedShardings for every optimizer-state leaf, mirroring the param
    layout: madgrad's gss/s/x0 (and any momentum/ema tree) are pytrees that
    embed the param tree, so a leaf whose path SUFFIX and shape match a
    param gets that param's sharding; scalars and hyperparams replicate.

    Leaving this to jit inference (as round 2 did) risks an unlucky
    replicated layout silently tripling per-chip optimizer memory under TP —
    madgrad carries 3 fp32 trees (~1.5 GB for the flagship).

    `opt_state_shapes`: `jax.eval_shape(optimizer.init, params)`.
    `zero=True` additionally shards every param-mirroring leaf over the
    ``data`` axis (see `zero_spec`).
    """
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_sh = jax.tree_util.tree_flatten_with_path(param_sh)[0]
    by_path = {
        tuple(str(k) for k in path): (leaf.shape, sh)
        for (path, leaf), (_, sh) in zip(flat_p, flat_sh)
    }

    def rule(path, leaf):
        keys = tuple(str(k) for k in path)
        for i in range(len(keys)):  # longest suffix first
            hit = by_path.get(keys[i:])
            if hit is not None and hit[0] == tuple(leaf.shape):
                if zero:
                    return NamedSharding(
                        mesh, zero_spec(hit[1].spec, leaf.shape, mesh)
                    )
                return hit[1]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, opt_state_shapes)

"""Device mesh construction: (data, model, seq) axes over ICI.

The reference's distributed layer is Megatron-style TP/SP over NCCL process
groups (reference `lcasr/components/fused_dense.py:12,22-30,155-198`), driven
by explicit all_gather/reduce_scatter calls with handle-based overlap.  The
TPU-native equivalent is declarative: a `jax.sharding.Mesh` with named axes,
`NamedSharding` annotations on params/activations, and XLA choosing +
scheduling the collectives over ICI.

Axes:
  * data  — batch sharding (the primary axis; the reference trained 1 GPU
            per run, so DP over a v5e-8 is this framework's main scaling win)
  * model — tensor parallelism (column/row sharded QKV + FFN, the
            fused_dense ColumnParallelLinear/RowParallelLinear equivalent)
  * seq   — sequence/context parallelism for 120k-frame single-recording
            decode (activation time-axis sharding; new capability, SURVEY
            §2.9)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: `jax.distributed.initialize` when launched as one
    process per host (GKE/SLURM set the env vars; explicit args override).

    After initialization `jax.devices()` spans every host, so `make_mesh`
    builds the global mesh unchanged — lay `data` (and any DCN-crossing
    axis) outermost so model/seq collectives stay on ICI (SURVEY §5.8).
    Returns True if distributed mode was initialized.  Safe no-op when no
    coordinator is configured (single-host) or when already initialized.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # jax also auto-detects SLURM/GKE; only engage when asked
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:
        # already initialized
        return True


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh.  Default: all devices on the `data` axis.

    shape: e.g. {"data": 2, "model": 2, "seq": 2}; the product must divide
    the device count (trailing devices are dropped if not all used).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {"data": len(devices), "model": 1, "seq": 1}
    for ax in ("data", "model", "seq"):
        shape.setdefault(ax, 1)
    n = shape["data"] * shape["model"] * shape["seq"]
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape["data"], shape["model"], shape["seq"])
    return Mesh(arr, axis_names=("data", "model", "seq"))

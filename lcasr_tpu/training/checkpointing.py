"""Checkpoint save/load with the reference's embedded-config contract.

Counterpart of reference `lcasr/utils/general.py:97-194`: a checkpoint holds
{model, optimizer state, scheduler state, sequence-scheduler state, seen_ids,
epoch, podcast_step, **full config**}, eval rebuilds the model purely from the
checkpoint, `find_latest_checkpoint` picks by step number, and
`avg_all_models_in_dir` averages params across seed repeats.

Storage: orbax for the array pytrees (async-capable, TPU-native sharding
aware), JSON sidecar for host-side state (config, seen_ids, scheduler states).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from lcasr_tpu.config import Config


def save_checkpoint(
    directory: str,
    step: int,
    params,
    opt_state=None,
    batch_stats=None,
    config: Optional[Config] = None,
    scheduler_state: Optional[Dict[str, Any]] = None,
    sequence_scheduler_state: Optional[Dict[str, Any]] = None,
    seen_ids: Optional[List[str]] = None,
    epoch: int = 0,
) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))

    tree: Dict[str, Any] = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if batch_stats:  # an EMPTY stats dict must not enter the tree: restore
        # targets gate on truthiness and orbax rejects structure mismatches
        tree["batch_stats"] = batch_stats

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), tree, force=True)
    ckptr.wait_until_finished()

    meta = {
        "podcast_step": step,
        "epoch": epoch,
        "seen_ids": seen_ids or [],
        "config": config.to_dict() if config is not None else {},
        "scheduler": scheduler_state or {},
        "sequence_scheduler": sequence_scheduler_state or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def find_latest_checkpoint(directory: str, pattern: str = r"step_(\d+)") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(pattern, name)
        # meta.json is written LAST: it is the commit marker.  A crash
        # mid-save leaves arrays without meta — such a dir must not be
        # selected or resume bricks on the incomplete checkpoint.
        if (m and int(m.group(1)) > best_step
                and os.path.exists(os.path.join(directory, name, "meta.json"))):
            best, best_step = name, int(m.group(1))
    return os.path.join(directory, best) if best else None


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (array tree, meta dict).  `target` (a matching pytree of
    abstract/concrete arrays) restores with correct dtypes/shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        # normalize target leaves to concrete jax.Arrays: flax init under
        # remat can leave lazy literal leaves (jax TypedNdArray, e.g.
        # BatchRenorm's scalar num_batches_tracked) that orbax's restore
        # target validation rejects; asarray is a no-op for real Arrays and
        # preserves committed shardings
        import jax.numpy as jnp

        target = jax.tree.map(
            lambda x: x if isinstance(x, (jax.Array, jax.ShapeDtypeStruct))
            and type(x).__name__ != "TypedNdArray" else jnp.asarray(x),
            target,
        )
        tree = ckptr.restore(os.path.join(path, "arrays"), target=target)
    else:
        tree = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return tree, meta


def average_checkpoints(paths: List[str]) -> Dict[str, Any]:
    """Average `params` across checkpoints (reference
    `avg_all_models_in_dir`, `general.py:175-194`)."""
    assert paths, "no checkpoints to average"
    acc = None
    for p in paths:
        tree, _ = load_checkpoint(p)
        params = tree["params"]
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64), acc, params)
    n = float(len(paths))
    return jax.tree.map(lambda a: (a / n).astype(np.float32), acc)


def avg_all_models_in_dir(directory: str, step_name: Optional[str] = None) -> Dict[str, Any]:
    """Average the SAME-step checkpoint across seed-repeat run folders
    (reference `avg_all_models_in_dir`, general.py:175-194: path/<repeat>/
    step_105360.pt).  `step_name` e.g. "step_105360"; None averages each
    repeat folder's LATEST checkpoint."""
    paths = []
    for d in sorted(os.listdir(directory)):
        sub = os.path.join(directory, d)
        if not os.path.isdir(sub):
            continue
        if step_name is not None:
            cand = os.path.join(sub, step_name)
            if os.path.exists(os.path.join(cand, "meta.json")):
                paths.append(cand)
        else:
            latest = find_latest_checkpoint(sub)
            if latest:
                paths.append(latest)
    if not paths and step_name is None:
        # back-compat: a single run dir of step_N checkpoints
        paths = sorted(
            os.path.join(directory, d)
            for d in os.listdir(directory)
            if re.fullmatch(r"step_(\d+)", d)
            and os.path.exists(os.path.join(directory, d, "meta.json"))
        )
    return average_checkpoints(paths)

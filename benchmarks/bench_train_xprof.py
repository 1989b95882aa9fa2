"""Op-level roofline of the 120k-frame flagship TRAINING step (VERDICT r4 #4).

The decode path got the xprof treatment in round 3 (PERFORMANCE.md op
table); this gives the training step the same: the flagship
lcasr-9L-768D-6H at the paper's 20-minute context (120,000 frames, batch 1,
full remat + chunked subsampling backward + segmented CTC — the exact
`benchmarks/RESULTS_train_long.json` `20min_b1_full_remat` configuration,
built through the PRODUCTION `Trainer._micro_step_fn` + `_apply_updates_fn`)
captured with `jax.profiler` and decomposed from the xplane proto:

  * per-op-name device totals (top ops),
  * rollups by op group (GEMM fusions, Pallas attention fwd/bwd, conv,
    CTC scan, optimizer, elementwise/copies),
  * device-busy time per step vs end-to-end wall per step.

Writes benchmarks/RESULTS_train_xprof.json and prints the rollup.
Run on the real chip:  python benchmarks/bench_train_xprof.py
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

CHUNK = 120_000
BATCH = 1
TRACE_DIR = "/tmp/lcasr_train_xprof"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "RESULTS_train_xprof.json")
N_PROFILED = 3


def build_step():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/lcasr_tpu/jax_cache"))
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.training.trainer import Trainer

    cfg = Config({
        "model_class": "SCConformerXL",
        "model": {
            "d_model": 768, "n_heads": 6, "head_dim": 128, "n_layers": 9,
            "subsampling_conv_channels": 256, "subsampling_act": "silu",
            "conv_kernel_size": 9, "use_rotary": True,
            "rotary_base_freq": 1500000.0, "self_conditioning": True,
            "default_norm": "layer_norm", "checkpoint_every_n_layers": 1,
            "remat_policy": "nothing", "remat_subsampling": True,
        },
        "audio_chunking": {"size": CHUNK, "overlap": 0},
        "training": {"batch_size": BATCH, "backprop_every": 1,
                     "clip_value": 0.8, "max_epochs": 1, "random_seed": 1,
                     "dtype": "bfloat16", "ctc_segment_size": 256},
        "optimizer": {"name": "madgrad", "args": {"lr": 1e-4}},
        "scheduler": {"warmup_steps": 10, "final_value": 1e-6},
        "checkpointing": {"dir": "/tmp/lcasr_train_xprof_ckpt",
                          "save_every_n_steps": 10 ** 9},
    })
    tok = load_tokenizer()
    model = load_model(cfg, tok.vocab_size(), get_model_class(cfg))
    trainer = Trainer(cfg, model, tok,
                      checkpoint_dir="/tmp/lcasr_train_xprof_ckpt")
    state = trainer.init_state(jax.random.PRNGKey(0))
    micro = trainer._micro_step_fn()
    apply_updates = trainer._apply_updates_fn()
    zero = trainer._zero_grads_fn(state["params"])(state["params"])

    rng = np.random.default_rng(0)
    U = max(64, CHUNK // 32)
    batch = {
        "audio": jnp.asarray(rng.normal(size=(BATCH, 80, CHUNK)).astype(np.float32)),
        "audio_lengths": jnp.full((BATCH,), CHUNK, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4094, size=(BATCH, U))),
        "label_lengths": jnp.full((BATCH,), U, jnp.int32),
        "weight": jnp.ones((BATCH,), np.float32),
    }
    key = jax.random.PRNGKey(1)

    def one_step(state, grads):
        loss, grads, stats, _ = micro(
            state["params"], state["batch_stats"], batch, key, grads)
        params, opt_state = apply_updates(
            state["params"], state["opt_state"], grads, 1.0)
        return loss, dict(state, params=params, opt_state=opt_state,
                          batch_stats=stats)

    return jax, state, zero, one_step


def parse_xplane(trace_dir: str):
    """Sum device-op durations from the captured xplane proto."""
    from xprof.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane capture under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "Host" in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()} if \
            isinstance(plane.event_metadata, dict) else \
            {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                d = per_op.setdefault(name, [0, 0.0])
                d[0] += 1
                d[1] += ev.duration_ps / 1e9  # → ms
    return path, per_op


GROUPS = [
    ("pallas_attention", ("attend", "flash", "fwd_kernel", "bwd_", "custom-call")),
    ("gemm_fusions", ("fusion", "convert_reduce", "dot", "gemm")),
    ("convolution", ("convolution", "conv")),
    ("ctc_scan", ("while", "scan", "ctc")),
    ("dynamic_slice_update", ("dynamic-update-slice", "dynamic-slice", "slice")),
    ("copies_layout", ("copy", "bitcast", "transpose")),
    ("other", ()),
]


def rollup(per_op):
    groups = {g: [0, 0.0] for g, _ in GROUPS}
    for name, (cnt, ms) in per_op.items():
        low = name.lower()
        for g, pats in GROUPS:
            if not pats or any(p in low for p in pats):
                groups[g][0] += cnt
                groups[g][1] += ms
                break
    return groups


def main():
    jax, state, zero, one_step = build_step()
    print("compiling 120k training step (warm cache)...", flush=True)
    t0 = time.time()
    loss, state = one_step(state, zero)
    print(f"warmup: loss={float(loss):.3f} in {time.time() - t0:.1f}s",
          flush=True)

    # timed (unprofiled) steps for the wall reference
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, state = one_step(state, zero)
        _ = float(loss)  # sync through the tunnel
        walls.append(time.perf_counter() - t0)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(N_PROFILED):
        loss, state = one_step(state, zero)
        _ = float(loss)
    jax.profiler.stop_trace()

    path, per_op = parse_xplane(TRACE_DIR)
    top = sorted(per_op.items(), key=lambda kv: -kv[1][1])[:30]
    groups = rollup(per_op)
    total_ms = sum(ms for _, ms in per_op.values()) if per_op else 0.0
    result = {
        "bench": "train_xprof_120k",
        "chunk_frames": CHUNK,
        "batch": BATCH,
        "n_profiled_steps": N_PROFILED,
        "wall_ms_per_step": round(float(np.median(walls)) * 1000, 1),
        "device_busy_ms_per_step": round(total_ms / N_PROFILED, 1),
        "xplane": path,
        "groups_ms_per_step": {
            g: {"count": c // N_PROFILED, "ms": round(ms / N_PROFILED, 2)}
            for g, (c, ms) in groups.items()
        },
        "top_ops": [
            {"op": name, "count": cnt // N_PROFILED,
             "ms_per_step": round(ms / N_PROFILED, 3)}
            for name, (cnt, ms) in top
        ],
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("wall_ms_per_step", "device_busy_ms_per_step",
                       "groups_ms_per_step")}, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

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

    # reuse the LADDER run's persistent cache: the profiled program is then
    # byte-identical to the production ladder's 120k micro step (the remote
    # compile service has shown 30+-minute cold compiles at this scale in
    # congested windows — a fresh HLO here is a gamble, a cache hit is ~90 s)
    jax.config.update("jax_compilation_cache_dir", "/tmp/lcasr_ladder/jax_cache"
                      if os.path.isdir("/tmp/lcasr_ladder/jax_cache")
                      else os.path.expanduser("~/.cache/lcasr_tpu/jax_cache"))
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
    # label bucket matching the ladder corpus's 120k chunks (make_chunks'
    # 64-multiple bucket of the real tokenized text) — required for the
    # cache hit above
    U = 2752
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
    """Per-HLO-op device stats from the capture via xprof's hlo_stats tool:
    {name: (occurrences, self_time_ms, category, bound_by, flop_rate_gf,
    source)}."""
    import re

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane capture under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    obj = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = {c["id"]: i for i, c in enumerate(obj["cols"])}

    per_op = {}
    for row in obj["rows"]:
        v = [c.get("v") for c in row["c"]]
        name = v[cols["hlo_op_name"]]
        src = v[cols["source_info"]] or ""
        m = re.search(r">([^<]+)</div>", src)
        per_op[name] = (
            int(v[cols["occurrences"]] or 0),
            float(v[cols["total_self_time"]] or 0.0) / 1e3,  # µs → ms
            v[cols["category"]] or "",
            v[cols["bound_by"]] or "",
            float(v[cols["normalized_flop_rate"]] or 0.0),
            m.group(1) if m else "",
        )
    return path, per_op


def rollup(per_op):
    """Sum self time by the tool's own HLO category, with the Pallas
    attention custom-calls and the CTC/subsampling scan loops split out by
    name/source."""
    groups = {}
    for name, (cnt, ms, cat, _, _, src) in per_op.items():
        low, lsrc = name.lower(), src.lower()
        if "custom-call" in cat.lower() or "tpu_custom_call" in low:
            g = "pallas_attention"
        elif "while" in cat.lower() or low.startswith("while"):
            if "ctc" in lsrc:
                g = "ctc_scan"
            elif "subsampling" in lsrc:
                g = "subsampling_chunked_scan"
            else:
                g = "while_loops_other"
        else:
            g = cat
        d = groups.setdefault(g, [0, 0.0])
        d[0] += cnt
        d[1] += ms
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
    total_ms = sum(v[1] for v in per_op.values()) if per_op else 0.0
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
             "ms_per_step": round(ms / N_PROFILED, 3),
             "category": cat, "bound_by": bound,
             "flop_rate_gf": round(gf, 1), "source": src}
            for name, (cnt, ms, cat, bound, gf, src) in top
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

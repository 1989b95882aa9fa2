"""LONG-CONTEXT training steps on the real chip (VERDICT r3 #2).

Extends bench_train_step.py's schedule coverage to the paper's long-context
regimes (reference exp/configs/README.md:84-93: 512 → 360,000 frames):

  * 120,000 frames (the paper's 20-minute eval context) as a TRAINING chunk,
    batch 1, full remat — the configuration nothing beyond a CPU dryrun had
    ever demonstrated on TPU;
  * the largest 360k-frame (1-hour) configuration that fits one chip
    (remat everywhere + segmented CTC backward + remat subsampling); if it
    does not fit, the OOM point is RECORDED, and
  * the 8-shard CP plan's per-shard shape (360k/8 = 45,000 frames) run at
    real shard shapes on the one chip.

Each row records ms/step, training audio-s/s, and the compiler's memory
analysis (argument/output/temp/peak bytes from compiled.memory_analysis())
— the honest HBM high-water for the compiled step, independent of the
tunnel backend's runtime stat support.

Writes/prints one JSON row per config (errors recorded, not fatal).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def run_config(jax, jnp, FLAGSHIP, chunk, batch, policy, ctc_segment,
               n_chain, label=None, attention_window=None,
               remat_sub=True):
    from lcasr_tpu.models.base import decay_mask
    from lcasr_tpu.models.sconformer_xl import SCConformerXL
    from lcasr_tpu.ops.ctc import ctc_loss
    from lcasr_tpu.optim.factory import build_optimizer

    rng = np.random.default_rng(0)
    kw = dict(FLAGSHIP)
    model = SCConformerXL(
        **kw, dtype=jnp.bfloat16, checkpoint_every_n_layers=1,
        remat_policy=policy, remat_subsampling=remat_sub,
        **({"attention_window_size": attention_window}
           if attention_window else {}),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 512), jnp.float32),
        length=jnp.array([512]),
    )
    params = jax.device_put(variables["params"])
    batch_stats = jax.device_put(variables.get("batch_stats", {}))
    optimizer = build_optimizer("madgrad", lr=1e-4,
                                weight_decay_mask=decay_mask(params))
    opt_state = jax.device_put(optimizer.init(params))

    # labels at the paper's density: ~1 token per 32 frames
    U = max(64, chunk // 32)
    audio = jnp.asarray(rng.normal(size=(batch, 80, chunk)).astype(np.float32))
    lengths = jnp.full((batch,), chunk, jnp.int32)
    labels = jnp.asarray(rng.integers(0, 4094, size=(batch, U)))
    label_lengths = jnp.full((batch,), U, jnp.int32)

    def one_step(params, batch_stats, opt_state, audio, lengths, labels,
                 label_lengths):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                audio, length=lengths, train=True, mutable=["batch_stats"],
            )
            nll = ctc_loss(
                out["final_posteriors"].astype(jnp.float32),
                labels, out["length"], label_lengths,
                segment_size=ctc_segment,
            )
            return nll, mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state_n = optimizer.update(grads, opt_state, params)
        params_n = jax.tree.map(lambda a, u: a + u, params, updates)
        return params_n, stats, opt_state_n, loss

    @jax.jit
    def stepN(params, batch_stats, opt_state, audio, lengths, labels,
              label_lengths):
        def body(_, carry):
            p, bs, os_, _ = carry
            return one_step(p, bs, os_, audio, lengths, labels, label_lengths)
        loss0 = jnp.zeros((), jnp.float32)
        return jax.lax.fori_loop(
            0, n_chain, body, (params, batch_stats, opt_state, loss0))

    row = {
        "bench": "train_long",
        "label": label or f"{chunk}f_b{batch}_{policy}",
        "chunk_frames": chunk,
        "batch": batch,
        "remat_policy": policy,
        "remat_subsampling": remat_sub,
        "ctc_segment_size": ctc_segment,
        "attention_window": attention_window,
    }
    # compile + memory analysis first: an OOM at this stage is a COMPILE
    # verdict (program doesn't fit), recorded distinctly from runtime OOM
    lowered = stepN.lower(params, batch_stats, opt_state, audio, lengths,
                          labels, label_lengths)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        row["hbm"] = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**30, 2),
        }
    except Exception as e:  # noqa: BLE001 — backend may not expose it
        row["hbm"] = {"error": str(e)[:200]}

    params, batch_stats, opt_state, loss = compiled(
        params, batch_stats, opt_state, audio, lengths, labels, label_lengths)
    row["loss_finite"] = bool(np.isfinite(float(loss)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        params, batch_stats, opt_state, loss = compiled(
            params, batch_stats, opt_state, audio, lengths, labels,
            label_lengths)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    dt = best / n_chain
    row["ms_per_step"] = round(dt * 1000, 1)
    row["train_audio_s_per_s"] = round(batch * chunk / 100.0 / dt, 1)
    return row


CONFIGS = [
    # (chunk, batch, policy, ctc_segment, n_chain, label, attn_window)
    (120_000, 1, "nothing", 256, 3, "20min_b1_full_remat", None),
    (120_000, 1, "dots", 256, 3, "20min_b1_remat_dots", None),
    # with the chunked-scan subsampling backward (r4: 11.1 GB -> 1.5 GB
    # conv workspace) batch 2 may fit the 20-min chunk
    (120_000, 2, "nothing", 256, 3, "20min_b2_full_remat", None),
    # 1 hour on ONE chip: full remat + segmented CTC + chunked subsampling
    (360_000, 1, "nothing", 256, 2, "1hour_b1_single_chip", None),
    # fallback ladder if the full-attention 1-hour step doesn't fit:
    # banded attention (the reference's windowed-train analogue)
    (360_000, 1, "nothing", 256, 2, "1hour_b1_banded_w2048", 2048),
    # the 8-shard CP plan's per-shard shape, run at real shard size
    (45_000, 1, "nothing", 256, 3, "1hour_cp8_per_shard_shape", None),
]


def run_one(index: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from __graft_entry__ import FLAGSHIP

    chunk, batch, policy, seg, n_chain, label, win = CONFIGS[index]
    row = run_config(jax, jnp, FLAGSHIP, chunk, batch, policy, seg,
                     n_chain, label=label, attention_window=win)
    print("ROW " + json.dumps(row), flush=True)


def main():
    """Each config runs in its OWN subprocess: the tunnel backend does not
    reliably release HBM across jit programs in one process, so a 15 GB-peak
    config poisons every config after it (measured: the 45k-frame shard
    shape 'OOM'ed after the 120k run in-process, then fit cleanly alone)."""
    import subprocess
    import sys

    rows = []
    for i, (chunk, batch, policy, seg, n_chain, label, win) in enumerate(CONFIGS):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(i)],
            capture_output=True, text=True, timeout=3600,
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("ROW "):
                row = json.loads(line[4:])
        if row is None:
            blob = (proc.stderr or "") + (proc.stdout or "")
            lines = [l for l in blob.strip().splitlines() if l.strip()]
            err = next((l.strip() for l in lines
                        if "RESOURCE_EXHAUSTED" in l or "Error" in l
                        or "error" in l.lower()),
                       lines[-1].strip() if lines else "no output")
            row = {
                "bench": "train_long", "label": label,
                "chunk_frames": chunk, "batch": batch,
                "remat_policy": policy, "ctc_segment_size": seg,
                "attention_window": win, "error": err[:400],
            }
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "RESULTS_train_long.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1:
        run_one(int(_sys.argv[1]))
    else:
        main()

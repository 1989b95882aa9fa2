"""1-hour-context (360k-frame) training step, sequence-sharded over 8 shards.

The capability target from SURVEY §2.9: the reference trains its longest
configs (seq 360,000 mel frames = 1 hour, batch 1) on one GPU with flash
attention + activation checkpointing; this framework additionally shards the
context across the `seq` mesh axis (full-model context parallelism — conv
halo exchanges + gathered-KV/banded attention) so contexts that exceed one
chip's HBM still train.

Run (virtual 8-device CPU mesh; on hardware drop the env vars):
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/dryrun_cp_1hour.py

Writes benchmarks/RESULTS_cp_1hour.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lcasr_tpu.models.sconformer_xl import SCConformerXL
from lcasr_tpu.ops.ctc import ctc_loss
from lcasr_tpu.parallel.cp_model import context_parallel_apply
from lcasr_tpu.parallel.mesh import make_mesh


def main():
    wide = "--wide" in sys.argv
    n = 8
    assert len(jax.devices()) >= n, "needs 8 devices (see module docstring)"
    mesh = make_mesh({"data": 1, "model": 1, "seq": n})

    # windowed attention for the hour-scale config (the banded chunked oracle
    # keeps score memory O(chunk·band) off-TPU; on TPU the Pallas kernel's
    # banded DMA-skip grids take over).  Default model deliberately tiny: the
    # dryrun validates the 360k-frame seq-sharded SHAPES end to end; XLA:CPU's
    # collective rendezvous aborts after 40 s, and 8 virtual devices share
    # ONE core here, so per-shard compute between collectives must stay small.
    # --wide: FULL flagship width (d_model 768, H6 D128, vocab 4096, madgrad-
    # style fp32 path) at reduced depth/frames — the widest configuration the
    # 1-core CPU mesh can bear (docs/MEMORY_BUDGET_1H.md validation artifact).
    if wide:
        T, B, VOCAB = 92_160, 1, 4096  # 15.4 min; multiple of shards x sf
        model = SCConformerXL(
            vocab_size=VOCAB, d_model=768, n_layers=1, n_heads=6, head_dim=128,
            subsampling_conv_channels=256, use_rotary=True,
            rotary_base_freq=1.5e6,
            use_pallas=jax.default_backend() == "tpu",
            attention_window_size=256,
            checkpoint_every_n_layers=1,
            remat_subsampling=True,
        )
    else:
        T, B, VOCAB = 360_000, 1, 64
        model = SCConformerXL(
            vocab_size=VOCAB, d_model=64, n_layers=1, n_heads=1, head_dim=64,
            subsampling_conv_channels=16, use_rotary=True, rotary_base_freq=1.5e6,
            use_pallas=jax.default_backend() == "tpu",
            attention_window_size=256,
            checkpoint_every_n_layers=1,
        )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(B, 80, T)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(0, VOCAB, size=(B, 32)), jnp.int32)
    label_lengths = jnp.full((B,), 32, jnp.int32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 512), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        out, mut = context_parallel_apply(
            model, {"params": p, "batch_stats": stats}, audio, mesh,
            lengths=lengths, train=True, mutable=True,
        )
        nll = ctc_loss(
            out["final_posteriors"].astype(jnp.float32), labels,
            out["length"], label_lengths, reduction="sum",
        )
        return nll, mut

    t0 = time.time()
    # jit required: remat's closed_call can't be eagerly evaluated inside
    # shard_map (and jit is the production path anyway)
    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss, _), grads = step(params)
    gnorm = float(
        jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum() for g in jax.tree.leaves(grads)))
    )
    wall = time.time() - t0
    result = {
        "frames": T,
        "seq_shards": n,
        "wide": wide,
        "d_model": model.d_model,
        "vocab": VOCAB,
        "backend": jax.default_backend(),
        "loss": float(loss),
        "grad_norm": gnorm,
        "wall_s": round(wall, 1),
        "finite": bool(np.isfinite(float(loss)) and np.isfinite(gnorm)),
    }
    print(json.dumps(result))
    assert result["finite"], result
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "benchmarks",
        "RESULTS_cp_1hour_wide.json" if wide else "RESULTS_cp_1hour.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

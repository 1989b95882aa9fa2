"""Dry-run the paper's widest model (3L-2048D-16H, ~315M params) through the
production Trainer under tensor parallelism + ZeRO on the virtual 8-device
CPU mesh — the full-width counterpart of the tiny-model TP parity test
(tests/test_trainer_integration.py), proving the REAL configuration
(configs/lcasr_3l_2048d_16h_tp.yaml's model block + mesh) compiles and
executes a training step with the params actually sharded on the model axis
and optimizer state sharded over data.

Run:
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/dryrun_tp315m.py

Writes benchmarks/RESULTS_tp315m_dryrun.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    assert len(jax.devices()) >= 8, "needs 8 devices (see header)"

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.trainer import Trainer

    # one 256-frame recording → exactly one chunk / one optimizer step
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tp315m_")
    rng = np.random.default_rng(0)
    np.save(os.path.join(tmp, "r0.spec.npy"),
            rng.normal(size=(1, 80, 256)).astype(np.float32))
    words = [{"word": w, "startTime": f"{0.2 + 0.35 * i:.2f}s",
              "endTime": f"{0.5 + 0.35 * i:.2f}s"}
             for i, w in enumerate("the wide model trains in parallel".split())]
    with open(os.path.join(tmp, "r0.json"), "w") as f:
        json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
    pairs = {"r0": {"audio": os.path.join(tmp, "r0.spec.npy"),
                    "txt": os.path.join(tmp, "r0.json"), "duration": 2.56}}

    cfg = Config({
        "model_class": "SCConformerXL",
        # the real 315M block (configs/lcasr_3l_2048d_16h_tp.yaml)
        "model": {"d_model": 2048, "n_heads": 16, "head_dim": 128,
                  "n_layers": 3, "subsampling_conv_channels": 256,
                  "use_pallas": False, "checkpoint_every_n_layers": 1},
        "audio_chunking": {"size": 256, "overlap": 0},
        "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 1,
                     "clip_value": 0.8, "random_seed": 0},
        "optimizer": {"name": "madgrad", "args": {"lr": 1e-4}},
        "scheduler": {"warmup_steps": 2, "final_value": 1e-6},
        "checkpointing": {"dir": os.path.join(tmp, "ckpt"),
                          "save_every_n_steps": 10**6},
        "parallel": {"mesh": {"data": 2, "model": 4, "seq": 1},
                     "zero_optimizer": True},
    })
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size())
    trainer = Trainer(cfg, model, tokenizer)

    t0 = time.time()
    state = trainer.init_state(jax.random.PRNGKey(0))
    t_init = time.time() - t0
    n_params = sum(x.size for x in jax.tree.leaves(state["params"]))

    # params sharded on the model axis: at least one leaf's per-device
    # shard is 1/4 of the leaf
    sharded = [
        x for x in jax.tree.leaves(state["params"])
        if x.sharding.shard_shape(x.shape) != x.shape
    ]
    assert sharded, "no parameter is sharded on the mesh"
    frac = min(
        np.prod(x.sharding.shard_shape(x.shape)) / x.size for x in sharded
    )

    dataloader = VariableBatchSimpleDataloader(
        pairs=pairs, tokenizer=tokenizer, batch_size=2, chunk_size=256,
        chunk_overlap=0, random_seed=0,
    )
    t0 = time.time()
    state = trainer.train(state, dataloader)
    t_train = time.time() - t0

    lines = [json.loads(l) for l in
             open(os.path.join(tmp, "ckpt", "metrics.jsonl"))]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert losses and np.isfinite(losses[0])

    out = {
        "model": "3L-2048D-16H",
        "n_params": int(n_params),
        "mesh": {"data": 2, "model": 4},
        "zero_optimizer": True,
        "min_sharded_param_fraction": float(frac),
        "init_s": round(t_init, 1),
        "train_step_s_incl_compile": round(t_train, 1),
        "loss": float(losses[0]),
        "backend": jax.devices()[0].platform,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "RESULTS_tp315m_dryrun.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

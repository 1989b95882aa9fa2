"""MESH-LEVEL closed loop (VERDICT r3 #6): the full
train→checkpoint→eval→WER loop executed on the 8-way virtual CPU mesh via
the production CLI (`cli/train.py` reading a yaml config with
`parallel.mesh`), asserting (a) the WER collapses exactly as the
single-device loop does and (b) the logged loss trajectory EQUALS the
single-device trajectory — sharding must be a pure execution detail.

Covers (data=2, seq=2) — DP × context-parallel, the long-context
production layout — and (model=2) tensor parallelism.
"""
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.test_closed_loop import synth_corpus  # noqa: F401 (fixture reuse)

pytestmark = pytest.mark.slow

BASE_CFG = {
    "model_class": "SCConformerXL",
    # layer_norm conv for the same eval-time running-stat reason documented
    # in test_closed_loop.py
    "model": {"d_model": 96, "n_layers": 2, "n_heads": 2, "head_dim": 48,
              "subsampling_conv_channels": 32, "use_pallas": False,
              "conv_norm": "layer_norm"},
    "audio_chunking": {"size": 512, "overlap": 0},
    "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 400,
                 "clip_value": 1.0, "random_seed": 1234},
    "optimizer": {"name": "madgrad", "args": {"lr": 3e-3}},
    "scheduler": {"warmup_steps": 5, "final_value": 3e-3},
}


def _write_cfg(tmp_path, pairs_path, ckpt_dir, mesh, max_epochs):
    import yaml

    cfg = json.loads(json.dumps(BASE_CFG))  # deep copy
    cfg["training"]["max_epochs"] = max_epochs
    cfg["data"] = {"path": str(pairs_path)}
    cfg["checkpointing"] = {"dir": str(ckpt_dir), "save_every_n_steps": 10**9}
    if mesh:
        cfg["parallel"] = {"mesh": mesh}
    path = tmp_path / f"cfg_{'_'.join(f'{k}{v}' for k, v in (mesh or {'single': 1}).items())}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _losses(ckpt_dir):
    lines = [json.loads(l) for l in open(os.path.join(str(ckpt_dir), "metrics.jsonl"))]
    return [l["loss"] for l in lines if "loss" in l]


@pytest.fixture(scope="module")
def single_device_trajectory(synth_corpus, tmp_path_factory):  # noqa: F811
    """Short single-device CLI run: the trajectory yardstick every mesh
    layout must reproduce."""
    from lcasr_tpu.cli.train import main as train_main

    pairs_path, _ = synth_corpus
    tmp = tmp_path_factory.mktemp("mesh_yardstick")
    ckpt_dir = tmp / "ckpt_single"
    cfg_path = _write_cfg(tmp, pairs_path, ckpt_dir, None, max_epochs=6)
    train_main(["-config", cfg_path])
    losses = _losses(ckpt_dir)
    assert len(losses) >= 10
    return losses


@pytest.mark.parametrize("mesh", [{"data": 2, "seq": 2}, {"model": 2}],
                         ids=["dp2_cp2", "tp2"])
def test_mesh_closed_loop(synth_corpus, tmp_path, mesh,  # noqa: F811
                          single_device_trajectory):
    if jax.device_count() < max(2, int(np.prod(list(mesh.values())))):
        pytest.skip("needs the 8-device CPU mesh (run via ./run_tests.sh cpu)")

    from lcasr_tpu.cli.train import main as train_main
    from lcasr_tpu.evaluation.run import evaluate
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint

    pairs_path, _ = synth_corpus

    # --- short run first: trajectory must EQUAL single-device ---
    ckpt_short = tmp_path / "ckpt_short"
    cfg_short = _write_cfg(tmp_path, pairs_path, ckpt_short, mesh, max_epochs=6)
    train_main(["-config", cfg_short])
    losses_mesh = _losses(ckpt_short)
    n = min(len(losses_mesh), len(single_device_trajectory))
    assert n >= 10
    # fp32 CPU both sides; only reduction order differs (psum/collectives)
    np.testing.assert_allclose(
        losses_mesh[:n], single_device_trajectory[:n], rtol=2e-4, atol=2e-4)

    # --- full loop: train to convergence on the mesh, eval through the ---
    # --- production pipeline, assert the WER collapses                 ---
    ckpt_dir = tmp_path / "ckpt_full"
    cfg_full = _write_cfg(tmp_path, pairs_path, ckpt_dir, mesh, max_epochs=400)
    train_main(["-config", cfg_full])
    ckpt = find_latest_checkpoint(str(ckpt_dir))
    assert ckpt is not None
    losses = _losses(ckpt_dir)
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    summary = evaluate(
        checkpoint=ckpt, dataset="spotify",
        dataset_kwargs={"pairs_path": pairs_path},
        seq_len=512, overlap=256, verbose=False,
    )
    assert summary["words"] > 0
    assert summary["wer"] <= 0.05, summary["wer"]

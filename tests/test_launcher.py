import os

import yaml

from lcasr_tpu.cli.launcher import expand_template, restart, submit
from lcasr_tpu.config import Config


def test_template_expansion(tmp_path):
    template = {
        "template_info": {
            "template_keys": [
                "sequence_scheduler.max_sequence_length",
                "training.random_seed",
            ]
        },
        "model": {"d_model": 768},
        "training": {"random_seed": [1, 2, 3, 4]},
        "sequence_scheduler": {"max_sequence_length": [512, 2048, 16384, 360000]},
    }
    tpath = tmp_path / "template.yaml"
    with open(tpath, "w") as f:
        yaml.safe_dump(template, f)

    paths = expand_template(str(tpath), str(tmp_path / "configs"))
    assert len(paths) == 4
    cfg2 = Config.load(paths[2])
    assert cfg2.sequence_scheduler.max_sequence_length == 16384
    assert cfg2.training.random_seed == 3
    assert cfg2.model.d_model == 768
    assert "template_info" not in cfg2


def test_submit_renders_scripts(tmp_path):
    cfg = tmp_path / "run.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"model": {}}, f)
    scripts = submit([str(cfg)], dry_run=True)
    assert os.path.exists(scripts[0])
    body = open(scripts[0]).read()
    assert "lcasr_tpu.cli.train" in body and str(cfg) in body


def test_restart_rerandomizes_seed(tmp_path):
    cfg_path = tmp_path / "run.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"training": {"random_seed": 1234}}, f)
    restart(str(cfg_path), dry_run=True)
    cfg = Config.load(str(cfg_path))
    assert isinstance(cfg.training.random_seed, int)
    # overwhelmingly likely to change; structural check is that it persisted
    assert "random_seed" in cfg.training


def test_maybe_init_distributed_noop_without_config(monkeypatch):
    """Unconfigured (no coordinator) → False and no side effects."""
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    from lcasr_tpu.parallel.mesh import maybe_init_distributed

    assert maybe_init_distributed() is False

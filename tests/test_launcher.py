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


def test_restart_keep_seed_and_explicit_seed(tmp_path):
    """run_restarter.py:49-53 parity: --keep_seed preserves the config seed;
    an explicit --seed pins it."""
    cfg_path = tmp_path / "run.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"training": {"random_seed": 1234}}, f)
    restart(str(cfg_path), dry_run=True, keep_seed=True)
    assert Config.load(str(cfg_path)).training.random_seed == 1234
    restart(str(cfg_path), dry_run=True, seed="777")
    assert Config.load(str(cfg_path)).training.random_seed == 777


def test_maybe_init_distributed_noop_without_config(monkeypatch):
    """Unconfigured (no coordinator) → False and no side effects."""
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    from lcasr_tpu.parallel.mesh import maybe_init_distributed

    assert maybe_init_distributed() is False


def test_model_zoo_covers_every_paper_row_and_builds(tmp_path):
    """Every zoo entry overlays onto the real paper template, expands,
    parses as Config, and constructs its model class (reference collapses
    this into 13 per-model template files under
    exp/configs/paper_templates/)."""
    from lcasr_tpu.cli.launcher import DEFAULT_ZOO, expand_template
    from lcasr_tpu.models.registry import get_model_class, load_model

    with open(DEFAULT_ZOO) as f:
        zoo = yaml.safe_load(f)["zoo"]
    # the README model table rows (SURVEY/README.md:32-44) must all be present
    for expected in [
        "lcasr_9l_768d_6h", "lcasr_6l_768d_6h", "lcasr_6l_768d_12h",
        "lcasr_6l_768d_24h", "lcasr_6l_768d_nopos", "lcasr_6l_768d_fourier",
        "lcasr_3l_2048d_16h", "lcasr_3l_768d_6h", "lcasr_12l_256d_8h",
        "lcasr_6l_256d_8h",
    ]:
        assert expected in zoo, expected

    template = os.path.join(
        os.path.dirname(DEFAULT_ZOO), "paper_template_seq_rotary.yaml"
    )
    for name, entry in zoo.items():
        paths = expand_template(template, str(tmp_path / name), zoo_model=name)
        assert len(paths) == 12  # 4 seq lens x 3 seeds
        cfg = Config.load(paths[0])
        # every override landed
        for path, value in (entry.get("overrides") or {}).items():
            assert cfg.select(path) == value, (name, path)
        model = load_model(cfg, 4095, get_model_class(cfg))
        assert model.d_model == cfg.model.d_model

    # WER parity targets: 3 context lengths each, where published
    for name, entry in zoo.items():
        for key in ("expected_wer_tedlium", "expected_wer_earnings22"):
            if key in entry:
                assert len(entry[key]) == 3, (name, key)


def test_zoo_unknown_model_raises(tmp_path):
    import pytest

    from lcasr_tpu.cli.launcher import apply_zoo_model

    with pytest.raises(ValueError, match="unknown zoo model"):
        apply_zoo_model({}, "lcasr_999l")


def test_zoo_overlay_onto_empty_yaml_section(tmp_path):
    """An empty YAML section (`scheduler:` → None) must accept dot-path
    overrides instead of crashing on None.setdefault."""
    from lcasr_tpu.cli.launcher import apply_zoo_model

    template = yaml.safe_load("model:\n  d_model: 768\nscheduler:\n")
    assert template["scheduler"] is None
    out = apply_zoo_model(template, "lcasr_6l_256d_8h_5k_warmup")
    assert out["scheduler"]["warmup_steps"] == 5000
    assert out["model"]["d_model"] == 256

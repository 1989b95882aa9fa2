from lcasr_tpu.config import Config


def test_attribute_and_item_access():
    cfg = Config({"model": {"d_model": 768, "n_layers": 6}, "training": {"lr": 3e-4}})
    assert cfg.model.d_model == 768
    assert cfg["model"]["n_layers"] == 6
    assert cfg.training.lr == 3e-4
    assert "model" in cfg and "missing" not in cfg
    assert cfg.get("missing", 5) == 5


def test_interpolation():
    cfg = Config(
        {
            "model": {"d_model": 768},
            "checkpointing": {"dir": "/ckpt"},
            "wandb": {"name": "run_${model.d_model}"},
            "alias": "${model.d_model}",
        }
    )
    assert cfg.wandb.name == "run_768"
    assert cfg.alias == 768  # full-string interpolation preserves type


def test_merge_and_overrides():
    base = Config({"a": {"b": 1, "c": 2}, "d": 3})
    merged = base.merge({"a": {"b": 10}})
    assert merged.a.b == 10 and merged.a.c == 2 and merged.d == 3
    ov = base.apply_overrides(["a.c=99", "e.f=hello", "d=0.5"])
    assert ov.a.c == 99 and ov.e.f == "hello" and ov.d == 0.5


def test_roundtrip_save_load(tmp_path):
    cfg = Config({"x": [1, 2, {"y": "z"}], "n": None})
    p = str(tmp_path / "c.yaml")
    cfg.save(p)
    cfg2 = Config.load(p)
    assert cfg2.to_dict() == cfg.to_dict()

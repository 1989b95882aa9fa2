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


def test_shipped_configs_parse_and_build_models():
    """Every YAML under configs/ (except templates/zoo/paths) parses into
    Config, resolves a model class, and constructs the model; parallel.mesh
    products stay within a v5e-8."""
    import glob
    import os

    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.utils.resources import find_repo_file

    cfg_dir = os.path.dirname(find_repo_file(os.path.join("configs", "model_zoo.yaml")))
    skip = {"model_zoo.yaml", "paths_template.yaml", "eval_sweep_example.yaml",
            "paper_template_seq_rotary.yaml"}
    checked = 0
    for path in sorted(glob.glob(os.path.join(cfg_dir, "*.yaml"))):
        if os.path.basename(path) in skip:
            continue
        cfg = Config.load(path)
        model = load_model(cfg, 4095, get_model_class(cfg))
        assert model.d_model == cfg.model.d_model
        mesh = cfg.select("parallel.mesh")
        if mesh:
            n = (mesh.get("data", 1) * mesh.get("model", 1) * mesh.get("seq", 1))
            assert n <= 8, (path, n)
        checked += 1
    assert checked >= 3  # flagship, smoke, cp_1hour, 315M-TP


def test_training_dtype_reaches_model():
    """`training.dtype: bfloat16` (the reference's autocast dtype,
    `exp/train.py`) must set the model COMPUTE dtype — it was silently
    ignored before, so CLI-launched "bf16" training actually ran fp32."""
    import jax.numpy as jnp

    from lcasr_tpu.config import Config
    from lcasr_tpu.models.registry import load_model

    base = {"model_class": "SCConformerXL",
            "model": {"d_model": 64, "n_layers": 1}}

    m = load_model(Config(dict(base)), 64)
    assert m.dtype == jnp.float32  # default unchanged

    m = load_model(
        Config({**base, "training": {"dtype": "bfloat16"}}), 64)
    assert m.dtype == jnp.bfloat16

    # explicit model.dtype wins over training.dtype; strings normalize
    m = load_model(
        Config({"model_class": "SCConformerXL",
                "model": {"d_model": 64, "n_layers": 1,
                          "dtype": "float32"},
                "training": {"dtype": "bfloat16"}}), 64)
    assert m.dtype == jnp.float32

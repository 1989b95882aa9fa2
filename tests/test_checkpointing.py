import numpy as np
import pytest

from lcasr_tpu.config import Config
from lcasr_tpu.training import checkpointing


def _tree(seed):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": rng.normal(size=(4, 8)).astype(np.float32)},
        "norm": {"scale": rng.normal(size=(8,)).astype(np.float32)},
    }


def test_roundtrip_with_meta(tmp_path):
    params = _tree(0)
    cfg = Config({"model": {"d_model": 8}})
    path = checkpointing.save_checkpoint(
        str(tmp_path), step=42, params=params, config=cfg,
        scheduler_state={"last_epoch": 7}, seen_ids=["a", "b"], epoch=1,
    )
    tree, meta = checkpointing.load_checkpoint(path)
    np.testing.assert_array_equal(tree["params"]["dense"]["kernel"], params["dense"]["kernel"])
    assert meta["podcast_step"] == 42
    assert meta["epoch"] == 1
    assert meta["seen_ids"] == ["a", "b"]
    assert meta["config"]["model"]["d_model"] == 8
    assert meta["scheduler"]["last_epoch"] == 7


def test_find_latest(tmp_path):
    for step in (5, 100, 20):
        checkpointing.save_checkpoint(str(tmp_path), step=step, params=_tree(step))
    latest = checkpointing.find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("step_100")
    assert checkpointing.find_latest_checkpoint(str(tmp_path / "missing")) is None


def test_checkpoint_averaging(tmp_path):
    p1, p2 = _tree(1), _tree(2)
    a = checkpointing.save_checkpoint(str(tmp_path), step=1, params=p1)
    b = checkpointing.save_checkpoint(str(tmp_path), step=2, params=p2)
    avg = checkpointing.average_checkpoints([a, b])
    np.testing.assert_allclose(
        avg["dense"]["kernel"],
        (p1["dense"]["kernel"] + p2["dense"]["kernel"]) / 2,
        rtol=1e-6,
    )


@pytest.mark.slow  # fast-tier budget: covered by fast-tier siblings
def test_resume_preserves_mesh_shardings(tmp_path):
    """Trainer.resume on a mesh: restored params/opt-state leaves carry the
    SAME NamedShardings init_state pinned (a replicated restore would
    silently multiply per-chip memory under TP)."""
    import jax
    import numpy as np
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices (run via ./run_tests.sh cpu)")

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.trainer import Trainer

    cfg = Config({
        "model_class": "SCConformerXL",
        "model": {"d_model": 64, "n_layers": 1, "n_heads": 2, "head_dim": 32,
                  "subsampling_conv_channels": 32, "use_pallas": False},
        "audio_chunking": {"size": 256, "overlap": 0},
        "training": {"batch_size": 2},
        "optimizer": {"name": "madgrad", "args": {"lr": 1e-4}},
        "checkpointing": {"dir": str(tmp_path), "save_every_n_steps": 10**9},
        "parallel": {"mesh": {"data": 2, "model": 2}},
    })
    tok = load_tokenizer()
    trainer = Trainer(cfg, load_model(cfg, tok.vocab_size()), tok)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer.save(state, step=7, epoch=0, seen_ids=["a"])

    trainer2 = Trainer(cfg, load_model(cfg, tok.vocab_size()), tok)
    state2 = trainer2.init_state(jax.random.PRNGKey(1))
    state2, step, epoch, seen = trainer2.resume(state2)
    assert step == 7 and seen == ["a"]

    qkv = state["params"]["layers_0"]["attend"]["qkv_proj"]["kernel"]
    qkv2 = state2["params"]["layers_0"]["attend"]["qkv_proj"]["kernel"]
    assert qkv2.sharding.spec == qkv.sharding.spec
    np.testing.assert_allclose(np.asarray(qkv2), np.asarray(qkv))
    # opt-state mirrors keep their pinned shardings through restore
    for path, leaf in jax.tree_util.tree_flatten_with_path(state2["opt_state"])[0]:
        if any("qkv_proj" in str(k) for k in path) and tuple(leaf.shape) == tuple(qkv.shape):
            assert leaf.sharding.spec == qkv.sharding.spec, path


def test_resume_without_batch_stats(tmp_path):
    from lcasr_tpu.training.checkpointing import load_checkpoint, save_checkpoint
    """Models with no batch-norm statistics (empty batch_stats) must
    save/restore cleanly — an empty dict used to be SAVED but omitted from
    the restore target, crashing every resume of such runs."""
    params = {"w": np.ones((2, 2), np.float32)}
    path = save_checkpoint(str(tmp_path), 5, params, batch_stats={},
                           config=Config({"model": {}}))
    tree, meta = load_checkpoint(path, target={"params": params})
    assert "batch_stats" not in tree
    np.testing.assert_array_equal(tree["params"]["w"], params["w"])


def test_find_latest_skips_uncommitted_checkpoints(tmp_path):
    import os

    from lcasr_tpu.training.checkpointing import (
        find_latest_checkpoint,
        save_checkpoint,
    )
    """meta.json is the commit marker: a crash mid-save leaves arrays
    without meta, and that directory must not be selected for resume."""
    params = {"w": np.zeros((1,), np.float32)}
    save_checkpoint(str(tmp_path), 10, params)
    # simulate a crashed save at a later step: arrays dir, no meta.json
    os.makedirs(tmp_path / "step_20" / "arrays", exist_ok=True)
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("step_10")


def test_avg_across_seed_repeat_folders(tmp_path):
    """avg_all_models_in_dir averages the SAME-step checkpoint across
    seed-repeat run folders (reference general.py:175-194), not every step
    of one run."""
    from lcasr_tpu.training.checkpointing import (
        avg_all_models_in_dir,
        save_checkpoint,
    )

    for seed, val in (("rp_1", 1.0), ("rp_2", 3.0)):
        save_checkpoint(str(tmp_path / seed), 100,
                        {"w": np.full((2,), val, np.float32)})
        # an EARLIER checkpoint in each run must not enter the average
        save_checkpoint(str(tmp_path / seed), 50,
                        {"w": np.full((2,), 100.0, np.float32)})
    avg = avg_all_models_in_dir(str(tmp_path), step_name="step_100")
    np.testing.assert_allclose(np.asarray(avg["w"]), [2.0, 2.0])


def test_resume_with_lazy_literal_target_leaves(tmp_path):
    """Regression (found by the on-chip ladder's kill→resume phase): flax
    init under remat (checkpoint_every_n_layers=1) leaves lazy literal
    leaves (jax TypedNdArray — e.g. BatchRenorm's scalar
    num_batches_tracked) in batch_stats; orbax's restore-target validation
    rejects them, crashing every resume of a remat model.  load_checkpoint
    must normalize such leaves to concrete arrays."""
    import jax
    import jax.numpy as jnp

    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.checkpointing import load_checkpoint, save_checkpoint

    cfg = Config({
        "model": {"d_model": 64, "n_layers": 1, "n_heads": 1, "head_dim": 64,
                  "subsampling_conv_channels": 16, "use_pallas": False,
                  "checkpoint_every_n_layers": 1},
    })
    model = load_model(cfg, 16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 256)),
                           length=jnp.array([256]))
    stats = variables["batch_stats"]
    leaf_types = {type(x).__name__ for x in jax.tree.leaves(stats)}
    # the precondition that makes this test bite on current jax — if init
    # stops producing lazy literals the test still passes (pure round trip)
    path = save_checkpoint(str(tmp_path), 1, variables["params"],
                           batch_stats=stats, config=cfg)
    tree, _ = load_checkpoint(
        path, target={"params": variables["params"], "batch_stats": stats})
    got = jax.tree.leaves(tree["batch_stats"])
    want = jax.tree.leaves(stats)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

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

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.data.augmentation import SpecAugment
from lcasr_tpu.data.dataloading import (
    SimpleDataset,
    chunk_spectogram,
    chunk_text_json,
    reset_seen_ids,
)


def test_chunk_spectogram_shapes():
    spec = np.zeros((1, 80, 1000))
    chunks = chunk_spectogram(spec, chunk_size=256, chunk_overlap=0)
    assert [c.shape[-1] for c in chunks] == [256, 256, 256, 232]
    chunks = chunk_spectogram(spec, chunk_size=256, chunk_overlap=128)
    assert all(c.shape[-1] <= 256 for c in chunks)
    assert len(chunks) == len(range(0, 1000, 128))


def test_chunk_text_json_assigns_words_by_time():
    words = []
    for i in range(20):
        t = i * 1.0
        words.append({"word": f"w{i}", "startTime": f"{t:.1f}s", "endTime": f"{t + 0.5:.1f}s"})
    # chunk 500 frames = 5 s
    splits = chunk_text_json(words, chunk_size=500, chunk_overlap=0, spectogram_length=2000)
    assert splits[0] == "w0 w1 w2 w3 w4"[: len(splits[0])] or splits[0].startswith("w0")
    joined = " ".join(splits).split()
    assert joined == [f"w{i}" for i in range(20)]


def test_seen_ids_reset_tags_epoch():
    out = reset_seen_ids(["a", "b", "epoch_0_c"], epoch=1)
    assert out == ["epoch_1_a", "epoch_1_b", "epoch_0_c"]


def test_simple_dataset_duration_sorted_groups(tmp_path):
    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(12):
        T = 100 + 50 * i
        spec = rng.normal(size=(1, 80, T)).astype(np.float32)
        np.save(tmp_path / f"r{i}.spec.npy", spec)
        with open(tmp_path / f"r{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": []}]}]}, f)
        pairs[f"r{i}"] = {
            "audio": str(tmp_path / f"r{i}.spec.npy"),
            "txt": str(tmp_path / f"r{i}.json"),
            "duration": T / 100,
        }
    ds = SimpleDataset(pairs, batch_size=3, subgroup_shuffle_size=4, random_seed=1)
    assert len(ds) == 12
    audio, words, rec_id = ds[0]
    assert audio.shape[1] == 80
    # seen_ids exclusion
    ds2 = SimpleDataset(pairs, batch_size=3, seen_ids=["r0", "r1"])
    assert len(ds2) == 10


def test_specaugment_masks_and_fill_value():
    aug = SpecAugment(n_time_masks=2, n_freq_masks=2, freq_mask_param=10, min_p=0.2,
                      zero_masking=True)
    spec = jnp.ones((2, 80, 200))
    out = np.asarray(aug(jax.random.PRNGKey(0), spec))
    assert out.shape == (2, 80, 200)
    assert (out == 0).any(), "time/freq masks should zero something"
    assert (out == 1).any(), "masking must not cover everything"
    # iid: the two batch elements get different masks
    assert not np.array_equal(out[0], out[1])


def test_specaugment_mean_fill():
    aug = SpecAugment(n_time_masks=1, n_freq_masks=0, freq_mask_param=0,
                      time_mask_param=50, zero_masking=False)
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(loc=5.0, size=(1, 80, 200)).astype(np.float32))
    out = np.asarray(aug(jax.random.PRNGKey(1), spec))
    masked = np.isclose(out, np.asarray(spec.mean()), atol=1e-5)
    assert masked.any()


def test_prefetch_iterator_abandonment_does_not_leak_worker(tmp_path):
    """Abandoning a prefetching iterator mid-epoch (what the trainer does
    when sequence warmup rebuilds the dataloader) must release the worker
    thread instead of leaving it pinned on a full queue holding batches."""
    import gc
    import threading
    import time as _time

    import numpy as np

    from lcasr_tpu.data.dataloading import SimpleDataloader
    from lcasr_tpu.data.tokenizer import load_tokenizer

    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(6):
        np.save(tmp_path / f"r{i}.spec.npy",
                rng.normal(size=(1, 80, 100)).astype(np.float32))
        (tmp_path / f"r{i}.json").write_text(
            '{"results": [{"alternatives": [{"words": '
            '[{"word": "a", "startTime": "0.1s", "endTime": "0.2s"}]}]}]}'
        )
        pairs[f"r{i}"] = {"audio": str(tmp_path / f"r{i}.spec.npy"),
                          "txt": str(tmp_path / f"r{i}.json"), "duration": 1.0}

    before = threading.active_count()
    dl = SimpleDataloader(pairs, load_tokenizer(), batch_size=1)
    it = iter(dl)
    next(it)          # worker running, queue full behind us
    it.close()        # abandon mid-epoch (GeneratorExit → finally → stop)
    del it
    gc.collect()
    for _ in range(50):  # worker notices stop within its 0.2 s put timeout
        if threading.active_count() <= before:
            break
        _time.sleep(0.1)
    assert threading.active_count() <= before


def test_variable_batch_loader_rejects_unknown_kwargs(tmp_path):
    import numpy as np
    import pytest

    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader
    from lcasr_tpu.data.tokenizer import load_tokenizer

    np.save(tmp_path / "r.spec.npy", np.zeros((1, 80, 50), np.float32))
    (tmp_path / "r.json").write_text(
        '{"results": [{"alternatives": [{"words": []}]}]}'
    )
    pairs = {"r": {"audio": str(tmp_path / "r.spec.npy"),
                   "txt": str(tmp_path / "r.json"), "duration": 0.5}}
    with pytest.raises(TypeError, match="unknown dataloader"):
        VariableBatchSimpleDataloader(pairs, load_tokenizer(), random_sed=7)
    # reference-API compat args are accepted (and ignored/forwarded)
    VariableBatchSimpleDataloader(pairs, load_tokenizer(), prefetch=False,
                                  num_workers=2, pin_memory=True)

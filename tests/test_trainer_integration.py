"""Trainer integration: sequence-warmup firing mid-training (THE core
long-context mechanism) and utterance-mode training."""
import json
import os

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(6):
        T = 700 + 50 * i
        spec = rng.normal(size=(1, 80, T)).astype(np.float32)
        np.save(tmp / f"r{i}.spec.npy", spec)
        words = []
        t = 0.2
        for w in (f"recording {i} words " * 6).split():
            words.append({"word": w, "startTime": f"{t:.2f}s", "endTime": f"{t + 0.3:.2f}s"})
            t += 0.35
        with open(tmp / f"r{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
        pairs[f"r{i}"] = {
            "audio": str(tmp / f"r{i}.spec.npy"),
            "txt": str(tmp / f"r{i}.json"),
            "duration": T / 100,
        }
    path = tmp / "pairs.json"
    with open(path, "w") as f:
        json.dump(pairs, f)
    return str(path), str(tmp)


def test_sequence_warmup_fires_and_rebuilds(corpus, tmp_path):
    import jax

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader, load_json
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.trainer import Trainer

    pairs_path, _ = corpus
    cfg = Config({
        "model_class": "SCConformerXL",
        "model": {"d_model": 64, "n_layers": 1, "n_heads": 2, "head_dim": 32,
                  "subsampling_conv_channels": 32, "use_pallas": False},
        "audio_chunking": {"size": 256, "overlap": 0},
        "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 1,
                     "clip_value": 0.8},
        "optimizer": {"name": "madgrad", "args": {"lr": 1e-4}},
        "scheduler": {"warmup_steps": 2, "final_value": 1e-6},
        "sequence_scheduler": {"increase_every": 2, "stop_after": 100,
                               "start_after": 0, "max_sequence_length": 512},
        "checkpointing": {"dir": str(tmp_path / "ckpt"), "save_every_n_steps": 1000},
    })
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size())
    trainer = Trainer(cfg, model, tokenizer)
    assert trainer.chunk_size == 256

    state = trainer.init_state(jax.random.PRNGKey(0))
    dataloader = VariableBatchSimpleDataloader(
        pairs=load_json(pairs_path), tokenizer=tokenizer,
        batch_size=trainer.batch_size, chunk_size=256, chunk_overlap=0,
    )
    state = trainer.train(state, dataloader)

    # warmup fired: chunk doubled to the max (512), batch halved to 1
    assert trainer.chunk_size == 512
    assert trainer.batch_size == 1
    # training logged steps at both sequence lengths
    lines = [json.loads(l) for l in open(
        os.path.join(trainer.checkpoint_dir, "metrics.jsonl")
    )]
    seqs = {l["sequence_length"] for l in lines if "sequence_length" in l}
    assert {256, 512} <= seqs
    # final checkpoint written
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint

    assert find_latest_checkpoint(trainer.checkpoint_dir) is not None

"""CLI + loss-eval smoke coverage: the meta-training entry point end to end
(config yaml -> utterance folder -> MetaTrainer) and the loss-based
evaluation probe (reference eval/rev16_loss / spotify_loss)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcasr_tpu.config import Config
from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.data.utterances import save_utterances


def _make_pairs(tmp_path, n=1):
    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(n):
        T = 2000
        spec = rng.normal(size=(1, 80, T)).astype(np.float32)
        np.save(tmp_path / f"rec{i}.spec.npy", spec)
        words = []
        t = 0.5
        for j in range(20):
            words.append({"word": f"word{j}", "startTime": f"{t:.2f}s",
                          "endTime": f"{t + 0.3:.2f}s"})
            t += 0.4 if (j + 1) % 10 else 2.5
        with open(tmp_path / f"rec{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
        pairs[f"rec{i}"] = {"audio": str(tmp_path / f"rec{i}.spec.npy"),
                            "txt": str(tmp_path / f"rec{i}.json"),
                            "duration": T / 100}
    return pairs


@pytest.mark.slow  # fast-tier budget: heavy system test, slow tier runs it
def test_train_meta_cli_end_to_end(tmp_path):
    """`cli/train_meta.main` runs the whole path: yaml config + overrides ->
    SCConformerMeta -> pretrained-encoder load -> UtteranceDataloader ->
    one MetaTrainer epoch with a checkpoint written (reference
    exp/train_utterance_meta_loss_pred.py:253-350)."""
    import yaml

    from lcasr_tpu.cli.train_meta import main
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training import checkpointing

    tok = load_tokenizer()
    pairs = _make_pairs(tmp_path)
    utt_dir = tmp_path / "utts"
    save_utterances(pairs, str(utt_dir), tok, chunk_size=1024)

    model_cfg = {"d_model": 64, "n_layers": 1, "n_heads": 2, "head_dim": 32,
                 "subsampling_conv_channels": 16, "use_pallas": False,
                 "meta_layers": 1}

    # a pretrained SCConformerXL checkpoint to warm-start the encoder
    enc_cfg = Config({"model_class": "SCConformerXL",
                      "model": {k: v for k, v in model_cfg.items()
                                if k != "meta_layers"}})
    enc = load_model(enc_cfg, tok.vocab_size())
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 256)))
    pre = checkpointing.save_checkpoint(
        str(tmp_path / "pre"), step=0, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), config=enc_cfg,
    )

    cfg = {
        "model_class": "SCConformerMeta",
        "model": dict(model_cfg, load_pretrained_from=pre),
        "data": {"utterance_folder": str(utt_dir)},
        "training": {"batch_size": 2, "max_epochs": 1, "random_seed": 0},
        "optimizer": {"name": "madgrad", "args": {"lr": 1e-4}},
        "checkpointing": {"dir": str(tmp_path / "ckpt"),
                          "save_every_n_steps": 10**9},
        "meta": {"objective": "l2"},
    }
    cfg_path = tmp_path / "meta.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    main(["-config", str(cfg_path)])

    metrics = tmp_path / "ckpt" / "metrics.jsonl"
    assert metrics.exists()
    lines = [json.loads(l) for l in open(metrics)]
    assert any(
        "meta_loss_1" in l
        and np.isfinite(l["meta_loss_1"])
        and np.isfinite(l["original_loss"])
        for l in lines
    )


def test_loss_eval_synthetic(tmp_path):
    """evaluate_loss scores a checkpoint by per-recording CTC NLL through
    the synthetic adapter (reference eval/rev16_loss/run.py:83-144)."""
    from lcasr_tpu.evaluation.loss_eval import evaluate_loss
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training import checkpointing

    tok = load_tokenizer()
    cfg = Config({"model_class": "SCConformerXL",
                  "model": {"d_model": 64, "n_layers": 1, "n_heads": 2,
                            "head_dim": 32, "subsampling_conv_channels": 16,
                            "use_pallas": False}})
    model = load_model(cfg, tok.vocab_size())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 256)))
    ckpt = checkpointing.save_checkpoint(
        str(tmp_path / "m"), step=0, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), config=cfg,
    )
    summary = evaluate_loss(
        ckpt, "synthetic", seq_len=512, overlap=448, verbose=False,
        dataset_kwargs={"n_recordings": 2, "n_frames": 1024},
    )
    assert summary["target"] == "gold"
    assert len(summary["rows"]) == 2
    # full-recording logits + full transcript: the lattice is FEASIBLE, so
    # the per-token NLL is finite even for recordings longer than seq_len
    # (reference final_loss = sum(losses)/sum(target_lengths))
    assert np.isfinite(summary["nll_per_token"]) and summary["nll_per_token"] > 0
    for row in summary["rows"]:
        assert np.isfinite(row["nll"]) and row["tokens"] > 0 and row["frames"] > 0

    # the rev16_loss variant: NLL of the model's own greedy transcript
    # (may be empty under random weights — rows can be skipped, summary finite)
    summary_h = evaluate_loss(
        ckpt, "synthetic", seq_len=512, overlap=448, target="hypothesis",
        verbose=False, dataset_kwargs={"n_recordings": 1, "n_frames": 1024},
    )
    assert np.isfinite(summary_h["nll_per_token"])

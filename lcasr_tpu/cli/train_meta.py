"""Meta-loss-prediction training CLI
(`python -m lcasr_tpu.cli.train_meta -config cfg.yaml`).

Counterpart of reference `exp/train_utterance_meta_loss_pred.py:253-350`:
utterance-level batches (presegmented with `save_utterances`), an
SCConformerMeta model — optionally initialized from a pretrained
SCConformerXL checkpoint (the reference's `load_pretrained_from` kwarg,
`sconformer_meta.py:242-249`) — and the gradient-prediction objective of
`lcasr_tpu.training.meta.MetaTrainer`.
"""
from __future__ import annotations

import argparse

import jax

from lcasr_tpu.config import Config
from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.data.utterances import UtteranceDataloader
from lcasr_tpu.models.base import print_total_params
from lcasr_tpu.models.registry import load_model
from lcasr_tpu.models.sconformer_meta import SCConformerMeta
from lcasr_tpu.training.meta import MetaTrainer


def main(args=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-config", "--config", type=str, required=True)
    parser.add_argument("-o", "--overrides", nargs="*", default=[])
    ns = parser.parse_args(args)

    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    config = Config.load(ns.config)
    if ns.overrides:
        config = config.apply_overrides(ns.overrides)

    tokenizer = load_tokenizer()
    model = load_model(config, tokenizer.vocab_size(), SCConformerMeta)

    trainer = MetaTrainer(
        config, model, tokenizer,
        checkpoint_dir=config.get("checkpointing", Config({})).get("dir", "./checkpoints"),
    )
    state = trainer.init_state(jax.random.PRNGKey(12345))

    pretrained = config.get("model", Config({})).get("load_pretrained_from", None)
    if pretrained:
        # encoder weights from an SCConformerXL checkpoint; shared submodule
        # names (subsampling/layers_*/decoder/rotary) line up 1:1
        from lcasr_tpu.training.checkpointing import load_checkpoint

        ckpt, _meta = load_checkpoint(pretrained)
        loaded = 0
        for top, sub in ckpt["params"].items():
            if top in state["params"]:
                state["params"][top] = sub
                loaded += 1
        for top, sub in ckpt.get("batch_stats", {}).items():
            if top in state["batch_stats"]:
                state["batch_stats"][top] = sub
        print(f"loaded {loaded} pretrained submodules from {pretrained}")

    print_total_params(state["params"])

    dataloader = UtteranceDataloader(
        config["data"]["utterance_folder"],
        batch_size=config.get("training", Config({})).get("batch_size", 8),
        shuffle=True,
        random_seed=config.get("training", Config({})).get("random_seed", 1234),
    )
    trainer.train_utterances(state, dataloader)


if __name__ == "__main__":
    main()

"""Training CLI: `python -m lcasr_tpu.cli.train -config cfg.yaml`.

Counterpart of reference `exp/train.py:354-475` (main): config → tokenizer →
model → optimizer/schedulers → checkpoint resume (seen_ids/step/epoch) →
duration-bucketed dataloader → train loop.
"""
from __future__ import annotations

import argparse
import random
import time

import jax

from lcasr_tpu.config import Config
from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader, load_json
from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.models.base import print_total_params
from lcasr_tpu.models.registry import get_model_class, load_model
from lcasr_tpu.training.trainer import Trainer


def main(args=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-config", "--config", type=str, required=True)
    parser.add_argument("-reset_step", "--reset_step", action="store_true")
    parser.add_argument(
        "-rm_sched", "--remove_scheduler", action="store_true",
        help="ignore the scheduler state in the checkpoint",
    )
    parser.add_argument(
        "-anomaly", "--anomaly", action="store_true",
        help="enable jax_debug_nans (the reference's -anomaly flag equivalent)",
    )
    parser.add_argument("-debug_hooks", "--debug_hooks", action="store_true",
                        help="log per-parameter gradient statistics")
    parser.add_argument(
        "-coordinator", "--coordinator_address", default=None,
        help="multi-host: coordinator host:port (or set JAX_COORDINATOR_ADDRESS); "
             "run one process per host with --num_processes/--process_id",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("-o", "--overrides", nargs="*", default=[])
    ns = parser.parse_args(args)
    if ns.anomaly:
        jax.config.update("jax_debug_nans", True)

    from lcasr_tpu.parallel.mesh import maybe_init_distributed

    if maybe_init_distributed(ns.coordinator_address, ns.num_processes, ns.process_id):
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.devices())} global devices"
        )

    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    config = Config.load(ns.config)
    if ns.overrides:
        config = config.apply_overrides(ns.overrides)

    tokenizer = load_tokenizer()
    model = load_model(config, tokenizer.vocab_size(), get_model_class(config))

    trainer = Trainer(config, model, tokenizer)
    trainer.debug_hooks = ns.debug_hooks
    if trainer.mesh is not None:
        print(f"mesh: {dict(trainer.mesh.shape)} over {trainer.mesh.size} devices")
    state = trainer.init_state(jax.random.PRNGKey(12345))
    print_total_params(state["params"])

    sched_backup = trainer.scheduler.state_dict()
    state, step, epoch, seen_ids = trainer.resume(state)
    if ns.remove_scheduler:
        trainer.scheduler.load_state_dict(sched_backup)
    if ns.reset_step:
        step, epoch, seen_ids = 0, 0, []
    print(f"Starting from podcast: {len(seen_ids)}")

    random_seed = config.get("training", Config({})).get("random_seed", 1234)
    if random_seed == "random":
        random_seed = int(time.time()) % 10000
        print(f"random seed: {random_seed}")
    random.seed(random_seed)

    # presegmented-utterance training (reference exp/train_files/train_sa.py
    # / train_mamba.py): data.utterances_dir points at save_utterances output
    utt_dir = config.get("data", Config({})).get("utterances_dir", None)
    if utt_dir:
        from lcasr_tpu.data.utterances import UtteranceDataloader

        dataloader = UtteranceDataloader(
            utt_dir, batch_size=trainer.batch_size, random_seed=random_seed
        )
        trainer.train_utterances(
            state, dataloader, epochs=trainer.max_epochs
        )
        return

    paired_data = load_json(config["data"]["path"])
    dataloader = VariableBatchSimpleDataloader(
        pairs=paired_data,
        tokenizer=tokenizer,
        batch_size=trainer.batch_size,
        chunk_size=config["audio_chunking"]["size"],
        chunk_overlap=config["audio_chunking"].get("overlap", 0),
        seen_ids=seen_ids,
        random_seed=random_seed,
    )
    if dataloader.batch_size != trainer.batch_size:
        dataloader.update(batch_size=trainer.batch_size, seen_ids=seen_ids)

    trainer.train(state, dataloader, step=step, epoch=epoch, seen_ids=seen_ids)


if __name__ == "__main__":
    main()

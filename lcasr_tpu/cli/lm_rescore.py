"""LM rescoring pipeline: dump moving-window logits, then beam-search them.

Counterparts of reference `eval/tedlium/create_logits.py` (pickle per-
recording logits) and `eval/tedlium/tlm_beam.py` (ray-parallel beam search
with a transformer LM over the pickled logits, α/β grid sweeps via shell
scripts).  Here: `.npz` logit dumps + a sequential/threaded beam stage (the
TPU does the heavy AM pass; beam search is CPU-light).

Usage:
  python -m lcasr_tpu.cli.lm_rescore create_logits -c ckpt -d tedlium \
      --dataset_base_path ... -o logits_dir
  python -m lcasr_tpu.cli.lm_rescore beam -i logits_dir -alpha 0.45 -beta 1.53
  # α/β grid sweep (the reference's scripts/*.sh loops), one command:
  python -m lcasr_tpu.cli.lm_rescore beam -i logits_dir \
      -alpha 0.3,0.45,0.6 -beta 0.5,1.53 -decoder frame_sync -lm lm_ckpt
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np


def create_logits(
    checkpoint: str,
    dataset: str,
    split: str,
    out_dir: str,
    seq_len: int = 16384,
    overlap: int = -1,
    dataset_kwargs: Optional[dict] = None,
):
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.datasets import get_dataset_fn
    from lcasr_tpu.evaluation.normalizer import normalize
    from lcasr_tpu.evaluation.run import load_any_checkpoint
    from lcasr_tpu.evaluation.streaming import StreamingDecoder
    from lcasr_tpu.models.registry import get_model_class, load_model

    os.makedirs(out_dir, exist_ok=True)
    cfg, variables = load_any_checkpoint(checkpoint)
    tokenizer = load_tokenizer()
    n_classes = tokenizer.vocab_size() + 1
    if overlap == -1:
        overlap = int(seq_len * 0.875)
    model = load_model(cfg, tokenizer.vocab_size(), get_model_class(cfg))
    streamer = StreamingDecoder(model, variables, n_classes)

    for item in get_dataset_fn(dataset)(split, **(dataset_kwargs or {})):
        spec, gold = item["process_fn"](item)
        logits = streamer.logits(np.asarray(spec), seq_len=seq_len, overlap=overlap)
        np.savez_compressed(
            os.path.join(out_dir, f"{item['id']}.npz"),
            logits=logits.astype(np.float16),
            gold=normalize(gold).lower(),
        )
        print(f"saved {item['id']}: {logits.shape}")


def load_lm_checkpoint(path: str):
    """Load a trained `models/lm.py:TransformerLM` orbax checkpoint (saved
    with the standard embedded-config contract) → (model, variables)."""
    from lcasr_tpu.config import Config
    from lcasr_tpu.models.lm import TransformerLM
    from lcasr_tpu.training.checkpointing import load_checkpoint

    tree, meta = load_checkpoint(path)
    lm_cfg = Config.from_dict(meta["config"]).get("model", Config({})).to_dict()
    lm_cfg.pop("model_class", None)
    model = TransformerLM(**lm_cfg)
    return model, {"params": tree["params"]}


def beam_stage(
    logits_dir: str,
    alpha: float = 0.45,
    beta: float = 1.53,
    beam_width: int = 25,
    lm: Optional[str] = None,
    results_csv: Optional[str] = None,
    decoder: str = "prefix",
    bos_id: int = 2,
    parallel_recordings: int = 1,
    device_search: bool = False,
):
    """decoder='prefix': prefix beam search (pyctcdecode-style AM merge);
    decoder='frame_sync': the reference tlm_beam algorithm (per-beam KV
    caches, one batched LM call per frame, `ctc_beam_search.py:93-322`).
    `device_search=True` (frame_sync only) runs each recording's ENTIRE
    search as one jitted lax.scan on device (`decoding/frame_sync_device`)
    — zero per-frame host round trips; see that module's docstring for the
    (tiny) divergences from the host path.

    `parallel_recordings=N > 1` (frame_sync only) rescored N recordings
    concurrently off one wide device LM — every device call serves all
    blocked searches (`decoding/frame_sync.py:rescore_many`), the
    TPU-native replacement for the reference's ray fan-out
    (`eval/tedlium/tlm_beam.py:55-61`).  Results are identical per
    recording; throughput scales ~N× on a dispatch-latency-bound link."""
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.decoding.beam_search import BeamSearch
    from lcasr_tpu.evaluation.normalizer import normalize
    from lcasr_tpu.evaluation.wer import word_error_rate_detail

    tokenizer = load_tokenizer()
    lm_model = lm_variables = None
    lm_scores = None
    if lm is not None:
        from lcasr_tpu.models.lm import make_lm_scorer

        lm_model, lm_variables = load_lm_checkpoint(lm)
        lm_scores = make_lm_scorer(lm_model, lm_variables, bos_id=bos_id)

    names, all_logits, golds = [], [], []
    for name in sorted(os.listdir(logits_dir)):
        if not name.endswith(".npz"):
            continue
        data = np.load(os.path.join(logits_dir, name), allow_pickle=True)
        names.append(name)
        all_logits.append(data["logits"].astype(np.float32))
        golds.append(str(data["gold"]))

    if decoder == "frame_sync":
        if lm_model is None:
            raise ValueError("frame_sync decoding needs -lm <checkpoint>")
        from lcasr_tpu.decoding.frame_sync import CachedTransformerLM, rescore_many

        # serial decoding is just n_slots=1 (rescore_many with one slot IS
        # run_search per recording); either way ONE fixed-shape LM at the
        # global max length serves every recording — no per-length recompile
        n_slots = min(max(1, parallel_recordings), max(1, len(all_logits)))
        max_len = max((lg.shape[0] for lg in all_logits), default=1) + 1
        if device_search:
            from lcasr_tpu.decoding.frame_sync_device import rescore_device

            texts = rescore_device(
                lm_model, lm_variables, all_logits, tokenizer=tokenizer,
                decode=True, beam_width=beam_width, alpha=alpha, beta=beta,
                blank_id=tokenizer.vocab_size(), bos_id=bos_id,
                # one recording per scan: batched device searches pay the
                # union of emit ticks × N-wide cache gathers with no
                # round-trip savings to show for it (rescore_device doc)
                max_tokens=max_len, batch_recordings=1,
            )
        else:
            wide_lm = CachedTransformerLM(
                lm_model, lm_variables, width=n_slots * beam_width,
                max_len=max_len, bos_id=bos_id,
            )
            texts = rescore_many(
                wide_lm, all_logits, n_slots, tokenizer=tokenizer, decode=True,
                beam_width=beam_width, alpha=alpha, beta=beta,
                blank_id=tokenizer.vocab_size(), bos_id=bos_id,
            )
    else:
        bs = BeamSearch(
            tokenizer=tokenizer,
            beam_width=beam_width,
            blank_id=tokenizer.vocab_size(),
            alpha=alpha,
            beta=beta,
            lm_scores=lm_scores,
            pad_id=tokenizer.pad_id(),  # id 0 is never proposed (lcasr)
        )
        texts = [bs.run_search(lg) for lg in all_logits]

    hyps, refs, rows = [], [], []
    for name, text, gold in zip(names, texts, golds):
        hyp = normalize(text).lower()
        wer, words, *_ = word_error_rate_detail([hyp], [gold])
        rows.append({"recording": name[:-4], "wer": wer, "words": words,
                     "alpha": alpha, "beta": beta, "beam_width": beam_width})
        hyps.append(hyp)
        refs.append(gold)
        print(f"{name[:-4]}: WER {wer:.4f}")
    wer, words, *_ = word_error_rate_detail(hyps, refs)
    print(json.dumps({"wer": wer, "words": words, "alpha": alpha, "beta": beta}))
    if results_csv:
        import pandas as pd

        pd.DataFrame(rows).to_csv(
            results_csv, mode="a", header=not os.path.exists(results_csv), index=False
        )
    return wer


def main():
    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create_logits")
    c.add_argument("-c", "--checkpoint", required=True)
    c.add_argument("-d", "--dataset", required=True)
    c.add_argument("-split", "--split", default="test")
    c.add_argument("-o", "--out_dir", required=True)
    c.add_argument("-seq", "--seq_len", type=int, default=16384)
    c.add_argument("--dataset_base_path", default=None)
    b = sub.add_parser("beam")
    b.add_argument("-i", "--logits_dir", required=True)
    b.add_argument("-alpha", default="0.45",
                   help="LM weight; comma-separated list sweeps a grid")
    b.add_argument("-beta", default="1.53",
                   help="token insertion bonus; comma-separated list sweeps")
    b.add_argument("-beam_width", type=int, default=25)
    b.add_argument("-lm", "--lm", default=None,
                   help="trained TransformerLM orbax checkpoint")
    b.add_argument("-decoder", "--decoder", default="prefix",
                   choices=["prefix", "frame_sync"])
    b.add_argument("-parallel", "--parallel_recordings", type=int, default=1,
                   help="frame_sync only: rescore N recordings concurrently "
                        "off one wide device LM (≈N× throughput)")
    b.add_argument("-device", "--device_search", action="store_true",
                   help="frame_sync only: run each search as one on-device "
                        "lax.scan (zero per-frame host round trips)")
    b.add_argument("-results", "--results_csv", default=None)
    args = parser.parse_args()
    if args.cmd == "create_logits":
        create_logits(
            args.checkpoint, args.dataset, args.split, args.out_dir,
            seq_len=args.seq_len,
            dataset_kwargs={"base_path": args.dataset_base_path}
            if args.dataset_base_path else {},
        )
    else:
        alphas = [float(a) for a in str(args.alpha).split(",")]
        betas = [float(b_) for b_ in str(args.beta).split(",")]
        grid = [(a, b_) for a in alphas for b_ in betas]
        best = None
        for a, b_ in grid:
            wer = beam_stage(args.logits_dir, a, b_, args.beam_width,
                             lm=args.lm, results_csv=args.results_csv,
                             decoder=args.decoder,
                             parallel_recordings=args.parallel_recordings,
                             device_search=args.device_search)
            if best is None or wer < best[0]:
                best = (wer, a, b_)
        if len(grid) > 1:
            print(json.dumps({"best_wer": best[0], "alpha": best[1],
                              "beta": best[2], "grid_points": len(grid)}))


if __name__ == "__main__":
    main()

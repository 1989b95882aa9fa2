"""Unified eval CLI: checkpoint → model → streaming decode → WER rows.

Counterpart of reference `eval/run.py:30-148`:
  * the model is rebuilt purely from the checkpoint-embedded config,
  * `evaluation_mode` selects averaged_moving_window | windowed_attention
    (model built with attention_window_size = (seq_len/subsampling)/2 and
    seq_len raised to cover the recording in ONE forward) | buffered,
  * per-recording greedy decode + Whisper-normalized WER, then aggregate.

Accepts both this framework's orbax checkpoints and reference `.pt`
checkpoints (converted on the fly via `import_torch`).
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Any, Dict, List, Optional

import numpy as np

from lcasr_tpu.config import Config
from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.decoding.greedy import GreedyCTCDecoder
from lcasr_tpu.evaluation.datasets import get_dataset_fn
from lcasr_tpu.evaluation.normalizer import normalize
from lcasr_tpu.evaluation.streaming import (
    StreamingDecoder,
    fetch_logits,
    fetch_logits_buffered,
    make_windowed_model_fn,
)
from lcasr_tpu.evaluation.wer import word_error_rate_detail
from lcasr_tpu.models.registry import get_model_class, load_model

MAX_WINDOWED_SECONDS = 36000  # 10 h cap in windowed-attention mode (ref :41)


def load_any_checkpoint(path: str):
    """Returns (config: Config, variables dict)."""
    if path.endswith(".pt"):
        from lcasr_tpu.models.import_torch import load_torch_checkpoint, variables_from_torch

        cfg_dict, sd = load_torch_checkpoint(path)
        cfg = Config.from_dict(dict(cfg_dict))
        variables = variables_from_torch(sd, cfg.get("model", Config({})).to_dict())
        return cfg, variables
    from lcasr_tpu.training.checkpointing import load_checkpoint

    tree, meta = load_checkpoint(path)
    cfg = Config.from_dict(meta["config"])
    variables = {"params": tree["params"]}
    if "batch_stats" in tree:
        variables["batch_stats"] = tree["batch_stats"]
    return cfg, variables


def evaluate(
    checkpoint: str,
    dataset: str,
    split: str = "test",
    seq_len: int = 16384,
    overlap: int = -1,
    overlap_ratio: float = 0.875,
    evaluation_mode: str = "averaged_moving_window",
    dataset_kwargs: Optional[Dict[str, Any]] = None,
    verbose: bool = True,
    skip_recordings: Optional[set] = None,
    transfer_dtype: Optional[str] = None,  # 'bfloat16' (default) | 'int8' | 'int4' | 'float32'
    pipeline_upload: bool = False,  # stripe uploads to overlap with compute
    data_parallel: bool = False,  # shard decode windows over all devices
    context_parallel: bool = False,  # windowed_attention: shard the time axis
    # W8A8 int8 MXU projections (ops/qdense.py): False | True (all sites) |
    # 'auto' (measured winners: FF + decoder) | comma-joined site names
    quant_w8a8: Any = False,
) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    cfg, variables = load_any_checkpoint(checkpoint)
    tokenizer = load_tokenizer()
    n_classes = tokenizer.vocab_size() + 1

    if overlap == -1:
        overlap = int(seq_len * overlap_ratio)

    model_cfg = cfg.get("model", Config({})).to_dict()
    subsampling_factor = model_cfg.get("subsampling_factor", 8)

    requested_seq_len, requested_overlap = seq_len, overlap
    if evaluation_mode == "windowed_attention":
        # local attention window = downsampled seq_len / 2; single forward
        # covering the recording (reference eval/run.py:38-43)
        model_cfg["attention_window_size"] = (seq_len // subsampling_factor) // 2
        seq_len = MAX_WINDOWED_SECONDS * 100
        overlap = 0
    elif evaluation_mode not in ("buffered", "averaged_moving_window"):
        raise ValueError(f"unknown evaluation_mode {evaluation_mode!r}")
    if evaluation_mode != "averaged_moving_window" and (
        transfer_dtype or pipeline_upload or data_parallel
    ):
        import warnings

        warnings.warn(
            "transfer_dtype/pipeline_upload/data_parallel only apply to "
            "averaged_moving_window decode and are ignored in "
            f"{evaluation_mode!r}", stacklevel=2,
        )

    if quant_w8a8:
        # any checkpoint serves W8A8 — param trees are unchanged, the flag
        # only reroutes the projection GEMMs through int8 (ops/qdense.py)
        if isinstance(quant_w8a8, str) and "," in quant_w8a8:
            quant_w8a8 = tuple(t for t in quant_w8a8.split(",") if t)
        if quant_w8a8 == "all":
            quant_w8a8 = True
        model_cfg["quant_w8a8"] = quant_w8a8

    cfg_model = Config({"model": model_cfg})
    model = load_model(cfg_model, tokenizer.vocab_size(), get_model_class(cfg))
    if quant_w8a8 and not getattr(model, "quant_w8a8", False):
        import warnings

        warnings.warn(
            f"{type(model).__name__} has no quant_w8a8 path — serving "
            "unquantized", stacklevel=2,
        )
    cp_model_fn = None
    if evaluation_mode == "buffered":
        model_fn = make_windowed_model_fn(model, variables)
    elif (evaluation_mode == "windowed_attention" and context_parallel
          and len(jax.devices()) > 1):
        # single-pass forward sharded over the seq axis — the multi-chip
        # route when the full-recording forward exceeds one chip's HBM
        from lcasr_tpu.evaluation.streaming import make_cp_windowed_model_fn
        from lcasr_tpu.parallel.mesh import make_mesh

        cp_mesh = make_mesh({"seq": len(jax.devices())})
        cp_model_fn = make_cp_windowed_model_fn(model, variables, cp_mesh)
    else:
        mesh = None
        if data_parallel and len(jax.devices()) > 1:
            from lcasr_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()  # all devices on the data axis
        streamer = StreamingDecoder(
            model, variables, n_classes, subsampling_factor=subsampling_factor,
            transfer_dtype=transfer_dtype, pipeline_upload=pipeline_upload,
            mesh=mesh,
        )

    decoder = GreedyCTCDecoder(tokenizer, blank_id=n_classes - 1)
    data = get_dataset_fn(dataset)(split, **(dataset_kwargs or {}))

    rows: List[Dict[str, Any]] = []
    hyps, refs = [], []
    total_audio_s, total_wall = 0.0, 0.0
    for item in data:
        if skip_recordings and str(item["id"]) in skip_recordings:
            # crash-resume (eval_manager): already in the results CSV
            continue
        spec, gold = item["process_fn"](item)
        spec = np.asarray(spec)
        t0 = time.perf_counter()
        if evaluation_mode == "buffered":
            logits = fetch_logits_buffered(
                model_fn,
                spec,
                seq_len=seq_len,
                overlap=overlap,
                n_classes=n_classes,
                subsampling_factor=subsampling_factor,
            )
        elif cp_model_fn is not None:
            logits = fetch_logits(
                cp_model_fn,
                spec,
                seq_len=seq_len,
                overlap=0,
                n_classes=n_classes,
                subsampling_factor=subsampling_factor,
                window_batch_size=1,
            )
        else:
            logits = streamer.logits(spec, seq_len=seq_len, overlap=overlap)
        wall = time.perf_counter() - t0
        hyp = normalize(decoder(logits)).lower()
        ref = normalize(gold).lower()
        wer, words, ins_r, del_r, sub_r = word_error_rate_detail([hyp], [ref])
        n_err = len(hyp.split()) if words == 0 else round(wer * words)
        audio_s = spec.shape[-1] / 100.0
        total_audio_s += audio_s
        total_wall += wall
        rows.append(
            {
                "recording": item["id"],
                "wer": wer,
                "words": words,
                "ins_rate": ins_r,
                "del_rate": del_r,
                "sub_rate": sub_r,
                "errors": n_err,
                "audio_seconds": audio_s,
                "wall_seconds": wall,
            }
        )
        hyps.append(hyp)
        refs.append(ref)
        if verbose:
            print(f"{item['id']}: WER {wer:.4f} ({words} words, {audio_s:.0f}s audio)")

    # aggregate from the per-recording RAW counts instead of re-running
    # every O(n·m) alignment over the full corpus (the batch call repeated
    # the dominant CPU cost; empty-reference rows contribute their
    # hypothesis words as insertions, the batch-call convention)
    words = sum(r["words"] for r in rows)
    if words:
        wer = sum(r["errors"] for r in rows) / words
        ins_r = sum(
            (r["ins_rate"] * r["words"]) if r["words"] else r["errors"]
            for r in rows
        ) / words
        del_r = sum((r["del_rate"] * r["words"]) if r["words"] else 0 for r in rows) / words
        sub_r = sum((r["sub_rate"] * r["words"]) if r["words"] else 0 for r in rows) / words
    else:
        wer = ins_r = del_r = sub_r = float("inf")
    summary = {
        "dataset": dataset,
        "split": split,
        # report the REQUESTED window (windowed_attention mutates the
        # internals; a sweep over seq_len must stay distinguishable)
        "seq_len": requested_seq_len,
        "overlap": requested_overlap,
        "evaluation_mode": evaluation_mode,
        "wer": wer,
        "words": words,
        "ins_rate": ins_r,
        "del_rate": del_r,
        "sub_rate": sub_r,
        "rtfx": total_audio_s / total_wall if total_wall > 0 else None,
        "rows": rows,
    }
    if verbose:
        print(json.dumps({k: v for k, v in summary.items() if k != "rows"}, indent=2))
    return summary


def main():
    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-d", "--dataset", required=True)
    parser.add_argument("-split", "--split", default="test")
    parser.add_argument("-seq", "--seq_len", type=int, default=16384)
    parser.add_argument("-overlap", "--overlap", type=int, default=-1)
    parser.add_argument(
        "-mode",
        "--evaluation_mode",
        default="averaged_moving_window",
        choices=["averaged_moving_window", "windowed_attention", "buffered"],
    )
    parser.add_argument(
        "--transfer_dtype", default=None, choices=["bfloat16", "int8", "int4", "float32"],
        help="spectrogram upload dtype (int8 halves link traffic on "
             "remote-attached chips, int4 halves it again; dequantized "
             "once on device)",
    )
    parser.add_argument(
        "--pipeline_upload", action="store_true",
        help="stripe the spectrogram upload and overlap it with compute "
             "(wins on direct-attached hosts; see StreamingDecoder)",
    )
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard decode windows over all devices (mesh data axis); "
             "near-linear RTFx in the device count",
    )
    parser.add_argument(
        "--context_parallel", action="store_true",
        help="windowed_attention mode: shard the single-pass forward's time "
             "axis over all devices (for recordings exceeding one chip's HBM)",
    )
    parser.add_argument(
        "--w8a8", nargs="?", const="auto", default=False,
        help="serve GEMMs int8 on the MXU (W8A8 with dynamic per-token "
             "activation scales, ops/qdense.py).  NOTE: measured a slight "
             "net LOSS at the flagship shapes on v5e (RESULTS_w8a8.json) — "
             "an opt-in for larger models/parts where int8 pays.  Optional "
             "policy value: 'auto' (default — the least-bad site subset: "
             "FF + decoder), 'all', or comma-joined site names from "
             "qdense.ALL_SITES (e.g. 'ff,decoder,conv')",
    )
    parser.add_argument("--dataset_base_path", default=None)
    parser.add_argument(
        "--dataset_kwargs", nargs="*", default=[],
        help="extra adapter kwargs as key=value (e.g. pairs_path=... snr_db=5)",
    )
    args = parser.parse_args()
    import yaml

    dk = {k: yaml.safe_load(v) for k, _, v in
          (kv.partition("=") for kv in args.dataset_kwargs)}
    if args.dataset_base_path:
        dk["base_path"] = args.dataset_base_path
    evaluate(
        checkpoint=args.checkpoint,
        dataset=args.dataset,
        split=args.split,
        seq_len=args.seq_len,
        overlap=args.overlap,
        evaluation_mode=args.evaluation_mode,
        dataset_kwargs=dk,
        transfer_dtype=args.transfer_dtype,
        pipeline_upload=args.pipeline_upload,
        data_parallel=args.data_parallel,
        context_parallel=args.context_parallel,
        quant_w8a8=args.w8a8,
    )


if __name__ == "__main__":
    main()

"""YAML-driven eval sweep: models × datasets × splits → CSV rows.

Counterpart of reference `eval/eval_manager.py:74-105`:
  * overlap resolved as seq_len × overlap_ratio (`:30`),
  * configurations already present in the results CSV are skipped (`:58-72`)
    — the CSV doubles as the golden-results database,
  * rows keyed by (dataset, split, recording, model, seq_len, overlap_ratio).
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List

from lcasr_tpu.config import Config


def _row_key(row: Dict[str, Any]) -> tuple:
    return (
        str(row["dataset"]),
        str(row["split"]),
        str(row["recording"]),
        str(row["model"]),
        int(row["seq_len"]),
        float(row["overlap_ratio"]),
    )


def load_existing(results_csv: str):
    """Returns (key set, per-row records) from the results CSV."""
    if not os.path.exists(results_csv):
        return set(), []
    import pandas as pd

    df = pd.read_csv(results_csv)
    records = df.to_dict("records")
    return {_row_key(row) for row in records}, records


def run_sweep(config_path: str, results_csv: str | None = None) -> List[Dict[str, Any]]:
    from lcasr_tpu.evaluation.run import evaluate

    cfg = Config.load(config_path)
    results_csv = results_csv or cfg.get("results_csv", "eval_results.csv")
    existing, existing_rows = load_existing(results_csv)

    overlap_ratio = cfg.get("overlap_ratio", 0.875)
    mode = cfg.get("evaluation_mode", "averaged_moving_window")
    dataset_kwargs = cfg.get("dataset_kwargs", Config({})).to_dict()
    decode_opts = {
        k: cfg.get(k)
        for k in ("transfer_dtype", "pipeline_upload", "data_parallel",
                  "context_parallel")
        if cfg.get(k) is not None
    }

    all_rows: List[Dict[str, Any]] = []
    for model_entry in cfg.get("models", []):
        name = model_entry["name"]
        ckpt = model_entry["checkpoint"]
        seq_lens = model_entry.get("seq_lens", cfg.get("seq_lens", [16384]))
        for dataset_entry in cfg.get("datasets", []):
            dataset = dataset_entry["name"]
            splits = dataset_entry.get("splits", ["test"])
            for split in splits:
                for seq_len in seq_lens:
                    probe = {
                        "dataset": dataset,
                        "split": split,
                        "recording": "__aggregate__",
                        "model": name,
                        "seq_len": seq_len,
                        "overlap_ratio": overlap_ratio,
                    }
                    if _row_key(probe) in existing:
                        print(f"skip (already evaluated): {probe}")
                        continue
                    # crash-resume: per-recording rows already in the CSV for
                    # this configuration are neither re-decoded nor
                    # re-appended; the aggregate is re-derived from
                    # old + new rows (WER = Σ wer_i·words_i / Σ words_i,
                    # exact because per-row wer = distance_i / words_i)
                    cfg_key = _row_key(probe)[:2] + _row_key(probe)[3:]
                    prior = [
                        r for r in existing_rows
                        if _row_key(r)[:2] + _row_key(r)[3:] == cfg_key
                        and str(r["recording"]) != "__aggregate__"
                    ]
                    done_ids = {str(r["recording"]) for r in prior}
                    if done_ids:
                        print(f"resume: {len(done_ids)} recordings already done")
                    summary = evaluate(
                        checkpoint=ckpt,
                        dataset=dataset,
                        split=split,
                        seq_len=seq_len,
                        overlap=int(seq_len * overlap_ratio),
                        evaluation_mode=mode,
                        dataset_kwargs=dataset_kwargs.get(dataset, {}),
                        skip_recordings=done_ids,
                        **decode_opts,
                    )
                    rows = [
                        {
                            **probe,
                            "recording": r["recording"],
                            "wer": r["wer"],
                            "words": r["words"],
                        }
                        for r in summary["rows"]
                    ]
                    combined = prior + rows
                    total_words = sum(float(r["words"]) for r in combined)
                    # wer*words recovers the per-recording ERROR COUNT; a
                    # recording whose normalized reference is empty has
                    # wer=inf, words=0, and inf*0 = nan would poison the
                    # whole aggregate (and the golden CSV).  Its error count
                    # is unrecoverable from (wer, words) rows, so the row is
                    # excluded from the aggregate instead
                    agg_wer = (
                        sum(
                            float(r["wer"]) * float(r["words"])
                            for r in combined
                            if float(r["words"]) > 0
                        )
                        / max(total_words, 1.0)
                    )
                    rows.append({**probe, "wer": agg_wer, "words": total_words})
                    all_rows.extend(rows)
                    _append_csv(results_csv, rows)
    return all_rows


def _append_csv(path: str, rows: List[Dict[str, Any]]):
    import pandas as pd

    df = pd.DataFrame(rows)
    if os.path.exists(path):
        # align to the file's existing column order — appending in dict
        # order would silently write values under the wrong headers on
        # resume (e.g. recording ids into the model column)
        cols = list(pd.read_csv(path, nrows=0).columns)
        cols += [c for c in df.columns if c not in cols]
        df = df.reindex(columns=cols)
        df.to_csv(path, mode="a", header=False, index=False)
    else:
        df.to_csv(path, index=False)


def main():
    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-config", "--config", required=True)
    parser.add_argument("-results", "--results_csv", default=None)
    args = parser.parse_args()
    run_sweep(args.config, args.results_csv)


if __name__ == "__main__":
    main()

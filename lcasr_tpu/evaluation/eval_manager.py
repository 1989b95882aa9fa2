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


def load_existing(results_csv: str) -> set:
    if not os.path.exists(results_csv):
        return set()
    import pandas as pd

    df = pd.read_csv(results_csv)
    return {_row_key(row) for _, row in df.iterrows()}


def run_sweep(config_path: str, results_csv: str | None = None) -> List[Dict[str, Any]]:
    from lcasr_tpu.evaluation.run import evaluate

    cfg = Config.load(config_path)
    results_csv = results_csv or cfg.get("results_csv", "eval_results.csv")
    existing = load_existing(results_csv)

    overlap_ratio = cfg.get("overlap_ratio", 0.875)
    mode = cfg.get("evaluation_mode", "averaged_moving_window")
    dataset_kwargs = cfg.get("dataset_kwargs", Config({})).to_dict()

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
                    summary = evaluate(
                        checkpoint=ckpt,
                        dataset=dataset,
                        split=split,
                        seq_len=seq_len,
                        overlap=int(seq_len * overlap_ratio),
                        evaluation_mode=mode,
                        dataset_kwargs=dataset_kwargs.get(dataset, {}),
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
                    rows.append({**probe, "wer": summary["wer"], "words": summary["words"]})
                    all_rows.extend(rows)
                    _append_csv(results_csv, rows)
    return all_rows


def _append_csv(path: str, rows: List[Dict[str, Any]]):
    import pandas as pd

    df = pd.DataFrame(rows)
    header = not os.path.exists(path)
    df.to_csv(path, mode="a", header=header, index=False)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-config", "--config", required=True)
    parser.add_argument("-results", "--results_csv", default=None)
    args = parser.parse_args()
    run_sweep(args.config, args.results_csv)


if __name__ == "__main__":
    main()

"""Compare eval-sweep results against the reference's published WERs.

The reference's golden database is its results CSVs
(`eval/results/IS_paper/evals_rb.csv`; `eval_manager.py:58-72` skips rows
already present).  Here the published README WER table lives in
`configs/model_zoo.yaml` (`expected_wer_<dataset>` per model, at the three
paper context lengths), and this tool joins an `eval_manager` results CSV
against it:

    python -m lcasr_tpu.evaluation.compare results.csv
    python -m lcasr_tpu.evaluation.compare results.csv --tolerance 0.005

Exit status 1 if any matched row exceeds tolerance — usable as a CI parity
gate once real-corpus checkpoints/datasets are mounted.

HONESTY NOTE: published-WER parity is UNVALIDATED at zero egress — no run
in this repo's build environment has decoded a real speech corpus with a
real trained checkpoint, so the zoo's `expected_wer_*` rows are targets,
not reproduced results.  The validated proxy stack (converted-checkpoint
logit parity, cross-framework training-trajectory parity, synthetic
closed-loop WER-0 on chip/mesh) is documented in configs/model_zoo.yaml.
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List, Optional

import yaml

# the paper's three eval context lengths: 10 s / 2.7 min / 20 min
# (SURVEY §6: WERs quoted at 1024 / 16384 / 120000 mel frames)
CONTEXT_SEQ_LENS = (1024, 16384, 120000)

from lcasr_tpu.utils.resources import find_repo_file

DEFAULT_ZOO = find_repo_file(os.path.join("configs", "model_zoo.yaml"))


def load_expected(zoo_path: Optional[str] = None) -> Dict[tuple, float]:
    """(model, dataset, seq_len) → published WER (fractional, e.g. 0.068)."""
    with open(zoo_path or DEFAULT_ZOO) as f:
        zoo = yaml.safe_load(f)["zoo"]
    expected = {}
    for model, entry in zoo.items():
        for key, values in entry.items():
            if not key.startswith("expected_wer_"):
                continue
            dataset = key[len("expected_wer_"):]
            for seq_len, wer_pct in zip(CONTEXT_SEQ_LENS, values):
                expected[(model, dataset, seq_len)] = wer_pct / 100.0
    return expected


def compare(
    results_csv: str,
    zoo_path: Optional[str] = None,
    tolerance: float = 0.005,
    split: str = "test",
) -> List[Dict[str, Any]]:
    """Join aggregate rows against the zoo table.  Returns one report row
    per match: {model, dataset, seq_len, wer, expected, delta, ok}.

    Only `split` rows are compared (default "test" — the published table is
    test-split; a dev aggregate must not be judged against it)."""
    import pandas as pd

    expected = load_expected(zoo_path)
    df = pd.read_csv(results_csv)
    agg = df[df["recording"].astype(str) == "__aggregate__"]
    if "split" in agg.columns:
        agg = agg[agg["split"].astype(str) == split]

    report = []
    for _, row in agg.iterrows():
        key = (str(row["model"]), str(row["dataset"]), int(row["seq_len"]))
        if key not in expected:
            continue
        wer, exp = float(row["wer"]), expected[key]
        report.append(
            {
                "model": key[0],
                "dataset": key[1],
                "seq_len": key[2],
                "wer": wer,
                "expected": exp,
                "delta": wer - exp,
                "ok": wer <= exp + tolerance,
            }
        )
    return report


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_csv")
    parser.add_argument("--zoo", default=None)
    parser.add_argument(
        "--tolerance", type=float, default=0.005,
        help="absolute WER slack over the published number (default 0.5 pt)",
    )
    parser.add_argument(
        "--split", default="test",
        help="which split's aggregates to judge (published table is test)",
    )
    args = parser.parse_args()

    report = compare(args.results_csv, args.zoo, args.tolerance, args.split)
    if not report:
        print("no rows matched the zoo's published table "
              "(model names must be zoo keys, e.g. lcasr_9l_768d_6h)")
        raise SystemExit(0)
    width = max(len(r["model"]) for r in report)
    for r in report:
        flag = "ok  " if r["ok"] else "FAIL"
        print(
            f"{flag} {r['model']:<{width}} {r['dataset']:<12} "
            f"seq {r['seq_len']:>6}: WER {r['wer']:.4f} "
            f"(published {r['expected']:.4f}, delta {r['delta']:+.4f})"
        )
    if any(not r["ok"] for r in report):
        raise SystemExit(1)


if __name__ == "__main__":
    main()

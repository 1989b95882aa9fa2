import json

import numpy as np

from lcasr_tpu.data.tokenizer import load_tokenizer
from lcasr_tpu.data.utterances import (
    UtteranceDataloader,
    UtteranceDataset,
    save_utterances,
)


def _make_pairs(tmp_path, n=2):
    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(n):
        T = 3000
        spec = rng.normal(size=(1, 80, T)).astype(np.float32)
        np.save(tmp_path / f"rec{i}.spec.npy", spec)
        words = []
        t = 0.5
        for j in range(30):
            words.append(
                {"word": f"word{j}", "startTime": f"{t:.2f}s", "endTime": f"{t + 0.3:.2f}s"}
            )
            # silence gap every 10 words → utterance boundary
            t += 0.4 if (j + 1) % 10 else 2.5
        with open(tmp_path / f"rec{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
        pairs[f"rec{i}"] = {
            "audio": str(tmp_path / f"rec{i}.spec.npy"),
            "txt": str(tmp_path / f"rec{i}.json"),
            "duration": T / 100,
        }
    return pairs


def test_save_and_load_utterances(tmp_path):
    tok = load_tokenizer()
    pairs = _make_pairs(tmp_path)
    out_dir = tmp_path / "utts"
    # reference save_utterances semantics (exp/save_utterances.py:35-96):
    # fixed chunk_size-frame windows with chunk_text_json transcripts; the
    # word-less tail chunk is skipped
    saved = save_utterances(pairs, str(out_dir), tok, chunk_size=1024)
    # 2 recordings x 2 text-bearing 1024-frame chunks (3rd chunk word-less)
    assert len(saved) == 4

    ds = UtteranceDataset(str(out_dir))
    assert len(ds) == 4
    rec_id, audio, txt = ds[0]
    assert audio.ndim == 3 and audio.shape[1] == 80
    assert audio.shape[-1] <= 1024
    assert txt.dtype == np.int32 and txt.size > 0

    dl = UtteranceDataloader(str(out_dir), batch_size=4)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["audio"].shape[0] == 4 and b["audio"].shape[1] == 80
    assert (b["audio_lengths"] <= b["audio"].shape[-1]).all()
    assert (b["text_lengths"] <= b["text"].shape[-1]).all()


def test_seen_ids_exclusion(tmp_path):
    tok = load_tokenizer()
    pairs = _make_pairs(tmp_path, n=1)
    out_dir = tmp_path / "utts"
    save_utterances(pairs, str(out_dir), tok, chunk_size=1024)
    ds_all = UtteranceDataset(str(out_dir))
    first_id = ds_all[0][0]
    ds = UtteranceDataset(str(out_dir), seen_ids=[first_id.replace(".npz", "")])
    # seen_ids are file stems
    stems = [f.split("/")[-1][:-4] for f in ds.files]
    assert len(ds) in (len(ds_all), len(ds_all) - 1)

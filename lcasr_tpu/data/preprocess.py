"""Offline preprocessing: audio files → precomputed mel-spectrogram tensors.

Counterpart of reference `lcasr/utils/preprocess.py:28-43` +
`job_scripts/preprocess/create_and_run.py` (SLURM-array staged .ogg →
fp16 `.spec.pt`): here, audio → fp16 `.spec.npy`, shardable with
(shard_index, num_shards) for array-job fan-out, plus the audio↔transcript
pairing helpers (reference `audio_tools.py:104-147`).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from lcasr_tpu.data.audio import processing_chain


def preprocess_file(audio_path: str, out_path: Optional[str] = None) -> str:
    spec = np.asarray(processing_chain(audio_path), dtype=np.float16)
    out_path = out_path or (os.path.splitext(audio_path)[0] + ".spec.npy")
    np.save(out_path, spec)
    return out_path


def findall_files(path: str, ext: str) -> List[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(ext):
                out.append(os.path.join(root, f))
    return sorted(out)


def pair_audio_txt(
    audio_path: str,
    txt_path: str,
    audio_ext: str = ".spec.npy",
    txt_ext: str = ".json",
    save_path: Optional[str] = None,
) -> Dict[str, Dict[str, str]]:
    """Pair spectrogram files with word-aligned transcript JSONs by the
    trailing-path key convention (reference `audio_tools.py:104-128`)."""
    pairs: Dict[str, Dict[str, str]] = {}
    for p in findall_files(audio_path, audio_ext):
        key = "_".join(el.split(" ")[0] for el in p.split("/")[-4:]).replace(audio_ext, "")
        pairs[key] = {"audio": p}
    for p in findall_files(txt_path, txt_ext):
        key = "_".join(p.split("/")[-4:]).replace(txt_ext, "")
        if key in pairs:
            pairs[key]["txt"] = p
    pairs = {k: v for k, v in pairs.items() if "txt" in v}
    if save_path:
        with open(save_path, "w") as f:
            json.dump(pairs, f)
    return pairs


def add_durations(pairs: Dict[str, Dict[str, str]]) -> Dict[str, Dict[str, str]]:
    """Attach durations (seconds) from the precomputed spectrograms —
    replaces the reference's per-file ffprobe calls (`audio_tools.py:130-147`)."""
    for key, entry in pairs.items():
        spec = np.load(entry["audio"], mmap_mode="r")
        entry["duration"] = float(spec.shape[-1] / 100.0)
    return pairs


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-audio", "--audio_dir", required=True)
    parser.add_argument("-ext", "--audio_ext", default=".wav")
    parser.add_argument("-shard", "--shard_index", type=int, default=0)
    parser.add_argument("-num_shards", "--num_shards", type=int, default=1)
    args = parser.parse_args()

    files = findall_files(args.audio_dir, args.audio_ext)
    mine = files[args.shard_index :: args.num_shards]
    for i, f in enumerate(mine):
        out = preprocess_file(f)
        print(f"[{i + 1}/{len(mine)}] {f} -> {out}")


if __name__ == "__main__":
    main()

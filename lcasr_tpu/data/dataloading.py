"""Data pipeline: long-recording chunking, duration-bucketed dataset, loader.

Counterparts of reference `lcasr/utils/dataloading.py`:
  * `chunk_spectogram` (`:14-25`) — split (B, 80, T) into chunk_size windows,
  * `chunk_text_json` (`:28-57`) — slice word-aligned transcript JSON by
    start/end times into per-chunk strings,
  * `SimpleDataset` (`:236-282`) — pandas table of (audio, txt, id, duration)
    sorted by duration, subgroup-shuffled (size 2000), then batch-shuffled so
    batch members have similar lengths; `seen_ids` exclusion for mid-epoch
    resume (`:253`),
  * `VariableBatchSimpleDataloader.update()` (`:378-396`) — rebuild at a new
    batch size when the sequence-warmup manager fires.

The RNG call sequence in `create_batches` matches the reference exactly, so
given the same pairs JSON and seed the batch order is reproduced.

Loading: precomputed `.spec.pt` mel spectrograms are read with torch-CPU
(zero-copy to numpy); `.spec.npy` is also supported for the torch-free path.
A single background thread prefetches the next batch (the host here is
1-core; heavy parallel decode belongs to offline preprocessing).
"""
from __future__ import annotations

import json
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from lcasr_tpu.data.audio import total_seconds


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def chunk_spectogram(spec: np.ndarray, chunk_size: int, chunk_overlap: int) -> List[np.ndarray]:
    """(B, feat, T) → list of (B, feat, ≤chunk_size) windows."""
    assert spec.ndim == 3, "Audio must be 3D i.e. (batch, features, time)"
    assert chunk_size > chunk_overlap, "chunk_size must be greater than chunk_overlap"
    return [
        spec[:, :, i : i + chunk_size]
        for i in range(0, spec.shape[2], chunk_size - chunk_overlap)
    ]


def chunk_text_json(
    text: List[Dict[str, str]],
    chunk_size: int,
    chunk_overlap: int,
    spectogram_length: int,
    get_seconds: bool = False,
):
    """Word-aligned transcript JSON → per-chunk transcript strings.

    Entries carry 'word', 'startTime' ("12.3s"), 'endTime'.  A word belongs to
    a chunk iff it lies entirely inside the chunk's time span.
    """
    assert chunk_size > chunk_overlap, "chunk_size must be greater than chunk_overlap"
    text_remaining = text
    splits, start_end = [], []
    for i in range(0, spectogram_length, chunk_size - chunk_overlap):
        c_start_sec = total_seconds(i)
        c_end_sec = total_seconds(i + chunk_size)
        overlap_sec = total_seconds(chunk_overlap)
        c_text: List[str] = []
        max_text_index = 0
        for j, el in enumerate(text_remaining):
            start_t = float(el["startTime"][:-1])
            end_t = float(el["endTime"][:-1])
            if start_t >= c_start_sec and end_t <= c_end_sec:
                c_text.append(el["word"])
            if end_t < c_end_sec - overlap_sec:
                max_text_index = j
            if end_t > c_end_sec:
                break
        text_remaining = text_remaining[max_text_index:]
        splits.append(" ".join(c_text))
        start_end.append((c_start_sec, c_end_sec))
    return (splits, start_end) if get_seconds else splits


def reset_seen_ids(seen_ids: List[str], epoch: int) -> List[str]:
    """Tag ids from a finished epoch so they aren't excluded next epoch
    (reference `dataloading.py:154-157`)."""
    return [f"epoch_{epoch}_{el}" if "epoch_" not in el else el for el in seen_ids]


def load_sample(entry: Dict[str, str]) -> Tuple[np.ndarray, list]:
    """Load (spectrogram (1, 80, T) float32, word-aligned transcript)."""
    audio_path = entry["audio"]
    if audio_path.endswith(".pt"):
        import torch

        audio = torch.load(audio_path, map_location="cpu", weights_only=False)
        audio = np.asarray(audio, dtype=np.float32)
    elif audio_path.endswith(".npy"):
        audio = np.load(audio_path).astype(np.float32)
    else:
        raise ValueError(f"unsupported spectrogram format: {audio_path}")
    if audio.ndim == 2:
        audio = audio[None]
    txt = load_json(entry["txt"])
    return audio, txt


class SimpleDataset:
    def __init__(
        self,
        pairs: Dict[str, Dict[str, str]],
        batch_size: int = 8,
        subgroup_shuffle_size: int = 2000,
        random_seed: int = 1234,
        seen_ids: Optional[List[str]] = None,
    ):
        import pandas as pd

        self.batch_size = batch_size
        self.subgroup_shuffle_size = subgroup_shuffle_size
        self.random_seed = random_seed

        self.pairs = pd.DataFrame(list(pairs.values()))
        self.pairs["id"] = list(pairs.keys())
        if seen_ids:
            self.pairs = self.pairs[~self.pairs["id"].isin(set(seen_ids))]
        self.pairs = self.pairs.sort_values(by="duration").reset_index(drop=True)
        self._create_batches()

    def _create_batches(self):
        np.random.seed(self.random_seed)
        indices = np.arange(len(self))
        groups = [
            np.random.permutation(indices[i : i + self.subgroup_shuffle_size])
            for i in range(0, len(indices), self.subgroup_shuffle_size)
        ]
        indices = np.concatenate(groups) if groups else indices
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        np.random.shuffle(batches)
        indices = np.concatenate(batches) if batches else indices
        self.pairs = self.pairs.iloc[indices].reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int):
        audio, txt = load_sample(
            {"audio": self.pairs["audio"][idx], "txt": self.pairs["txt"][idx]}
        )
        return decode_item(audio, txt, self.pairs["id"][idx])


def decode_item(audio: np.ndarray, txt: dict, rec_id):
    """Shared per-item decode: transcript drill-down + (F, T) → (T, F).
    Used by BOTH the python __getitem__ path and the native .npy batch
    path so the two can never diverge."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 3:
        audio = audio[0]
    words = txt["results"][-1]["alternatives"][0]["words"]
    return audio.T, words, rec_id


def collate(batch):
    """Pad a list of (T, F) specs to (B, F, T_max) + lengths."""
    audio, txt, ids = zip(*batch)
    lengths = np.array([a.shape[0] for a in audio], np.int64)
    t_max = int(lengths.max())
    n_feat = audio[0].shape[1]
    out = np.zeros((len(audio), n_feat, t_max), np.float32)
    for i, a in enumerate(audio):
        out[i, :, : a.shape[0]] = a.T
    return out, lengths, list(txt), list(ids)


class SimpleDataloader:
    """Sequential batched loader with a one-deep background prefetch thread."""

    def __init__(
        self,
        pairs: Dict[str, Dict[str, str]],
        tokenizer,
        batch_size: int = 5,
        chunk_size: int = 2048,
        chunk_overlap: int = 192,
        random_seed: int = 1234,
        subgroup_shuffle_size: int = 2000,
        seen_ids: Optional[List[str]] = None,
        prefetch: bool = True,
    ):
        self.tokenizer = tokenizer
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.dataset = SimpleDataset(
            pairs,
            batch_size=batch_size,
            subgroup_shuffle_size=subgroup_shuffle_size,
            random_seed=random_seed,
            seen_ids=seen_ids or [],
        )

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def _load_items(self, lo: int, hi: int):
        """Load dataset items [lo, hi) — through the native parallel .npy
        reader (C++ thread pool, one thread per file, GIL released) when all
        specs in the batch are .npy; python fallback otherwise."""
        paths = [self.dataset.pairs["audio"][j] for j in range(lo, hi)]
        if all(p.endswith(".npy") for p in paths):
            from lcasr_tpu.native import load_npy_native

            mod = load_npy_native()
            if mod is not None:
                specs = mod.read_npy_batch(paths, min(8, len(paths)))
                items = []
                for off, j in enumerate(range(lo, hi)):
                    txt = load_json(self.dataset.pairs["txt"][j])
                    items.append(decode_item(
                        specs[off], txt, self.dataset.pairs["id"][j]
                    ))
                return items
        return [self.dataset[j] for j in range(lo, hi)]

    def _iter_sync(self):
        n = len(self.dataset)
        for i in range(0, n, self.batch_size):
            yield collate(self._load_items(i, min(i + self.batch_size, n)))

    def __iter__(self):
        if not self.prefetch:
            yield from self._iter_sync()
            return
        q: "queue.Queue" = queue.Queue(maxsize=1)  # one-deep, as documented
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put so an abandoned iterator can release the worker
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # exceptions are ENQUEUED and re-raised in the consumer — a
            # silently dying worker would otherwise end the epoch early and
            # let training book a partial epoch as complete
            try:
                for item in self._iter_sync():
                    if not put(item):
                        return
                put(sentinel)
            except BaseException as e:  # noqa: BLE001
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # mid-epoch abandonment (sequence-warmup dataloader.update(),
            # crash paths) must not leak a worker pinned on a full queue
            # holding whole-podcast batches
            stop.set()


class VariableBatchSimpleDataloader:
    """Loader wrapper whose batch size can be rebuilt mid-epoch when the
    sequence warmup fires (reference `dataloading.py:336-405`)."""

    def __init__(
        self,
        pairs: Dict[str, Dict[str, str]],
        tokenizer,
        batch_size: int = 5,
        chunk_size: int = 2048,
        chunk_overlap: int = 192,
        random_seed: int = 1234,
        subgroup_shuffle_size: int = 2000,
        seen_ids: Optional[List[str]] = None,
        prefetch: bool = True,
        num_workers: int = 0,  # accepted for reference-API compat (torch
        pin_memory: bool = False,  # DataLoader knobs with no JAX analogue)
        **kwargs,
    ):
        if kwargs:
            raise TypeError(
                f"unknown dataloader argument(s): {sorted(kwargs)}"
            )
        self.prefetch = prefetch
        self.pairs = pairs
        self.tokenizer = tokenizer
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.batch_size = batch_size
        self.random_seed = random_seed
        self.subgroup_shuffle_size = subgroup_shuffle_size
        self._build(seen_ids or [], random_seed)

    def _build(self, seen_ids: List[str], random_seed: int,
               subgroup_shuffle_size: Optional[int] = None):
        self.dataloader = SimpleDataloader(
            pairs=self.pairs,
            tokenizer=self.tokenizer,
            batch_size=self.batch_size,
            chunk_size=self.chunk_size,
            chunk_overlap=self.chunk_overlap,
            random_seed=random_seed,
            subgroup_shuffle_size=(
                self.subgroup_shuffle_size
                if subgroup_shuffle_size is None
                else subgroup_shuffle_size
            ),
            seen_ids=seen_ids,
            prefetch=self.prefetch,
        )

    def update(self, batch_size: int, seen_ids: Optional[List[str]] = None, random_seed="same"):
        self.batch_size = batch_size
        # reference-parity quirk: the reference's update() (dataloading.py:
        # 385-396) does NOT forward subgroup_shuffle_size, so every rebuild
        # falls back to 2000 regardless of the constructor value — kept
        # bit-faithful because the docstring promises the reference's batch
        # order for the same (pairs, seed)
        self._build(
            seen_ids or [],
            self.random_seed if random_seed == "same" else random_seed,
            subgroup_shuffle_size=2000,
        )

    def total_recordings(self) -> int:
        return len(self.pairs)

    def __iter__(self):
        return iter(self.dataloader)

    def __len__(self) -> int:
        return len(self.dataloader)


def chunk_text_and_speakers_json(
    text: List[Dict[str, str]],
    chunk_size: int,
    chunk_overlap: int,
    spectogram_length: int,
    get_seconds: bool = False,
):
    """Speaker-aware variant (reference `dataloading.py:60-94`): per chunk,
    also return the number of distinct speakers."""
    assert chunk_size > chunk_overlap
    text_remaining = text
    splits, speakers, start_end = [], [], []
    for i in range(0, spectogram_length, chunk_size - chunk_overlap):
        c_start_sec = total_seconds(i)
        c_end_sec = total_seconds(i + chunk_size)
        overlap_sec = total_seconds(chunk_overlap)
        c_text, c_speakers, max_idx = [], [], 0
        for j, el in enumerate(text_remaining):
            start_t, end_t = float(el["startTime"][:-1]), float(el["endTime"][:-1])
            if start_t >= c_start_sec and end_t <= c_end_sec:
                c_text.append(el["word"])
                c_speakers.append(el["speakerTag"])  # KeyError on untagged data, like the reference (:83)
            if end_t < c_end_sec - overlap_sec:
                max_idx = j
            if end_t > c_end_sec:
                break
        text_remaining = text_remaining[max_idx:]
        splits.append(" ".join(c_text))
        speakers.append(len(set(c_speakers)))
        start_end.append((c_start_sec, c_end_sec))
    return (splits, speakers, start_end) if get_seconds else (splits, speakers)


def chunk_text_json_with_speaker_change(
    text: List[Dict[str, str]],
    chunk_size: int,
    chunk_overlap: int,
    spectogram_length: int,
    get_seconds: bool = False,
    speaker_change_token: str = "¬",
):
    """Insert a speaker-change token at diarization boundaries
    (reference `dataloading.py:96-131`)."""
    assert chunk_size > chunk_overlap
    text_remaining = text
    splits, start_end = [], []
    for i in range(0, spectogram_length, chunk_size - chunk_overlap):
        c_start_sec = total_seconds(i)
        c_end_sec = total_seconds(i + chunk_size)
        overlap_sec = total_seconds(chunk_overlap)
        c_text, max_idx, prev_speaker = [], 0, None
        for j, el in enumerate(text_remaining):
            prev_speaker = el["speakerTag"] if prev_speaker is None else prev_speaker
            start_t, end_t = float(el["startTime"][:-1]), float(el["endTime"][:-1])
            if start_t >= c_start_sec and end_t <= c_end_sec:
                if el["speakerTag"] != prev_speaker:
                    c_text.append(speaker_change_token)
                c_text.append(el["word"])
                prev_speaker = el["speakerTag"]
            if end_t < c_end_sec - overlap_sec:
                max_idx = j
            if end_t > c_end_sec:
                break
        text_remaining = text_remaining[max_idx:]
        splits.append(" ".join(c_text))
        start_end.append((c_start_sec, c_end_sec))
    return (splits, start_end) if get_seconds else splits

"""Pretrained-checkpoint download wrapper + offline-verifiable manifest.

Counterpart of reference `bin/load_pretrained.py:20-58`: fetch a published
lcasr checkpoint from the HuggingFace Hub and return (config, variables)
converted for this framework.  Gated on network availability — offline
environments should pass a local `.pt`/orbax path to the eval CLI directly.

The MANIFEST records, per published model, the hub repo id and the expected
checkpoint filenames — taken verbatim from the reference checkout
(`README.md:32-44` hub links; `bin/load_pretrained.py:27-47` filename
scheme: `step_105360.pt`, falling back to `step_105360_repeat_1.pt`, with
`repeat=N` selecting `step_105360_repeat_N.pt`).  `manifest_check` validates
a downloaded artifact against it and fails LOUDLY on any mismatch so the
bridge to a someday-real-data parity run can't bitrot silently.  `sha256`
fields are None until hub metadata can be captured out of band (zero-egress
container); when populated, a mismatch is an error.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

CHECKPOINT_PREFIX = "step_105360"  # reference bin/load_pretrained.py:27

# README model table names → hub repo ids (reference README.md:32-44).
# Keys match configs/model_zoo.yaml rows; values are the PUBLISHED repo
# names (…-RB-1p5M = rotary θ=1.5M trained on the full corpus).
MANIFEST = {
    "lcasr-9L-768D-6H": {
        "repo": "rjflynn2/lcasr-9L-768D-6H-RB-1p5M", "sha256": None},
    "lcasr-6L-768D-6H": {
        "repo": "rjflynn2/lcasr-6L-768D-6H-RB-1p5M", "sha256": None},
    "lcasr-6L-768D-12H": {
        "repo": "rjflynn2/lcasr-6L-768D-12H-RB-1p5M", "sha256": None},
    "lcasr-6L-768D-24H": {
        "repo": "rjflynn2/lcasr-6L-768D-24H-RB-1p5M", "sha256": None},
    "lcasr-6L-768D-6H-SinePos": {
        "repo": "rjflynn2/lcasr-6L-768D-6H-SinePos", "sha256": None},
    "lcasr-6L-768D-6H-NoPos": {
        "repo": "rjflynn2/lcasr-6L-768D-6H-NoPos", "sha256": None},
    "lcasr-3L-2048D-16H": {
        "repo": "rjflynn2/lcasr-3L-2048D-16H-RB-1p5M", "sha256": None},
    "lcasr-3L-768D-6H": {
        "repo": "rjflynn2/lcasr-3L-768D-6H-RB-1p5M", "sha256": None},
    "lcasr-12L-256D-8H": {
        "repo": "rjflynn2/lcasr-12L-256D-8H-RB-1p5M", "sha256": None},
    "lcasr-6L-256D-8H": {
        "repo": "rjflynn2/lcasr-6L-256D-8H-RB-1p5M", "sha256": None},
}

# Back-compat alias for earlier rounds' (incorrect, never-validated) name.
KNOWN_CHECKPOINTS = {k: v["repo"] for k, v in MANIFEST.items()}


def expected_filenames(repeat: Optional[int] = None) -> list:
    """Checkpoint filenames the reference loader accepts, in preference
    order (bin/load_pretrained.py:40-47)."""
    if repeat is not None:
        return [f"{CHECKPOINT_PREFIX}_repeat_{repeat}.pt"]
    return [f"{CHECKPOINT_PREFIX}.pt", f"{CHECKPOINT_PREFIX}_repeat_1.pt"]


def manifest_check(name: str, path: str, repeat: Optional[int] = None) -> None:
    """Validate a downloaded checkpoint file against the manifest: known
    model name, expected filename, and (when recorded) sha256.  Raises
    ValueError with a precise message on any mismatch."""
    if name not in MANIFEST:
        raise ValueError(
            f"unknown pretrained model {name!r}; known: {sorted(MANIFEST)}")
    fname = os.path.basename(path)
    allowed = expected_filenames(repeat)
    if fname not in allowed:
        raise ValueError(
            f"checkpoint filename {fname!r} does not match the published "
            f"scheme for {name!r}: expected one of {allowed} "
            "(reference bin/load_pretrained.py:40-47)")
    if not os.path.isfile(path):
        raise ValueError(f"checkpoint path does not exist: {path}")
    want = MANIFEST[name]["sha256"]
    if want is not None:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for block in iter(lambda: f.read(1 << 20), b""):
                h.update(block)
        got = h.hexdigest()
        if got != want:
            raise ValueError(
                f"sha256 mismatch for {name!r}: manifest {want}, file {got} "
                "— the hub artifact changed or the download is corrupt")


def download_pretrained(
    name_or_repo: str,
    cache_dir: Optional[str] = None,
    repeat: Optional[int] = None,
) -> str:
    """Download a checkpoint; returns the local .pt path.  Requires network.
    Tries the reference's filename scheme in order and manifest-checks the
    result for known model names."""
    entry = MANIFEST.get(name_or_repo)
    repo = entry["repo"] if entry else name_or_repo
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub unavailable") from e
    last_err = None
    for fname in expected_filenames(repeat):
        try:
            path = hf_hub_download(repo, fname, cache_dir=cache_dir)
            break
        except Exception as e:  # noqa: BLE001 — fall through the scheme
            last_err = e
    else:
        raise RuntimeError(
            f"no checkpoint matching {expected_filenames(repeat)} in "
            f"{repo}") from last_err
    if entry is not None:
        manifest_check(name_or_repo, path, repeat)
    return path


def load_pretrained(
    name_or_repo: str,
    cache_dir: Optional[str] = None,
    repeat: Optional[int] = None,
):
    """Download + convert to (Config, flax variables)."""
    from lcasr_tpu.evaluation.run import load_any_checkpoint

    path = download_pretrained(name_or_repo, cache_dir=cache_dir, repeat=repeat)
    return load_any_checkpoint(path)

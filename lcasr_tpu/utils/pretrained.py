"""Pretrained-checkpoint download wrapper.

Counterpart of reference `bin/load_pretrained.py:20-58`: fetch a published
lcasr checkpoint from the HuggingFace Hub and return (config, variables)
converted for this framework.  Gated on network availability — offline
environments should pass a local `.pt`/orbax path to the eval CLI directly.
"""
from __future__ import annotations

from typing import Optional

KNOWN_CHECKPOINTS = {
    # README model table names → HF repo ids (reference README.md:32-44)
    "lcasr-9L-768D-6H": "rjflynn2/lcasr-9L-768D-6H-rb",
    "lcasr-6L-768D-6H": "rjflynn2/lcasr-6L-768D-6H-rb",
    "lcasr-3L-768D-6H": "rjflynn2/lcasr-3L-768D-6H-rb",
    "lcasr-12L-256D-8H": "rjflynn2/lcasr-12L-256D-8H-rb",
    "lcasr-6L-256D-8H": "rjflynn2/lcasr-6L-256D-8H-rb",
}


def download_pretrained(name_or_repo: str, cache_dir: Optional[str] = None) -> str:
    """Download a checkpoint; returns the local .pt path.  Requires network."""
    repo = KNOWN_CHECKPOINTS.get(name_or_repo, name_or_repo)
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub unavailable") from e
    return hf_hub_download(repo, "step_105360.pt", cache_dir=cache_dir)


def load_pretrained(name_or_repo: str, cache_dir: Optional[str] = None):
    """Download + convert to (Config, flax variables)."""
    from lcasr_tpu.evaluation.run import load_any_checkpoint

    path = download_pretrained(name_or_repo, cache_dir=cache_dir)
    return load_any_checkpoint(path)

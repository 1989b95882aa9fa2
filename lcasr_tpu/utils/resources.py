"""Locate repo-level data files (configs/ lives beside the package).

For a source checkout this is <repo>/configs/...; for an installed package
(site-packages) the repo-relative path does not exist, so fall back to the
current working directory before failing with a listing of what was tried.
"""
from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_repo_file(relpath: str) -> str:
    """Best-effort path for e.g. "configs/model_zoo.yaml".  Returns the first
    existing candidate, else the repo-relative guess (callers' open() then
    raises with that path)."""
    candidates = [
        os.path.join(_REPO, relpath),
        os.path.join(os.getcwd(), relpath),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return candidates[0]

"""Offline validation of the pretrained-checkpoint manifest (VERDICT r3 #7).

The hub itself is unreachable at zero egress; what IS verifiable offline is
(a) the manifest's repo ids match the reference README's published links,
(b) the filename scheme matches the reference loader's, and (c) the
error paths of manifest_check fail loudly and precisely.
"""
import re
from pathlib import Path

import pytest

from lcasr_tpu.utils.pretrained import (
    CHECKPOINT_PREFIX,
    MANIFEST,
    expected_filenames,
    manifest_check,
)

REF_README = Path("/root/reference/README.md")


def test_manifest_repos_match_reference_readme():
    if not REF_README.exists():
        pytest.skip("reference checkout not present")
    text = REF_README.read_text()
    published = set(re.findall(r"huggingface\.co/(rjflynn2/[\w\-]+)", text))
    ours = {e["repo"] for e in MANIFEST.values()}
    missing = ours - published
    assert not missing, f"manifest repos not in reference README: {missing}"
    # every published model-table link is covered by the manifest
    assert published <= ours


def test_expected_filenames_follow_reference_scheme():
    assert expected_filenames() == [
        f"{CHECKPOINT_PREFIX}.pt", f"{CHECKPOINT_PREFIX}_repeat_1.pt"]
    assert expected_filenames(repeat=3) == [f"{CHECKPOINT_PREFIX}_repeat_3.pt"]


def test_manifest_check_error_paths(tmp_path):
    good = tmp_path / f"{CHECKPOINT_PREFIX}.pt"
    good.write_bytes(b"notarealcheckpoint")

    with pytest.raises(ValueError, match="unknown pretrained model"):
        manifest_check("lcasr-nonexistent", str(good))
    with pytest.raises(ValueError, match="does not match the published"):
        manifest_check("lcasr-9L-768D-6H", str(tmp_path / "model_final.pt"))
    with pytest.raises(ValueError, match="does not match the published"):
        # repeat=2 narrows the allowed name
        manifest_check("lcasr-9L-768D-6H", str(good), repeat=2)
    with pytest.raises(ValueError, match="does not exist"):
        manifest_check("lcasr-9L-768D-6H",
                       str(tmp_path / f"missing/{CHECKPOINT_PREFIX}.pt"))
    # valid name + filename passes (sha256 not yet recorded)
    manifest_check("lcasr-9L-768D-6H", str(good))

    # populated sha256 is enforced
    entry = MANIFEST["lcasr-9L-768D-6H"]
    old = entry["sha256"]
    entry["sha256"] = "0" * 64
    try:
        with pytest.raises(ValueError, match="sha256 mismatch"):
            manifest_check("lcasr-9L-768D-6H", str(good))
    finally:
        entry["sha256"] = old

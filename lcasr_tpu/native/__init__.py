"""Native (C++) components, compiled on demand.

`load_bpe_native()` returns the compiled extension module or None; callers
must keep a pure-Python fallback (this framework never hard-requires the
toolchain at runtime).
"""
from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "bpe_native.so")
_SRC = os.path.join(_DIR, "bpe_native.cpp")

_cached = None
_attempted = False


def build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def load_bpe_native():
    global _cached, _attempted
    if _cached is not None:
        return _cached
    if _attempted:
        return None
    _attempted = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("bpe_native", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
        return mod
    except Exception:
        return None

"""Native (C++) components, compiled on demand.

`load_bpe_native()` / `load_npy_native()` return the compiled extension
module or None; callers must keep a pure-Python fallback (this framework
never hard-requires the toolchain at runtime).
"""
from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))

_cache: dict = {}
_attempted: set = set()


def _numpy_include() -> Optional[str]:
    try:
        import numpy

        return numpy.get_include()
    except Exception:
        return None


def build(name: str) -> bool:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"{name}.so")
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", f"-I{include}"]
    if name == "npy_native":
        np_inc = _numpy_include()
        if np_inc is None:
            return False
        cmd.append(f"-I{np_inc}")
    cmd += [src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load(name: str):
    if name in _cache:
        return _cache[name]
    if name in _attempted:
        return None
    _attempted.add(name)
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"{name}.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        if not build(name):
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(name, so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cache[name] = mod
        return mod
    except Exception:
        return None


def load_bpe_native():
    return _load("bpe_native")


def load_npy_native():
    """Parallel .npy batch reader (C++ thread pool, GIL released)."""
    return _load("npy_native")


def load_beam_native():
    """No-LM CTC prefix-beam block advance (exact Python-path semantics)."""
    return _load("beam_native")

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a durable directory.

    Long-context training recompiles on every sequence-warmup bucket and the
    crash restarter (reference `exp/run_restarter.py`) restarts the process
    routinely — without the cache each restart pays the full compile again
    (20-40 s per shape on remote-attached chips).  Called by every CLI entry
    point; `LCASR_JAX_CACHE` overrides, `LCASR_JAX_CACHE=0` disables."""
    import jax

    env = os.environ.get("LCASR_JAX_CACHE")
    if env == "0":
        return ""
    path = env or path or os.path.expanduser("~/.cache/lcasr_tpu/jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path

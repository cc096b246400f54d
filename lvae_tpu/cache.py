"""Persistent XLA compilation cache.

Cold-compiling the flagship train step takes minutes on a remote TPU
runtime; JAX can serialize compiled executables to disk and reload them
across processes. ``enable_persistent_cache()`` turns that on with
sensible defaults. Called from every entry point (main.py, evaluate.py,
bench.py) — harmless when already enabled or unsupported by the backend.

Opt out with ``LVAE_NO_COMPILE_CACHE=1`` (e.g. when benchmarking compile
time itself) or point the cache elsewhere with ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "lvae_tpu", "xla_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache; returns the dir (or None if
    disabled via LVAE_NO_COMPILE_CACHE)."""
    if os.environ.get("LVAE_NO_COMPILE_CACHE"):
        return None
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningfully long to compile; default
    # threshold (1s) already skips trivial programs
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

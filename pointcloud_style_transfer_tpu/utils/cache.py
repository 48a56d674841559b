"""Persistent XLA compilation cache.

Full-size programs (train step, 50-step samplers) take minutes to compile on
remote-compile TPU backends; caching makes every process after the first
start instantly. Called from CLI entry points and bench.py.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/pcst-jax-compilation")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("PCST_COMPILATION_CACHE", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimisation only

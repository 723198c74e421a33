"""Persistent XLA compile cache for every entry point.

The 512^2 'large' renderer takes minutes to compile; the cache makes any
second boot (demo rerun, server restart, trainer resume) a disk read
instead.  bench.py and the tools/ scripts always enabled it - this makes
demo/serve/train do the same, so the production boot story matches the
measured one.  The reference has no compilation to cache (eager torch).

Env knobs: LSP_COMPILE_CACHE_DIR overrides the location; set it to the
empty string to disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/jax_cache"


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    $LSP_COMPILE_CACHE_DIR or /tmp/jax_cache; '' disables).  Idempotent;
    returns the directory in use or None when disabled."""
    if cache_dir is None:
        cache_dir = os.environ.get("LSP_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir

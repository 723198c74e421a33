"""Persistent XLA compile cache for every entry point.

The 512^2 'large' renderer takes minutes to compile; the cache makes any
second boot (demo rerun, server restart, trainer resume) a disk read
instead.  bench.py and the tools/ scripts always enabled it - this makes
demo/serve/train do the same, so the production boot story matches the
measured one.  The reference has no compilation to cache (eager torch).

The default location is DURABLE (~/.cache/lsp_jax_cache): a /tmp wipe
used to cost a ~13-minute cold remote compile of the 512^2 serving stack
before the first frame (round-4 notes); the durable default plus the
pack-build pre-warm (tools/prewarm_serving.py, build_person --prewarm)
bounds cold-boot-to-first-frame by a disk read.  docs/SERVING.md has the
measured before/after.

Env knobs: LSP_COMPILE_CACHE_DIR overrides the location; set it to the
empty string to disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "lsp_jax_cache")


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

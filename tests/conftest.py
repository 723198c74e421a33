"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding tests run on the host platform with
xla_force_host_platform_device_count=8 (the reference's DataParallel
equivalence becomes a pjit sharding test without real TPUs - SURVEY.md §4).
"""

import os

# Force the host platform: the session env pins JAX_PLATFORMS to the real
# TPU tunnel, but unit tests want a local 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: compile-once across test sessions.
# Durable location (utils/compile_cache default) - /tmp wipes used to
# cost a full-suite recompile.
_cache_dir = os.environ.get(
    "LSP_COMPILE_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "lsp_jax_cache"))
if _cache_dir:  # "" is the documented disable value (utils/compile_cache)
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Multi-host runtime initialisation.

The reference's multi-process path is a dormant DDP branch that crashes as
written (networks.py:395-398 calls `net()` on a module; SURVEY.md §2.2).
Here multi-host is the standard JAX runtime: call `initialize()` once per
process, build the same (data, model) mesh over `jax.devices()` (which
then spans all hosts), and run the same pjit programs - XLA routes
collectives over ICI within a slice and DCN across slices based on the
sharding layout.  No wrapper modules, no rank-conditional code.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed (no-op on single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass coordinator 'host:port', the process count and this
    process's id (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a global batch this host should feed its local devices
    (hosts load disjoint shards; jax.make_array_from_process_local_data or
    device_put with a NamedSharding assembles the global array)."""
    n = jax.process_count()
    if global_batch % n or global_batch < n:
        raise ValueError(
            f"global_batch={global_batch} must be a positive multiple of "
            f"process_count={n}: truncating would silently drop rows and "
            "break the mesh's data-axis layout")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_host_batch(mesh, batch):
    """Assemble a global data-sharded batch from this host's local rows.

    Each host samples only its `local_batch_slice` of the global batch;
    `jax.make_array_from_process_local_data` stitches the per-host rows
    into one global jax.Array laid out by the mesh's `data` axis - the
    multi-host replacement for mesh.shard_batch (which device_puts a full
    local copy).  Works unchanged single-process, where local == global
    (tested on the 8-device virtual mesh; tests/test_parallel.py).
    """
    import numpy as np

    from livespeechportraits_tpu.parallel import mesh as mesh_mod

    def _place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            raise ValueError(
                "batch leaves must have a leading batch dimension to shard "
                "over the data axis (got a scalar)")
        # reuse the single source of truth for the data-axis spec
        sh = mesh_mod.batch_sharding(mesh, x.ndim)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(_place, batch)


def global_batch_iter(sampler, global_batch: int, rng, mesh):
    """Multi-host training batch stream: every host draws the SAME index
    order (same rng seed on every process), keeps only its own rows, and
    assembles the global array.  Single-process this degrades to plain
    data-parallel sharding.

    Known cost at scale: the sampler materialises the FULL global batch
    on every host before the slice, so host-side decode does P times the
    needed work - acceptable for the motion stages' small rows; a
    renderer-scale multi-host run should give the sampler an index-range
    API so each host decodes only its slice."""
    sl = local_batch_slice(global_batch)
    for batch in sampler.batches(global_batch, rng):
        local = jax.tree.map(lambda x: x[sl], batch)
        yield shard_host_batch(mesh, local)

"""Device-mesh construction for pjit/shard_map programs.

The reference's only parallelism is single-process nn.DataParallel over
gpu_ids (networks.py:400) with a dummy-batch padding wrapper
(models/__init__.py:112-140).  The TPU-native equivalent is a
`jax.sharding.Mesh` with a `data` axis (batch sharding; gradient
all-reduce falls out of pjit) and an optional `model` axis for sharding
the renderer's channel dimensions at scale.  Multi-host runs reuse the
same program after `jax.distributed.initialize` - collectives ride ICI
within a slice and DCN across hosts, chosen by XLA from the sharding
layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from livespeechportraits_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    model_parallel_size divides the device count; the remaining factor
    becomes the data axis.  With one device this degenerates to a 1x1 mesh
    so the same pjit program runs anywhere.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if n % model_parallel_size != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel_size={model_parallel_size}"
        )
    grid = np.array(devs).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return make_mesh(cfg.model_parallel_size, devices)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a (pytree) batch with its leading axis sharded
    over `data` (the DataParallel scatter, minus the padding hacks - global
    batch must divide the data axis)."""
    def _place(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(_place, batch)


def replicate(mesh: Mesh, tree):
    """Replicate params across the mesh (DataParallel broadcast)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

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
    batch must divide the data axis).  A leaf with leading dim 1 is
    batch-shared (e.g. the per-subject candidate tensor the diet emits
    once per batch) and is REPLICATED - dim 1 cannot scatter over the
    data axis."""
    def _place(x):
        if np.ndim(x) > 0 and np.shape(x)[0] == 1 and mesh.shape[DATA_AXIS] > 1:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(_place, batch)


def replicate(mesh: Mesh, tree):
    """Replicate params across the mesh (DataParallel broadcast)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def zero1_sharding(mesh: Mesh, x, base_spec: Optional[Sequence] = None
                   ) -> NamedSharding:
    """ZeRO-1 placement for one optimizer-state leaf: shard the largest
    FREE data-axis-divisible dimension over `data` on top of `base_spec`
    (e.g. an existing channel sharding over `model`); replicate when no
    dimension qualifies (scalars, odd shapes)."""
    n = mesh.shape[DATA_AXIS]
    shape = np.shape(x)
    spec = list(base_spec) if base_spec is not None else []
    spec += [None] * (len(shape) - len(spec))
    used = {a for s in spec if s is not None
            for a in (s if isinstance(s, tuple) else (s,))}
    if n > 1 and shape and DATA_AXIS not in used:  # idempotent re-placement
        free = [d for d in range(len(shape))
                if spec[d] is None and shape[d] % n == 0 and shape[d] > 0]
        if free:
            spec[max(free, key=lambda d: shape[d])] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def zero1_place(mesh: Mesh, opt_state):
    """Partition optimizer state across the data axis (ZeRO-1).

    Under data parallelism the params (and grads, after the psum that
    falls out of the batch sharding) are replicated, but the optimizer
    moments don't need to be: placing each Adam mu/nu leaf with a
    data-axis sharding makes GSPMD partition the optimizer update math
    and insert the gather for the (replicated) param update - the ZeRO
    stage-1 memory split (Rajbhandari et al. 2020) expressed purely as a
    placement, with no step-code changes.  Cuts optimizer memory from
    2x params to 2x/N per chip; jit output shardings follow the input
    placement, so the state stays partitioned across steps.

    Leaves that already carry a sharding on this mesh (e.g. moments that
    inherited the params' `model`-axis channel sharding under hybrid
    DP+TP) keep it; the data axis lands on a free dimension.

    The reference has no distributed optimizer at all (plain Adam under
    DataParallel, feature2face_model.py / networks.py:400)."""
    def _place(x):
        base = None
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
            base = tuple(sh.spec)
        return jax.device_put(x, zero1_sharding(mesh, x, base))

    return jax.tree.map(_place, opt_state)

"""Parameter partitioning rules (tensor parallelism for the renderer).

The reference has no TP/PP/SP (SURVEY.md §2.2); parity needs only data
parallelism.  This module still exposes a `model`-axis partitioner so the
pix2pixHD generator can be channel-sharded at scale: conv kernels
[kh, kw, I, O] shard O over `model`, per-channel vectors (biases,
batch-norm stats) shard likewise when divisible - XLA then inserts the
all-gathers/reduce-scatters implied by the layout.  Non-divisible leaves
stay replicated, so any model_parallel_size compiles.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from livespeechportraits_tpu.parallel.mesh import MODEL_AXIS


def param_partition_spec(path: tuple, leaf: Any, model_size: int) -> P:
    """Channel-out sharding rule for a single parameter leaf."""
    shape = np.shape(leaf)
    if model_size <= 1 or not shape:
        return P()
    # conv kernels / dense weights: shard the output-channel (last) axis
    if len(shape) >= 2 and shape[-1] % model_size == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    # per-channel vectors riding along with a sharded conv
    if len(shape) == 1 and shape[0] % model_size == 0:
        return P(MODEL_AXIS)
    return P()


def shard_params(mesh: Mesh, params, model_size: int | None = None):
    """Place a params pytree according to the channel-sharding rules."""
    if model_size is None:
        model_size = mesh.shape[MODEL_AXIS]

    def _place(path, leaf):
        spec = param_partition_spec(path, leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, params)


def shard_spatial(mesh: Mesh, x, axis: int = 1):
    """Spatial partitioning (SP) of an NHWC image batch: shard the height
    axis over `model`, replicate the rest.

    GSPMD inserts the 3x3-conv halo exchanges and the resharding around
    the strided/upsampling stages automatically, so the SAME
    apply_generator program renders one image cooperatively across chips
    - the lever for frames too large for one chip's HBM (the
    frame-sharded `data` axis scales throughput but caps resolution at
    one chip; this caps neither).  Forward equivalence vs the unsharded
    program is tested on the virtual mesh (test_parallel.py).

    The reference's only parallelism is batch-split DataParallel
    (networks.py:400) - no spatial partitioning of any kind."""
    def _place(v):
        spec = [None] * np.ndim(v)
        spec[axis] = MODEL_AXIS
        return jax.device_put(v, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(_place, x)

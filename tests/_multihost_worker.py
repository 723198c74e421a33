"""Subprocess body for the real two-process jax.distributed test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set.  Each process owns 2 virtual CPU
devices (4 global).  It initialises the distributed runtime through
livespeechportraits_tpu.parallel.multihost, assembles a global
data-sharded batch from its local rows only, runs one jitted A2F
training step, and prints a params digest — the parent asserts both
processes agree with a single-process oracle on the same global batch.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np

    from livespeechportraits_tpu.parallel import multihost

    multihost.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from livespeechportraits_tpu.config import Audio2FeatureConfig
    from livespeechportraits_tpu.models import audio2feature
    from livespeechportraits_tpu.train import state as state_mod, steps

    from livespeechportraits_tpu.parallel import mesh as mesh_mod

    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=16,
                              output_dim=6, frame_future=2)
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), cfg)
    tx = state_mod.adam(1e-3)
    step = steps.make_a2f_step(cfg, tx)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    # every process holds the same initial values; replicating makes them
    # one global (fully-replicated) array per leaf, jit-compatible with
    # the globally-sharded batch
    st = state_mod.create_state(mesh_mod.replicate(mesh, params), tx)

    # Global batch of 4; every process draws the same stream but keeps
    # only its local_batch_slice rows (hosts load disjoint shards).
    rng = np.random.default_rng(7)
    full = {
        "audio": rng.normal(size=(4, 24, 8)).astype(np.float32),
        "target": rng.normal(size=(4, 12, 6)).astype(np.float32) * 0.1,
    }
    sl = multihost.local_batch_slice(4)
    local = {k: v[sl] for k, v in full.items()}
    batch = multihost.shard_host_batch(mesh, local)

    st, metrics = step(st, batch)
    # digest must be identical on every process (fully-addressable after
    # the all-reduce implied by the data-sharded loss mean)
    digest = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(st.params)))
    print(f"DIGEST {jax.process_index()} {digest:.10f} "
          f"loss {float(metrics['loss']):.10f} "
          f"primary {multihost.is_primary()}", flush=True)


if __name__ == "__main__":
    main()

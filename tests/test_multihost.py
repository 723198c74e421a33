"""REAL multi-process test of the multi-host path (SURVEY.md §2.2 DDP row).

The reference's multi-process branch is dormant/broken DataParallel DDP
(networks.py:395-398); ours is the standard JAX multi-host runtime.  This
test launches TWO actual OS processes, each owning 2 virtual CPU devices,
connected through `jax.distributed` (coordinator on localhost) — the same
code path a real multi-host TPU pod uses, minus the ICI.  Each process
feeds only its `local_batch_slice` rows, runs one jitted data-parallel
training step over the 4-device global mesh, and must agree with the
other process AND with a single-process oracle on the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _oracle_digest() -> tuple:
    """Single-process step on the full global batch (same seeds as the
    worker), digest of the resulting params."""
    from livespeechportraits_tpu.config import Audio2FeatureConfig
    from livespeechportraits_tpu.models import audio2feature
    from livespeechportraits_tpu.train import state as state_mod, steps

    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=16,
                              output_dim=6, frame_future=2)
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), cfg)
    tx = state_mod.adam(1e-3)
    st = state_mod.create_state(params, tx)
    step = steps.make_a2f_step(cfg, tx)
    rng = np.random.default_rng(7)
    batch = {
        "audio": jnp.asarray(rng.normal(size=(4, 24, 8)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(4, 12, 6)).astype(np.float32) * 0.1),
    }
    st, metrics = step(st, batch)
    digest = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(st.params)))
    return digest, float(metrics["loss"])


def test_two_process_distributed_training_step():
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
        env.update(JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    digests = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
        line = [l for l in out.splitlines() if l.startswith("DIGEST")]
        assert line, out[-2000:]
        _, pid, digest, _, loss, _, primary = line[0].split()
        digests[int(pid)] = (float(digest), float(loss), primary)
    assert set(digests) == {0, 1}
    # processes agree exactly (same global program, replicated result)
    assert digests[0][0] == digests[1][0]
    assert digests[0][1] == digests[1][1]
    assert digests[0][2] == "True" and digests[1][2] == "False"

    # and match the single-process oracle on the same global batch
    # (reduction order across shards may differ in the last float bits)
    od, ol = _oracle_digest()
    np.testing.assert_allclose(digests[0][0], od, rtol=1e-5)
    np.testing.assert_allclose(digests[0][1], ol, rtol=1e-5)

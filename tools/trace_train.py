#!/usr/bin/env python
"""Capture a real device trace of the fused 512^2 GAN train step and
print a per-op-family device-time table (companion to trace_render.py;
same Chrome-trace parsing, training program instead of the renderer).

    python tools/trace_train.py [batch] [remat] [iters]

Use with docs/TRAIN_512.md's batch-scaling table: the step is
compute-saturated from B=16 (~33% MFU); this attributes where the other
two thirds go (bf16 conv fusions vs BN reductions vs transposes/copies).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face
    from livespeechportraits_tpu.train import state as state_mod
    from livespeechportraits_tpu.train import steps as steps_mod
    from livespeechportraits_tpu.utils import profiling

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    # argv[2]: 0 = no remat, 1 = full G remat, K>1 = selective depth-K,
    # suffix "d" (e.g. "0d") additionally remats the D towers.
    remat_arg = sys.argv[2] if len(sys.argv) > 2 else "0"
    remat_d = remat_arg.endswith("d")
    remat_i = int(remat_arg.rstrip("d") or "0")
    remat = (remat_i == 1) if remat_i <= 1 else remat_i
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    H = 512
    cfg = Feature2FaceConfig(size="large", ngf=64, n_downsample=8, load_size=H)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    tx = optax.adam(2e-4, b1=0.5, b2=0.999)
    g_state = state_mod.create_state(
        feature2face.init_generator(kg, cfg)["net"], tx)
    d_state = state_mod.create_state(
        feature2face.init_discriminator(kd, cfg), tx)
    gan_step = steps_mod.make_f2f_fused_step(
        cfg, tx, tx, vgg_params=None, compute_dtype=jnp.bfloat16, remat=remat,
        remat_d=remat_d)

    rng = np.random.default_rng(0)
    dev_batch = jax.device_put({
        "feature_map": rng.uniform(0, 1, (batch, H, H, 1)).astype(np.float32),
        "cand_image": rng.uniform(-1, 1, (batch, H, H, 12)).astype(np.float32),
        "tgt_image": rng.uniform(-1, 1, (batch, H, H, 3)).astype(np.float32),
    })

    g_state, d_state, m = gan_step(g_state, d_state, dev_batch)
    _ = float(m["loss_G"])  # compile + true barrier
    log_dir = "/tmp/lsp_trace_train"
    with profiling.trace(log_dir):
        for _ in range(iters):
            g_state, d_state, m = gan_step(g_state, d_state, dev_batch)
        _ = float(m["loss_G"])

    latest = max(glob.glob(os.path.join(log_dir, "plugins/profile/*")),
                 key=os.path.getmtime)
    trace_file = glob.glob(os.path.join(latest, "*.trace.json.gz"))[0]
    with gzip.open(trace_file) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg: collections.Counter = collections.Counter()
    for e in events:
        # ONLY the "XLA Ops" lane: the "Steps" and "XLA Modules" lanes
        # mirror the same device time and would double-count it.
        if (e.get("ph") == "X" and "dur" in e
                and pid_names.get(e.get("pid"), "").startswith("/device:")
                and tid_names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
                and not e["name"].startswith("jit_")):
            agg[re.sub(r"[.\d]+$", "", e["name"])] += e["dur"]
    total = sum(agg.values())
    print(json.dumps({"trace": trace_file, "iters": iters, "batch": batch,
                      "remat": remat, "remat_d": remat_d,
                      "device_ms_per_step": round(total / iters / 1e3, 2)}))
    for fam, us in agg.most_common(25):
        print(f"{us / iters / 1e3:8.3f} ms/step  {fam}")


if __name__ == "__main__":
    main()

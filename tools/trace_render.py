#!/usr/bin/env python
"""Capture a real device trace of the 512^2 render program and print a
per-op-family device-time table.

jax.profiler works through this harness's relay: the Chrome trace
(vm.trace.json.gz) carries true on-device kernel durations, parsed here
with the stdlib (no tensorboard needed).

    python tools/trace_render.py [batch] [quantize] [iters]

Round-2 findings at batch=16 int8 (2026-08-17): the int8 conv fusions
(XLA names them clamp_convert_fusion after their quantize roots) run at
~53% of the chip's int8 peak and take ~19 ms of the ~31 ms batch; the
rest is data movement - copies ~2.4 ms, broadcasts ~2.2 ms, skip-add+relu
fusions ~1.7 ms, padding ~1.2 ms, float outer convs ~3.5 ms.
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

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face
    from livespeechportraits_tpu.pipeline.animate import _jit_render
    from livespeechportraits_tpu.utils import profiling

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    quantize = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = Feature2FaceConfig(size="large", ngf=64, n_downsample=8, load_size=512)
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 13))
    if quantize:
        params = feature2face.fold_bn_generator(
            feature2face.quantize_generator(params))
        params = feature2face.calibrate_generator(
            params, x, compute_dtype=jnp.bfloat16)

    y = _jit_render(params["net"], "large", x, jnp.bfloat16)
    _ = float(jnp.sum(y.ravel()[:1].astype(jnp.float32)))  # compile + sync
    log_dir = "/tmp/lsp_trace"
    with profiling.trace(log_dir):
        for _ in range(iters):
            y = _jit_render(params["net"], "large", x, jnp.bfloat16)
        _ = float(jnp.sum(y.ravel()[:1].astype(jnp.float32)))

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
                      "quantize": quantize,
                      "device_ms_per_batch": round(total / iters / 1e3, 2)}))
    for fam, us in agg.most_common(20):
        print(f"{us / iters / 1e3:8.3f} ms/batch  {fam}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""In-net render-time attribution by structural ablation.

The isolated-conv probe (int8_probe.py) carries ~1 ms of per-dispatch
overhead per shape, so it cannot attribute the REAL in-program cost of a
block (XLA fuses epilogues across the stage).  This tool times the full
512^2 'large' render program against variants with specific residual
blocks deleted from the param tree (the apply walks `res_down`/`res_up`
lists, so an empty list is a structurally valid smaller net - outputs are
garbage, timing is what matters).

    python tools/render_ablate.py [batch] [quantize]

One JSON line per variant: ms/batch, delta vs full = the in-net cost of
the removed block.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strip(net, path_preds):
    """Return a deep-copied net with res lists emptied where
    pred(depth, key) says so.  depth 0 = outermost stage."""
    def walk(p, depth):
        q = dict(p)
        for key in ("res_down", "res_up"):
            if key in q and any(pred(depth, key) for pred in path_preds):
                q[key] = []
        if "sub" in q:
            q["sub"] = walk(q["sub"], depth + 1)
        return q
    return walk(net, 0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face
    from livespeechportraits_tpu.pipeline.animate import _jit_render

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    quantize = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True

    cfg = Feature2FaceConfig(size="large", ngf=64, n_downsample=8, load_size=512)
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    if quantize:
        params = feature2face.fold_bn_generator(
            feature2face.quantize_generator(params))
        x0 = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 512, 512, cfg.input_nc))
        params = feature2face.calibrate_generator(
            params, x0, compute_dtype=jnp.bfloat16)

    # depth 0 res_down / depth 1 res_up sit at 256^2 x 64ch; depth 1
    # res_down / depth 2 res_up at 128^2 x 128ch; etc.
    variants = {
        "full": [],
        "minus_256sq_64ch": [lambda d, k: (d == 0 and k == "res_down")
                             or (d == 1 and k == "res_up")],
        "minus_128sq_128ch": [lambda d, k: (d == 1 and k == "res_down")
                              or (d == 2 and k == "res_up")],
        "minus_64sq_256ch": [lambda d, k: (d == 2 and k == "res_down")
                             or (d == 3 and k == "res_up")],
        # depth-3 res_up sits at 64^2 (already covered above); only
        # res_down from depth 3 and res_up from depth 4 are <= 32^2
        "minus_leq32sq": [lambda d, k: (d >= 3 and k == "res_down")
                          or (d >= 4 and k == "res_up")],
    }

    x = jax.random.uniform(jax.random.PRNGKey(2),
                           (batch, 512, 512, cfg.input_nc))
    base_ms = None
    for name, preds in variants.items():
        net = _strip(params["net"], preds) if preds else params["net"]
        y = _jit_render(net, "large", x, jnp.bfloat16)
        _ = float(jnp.sum(y.ravel()[:1].astype(jnp.float32)))  # compile+sync
        t0 = time.perf_counter()
        K = 10
        for _ in range(K):
            y = _jit_render(net, "large", x, jnp.bfloat16)
        _ = float(jnp.sum(y.ravel()[:1].astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / K * 1e3
        out = {"variant": name, "ms_per_batch": round(ms, 2),
               "quantize": quantize, "batch": batch}
        if name == "full":
            base_ms = ms
        else:
            out["in_net_cost_ms"] = round(base_ms - ms, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe: does s8xs8->s32 convolution beat bf16 on this chip's MXU?

TPU v5e advertises 394 int8 TOPS vs 197 bf16 TFLOP/s.  If XLA lowers
int8 `conv_general_dilated` onto the int8 MXU path, a quantised
Feature2Face inference mode could ~2x the renderer; if it does not (or
falls back to s32 multiply-add on the VPU), the idea dies here and the
negative result goes to docs/BENCH_HISTORY.md.

Times representative 'large'-U-Net stage shapes (NHWC, 3x3 convs) in
bf16 vs int8, one JSON line each.

    python tools/int8_probe.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    # (H, Cin, Cout): the stages that dominate the 512^2 'large' forward
    shapes = [(256, 128, 128), (128, 256, 256), (64, 512, 512), (32, 512, 512)]

    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))

    @partial(jax.jit, static_argnums=(2,))
    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=acc)

    rng = np.random.default_rng(0)
    for H, ci, co in shapes:
        x_f = jnp.asarray(rng.normal(size=(batch, H, H, ci)), jnp.bfloat16)
        w_f = jnp.asarray(rng.normal(size=(3, 3, ci, co)), jnp.bfloat16)
        x_i = jnp.asarray(rng.integers(-127, 127, (batch, H, H, ci)), jnp.int8)
        w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8)
        out = {"shape": f"{batch}x{H}x{H}x{ci}->{co}"}
        for name, (x, w, acc) in {
            "bf16_ms": (x_f, w_f, jnp.float32),
            "int8_ms": (x_i, w_i, jnp.int32),
        }.items():
            try:
                y = conv(x, w, acc)
                _ = float(jnp.sum(jnp.abs(y.ravel()[:1]).astype(jnp.float32)))
                t0 = time.perf_counter()
                K = 30
                for _ in range(K):
                    y = conv(x, w, acc)
                _ = float(jnp.sum(jnp.abs(y.ravel()[:1]).astype(jnp.float32)))
                out[name] = round((time.perf_counter() - t0) / K * 1e3, 3)
            except Exception as e:  # unsupported lowering
                out[name] = f"ERROR {type(e).__name__}: {e}"[:120]
        if isinstance(out.get("bf16_ms"), float) and isinstance(out.get("int8_ms"), float):
            out["speedup"] = round(out["bf16_ms"] / out["int8_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

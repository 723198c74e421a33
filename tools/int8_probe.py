#!/usr/bin/env python
"""Probe: per-conv achieved throughput of the 'large' U-Net stage shapes.

Two questions this answers on the current chip:
1. does s8xs8->s32 convolution beat bf16 on the MXU (v5e advertises
   394 int8 TOPS vs 197 bf16 TFLOP/s), per shape?
2. which stage shapes run far from the roofline (MXU column utilisation
   is bounded by C_out vs the 128-wide systolic array; HBM-bound shapes
   show low compute intensity) - i.e. where the remaining renderer
   headroom lives.

Times every distinct conv shape of the 512^2 'large' ResUNet (NHWC,
3x3), one JSON line each with ms, achieved TFLOP/s (bf16-equivalent;
int8 ops counted as FLOPs) and the fraction of bf16 peak.

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

    # (label, H_in, Cin, Cout, stride): every distinct conv shape in the
    # 512^2 'large' forward (stage res blocks dominate; up convs read the
    # 2x-upsampled concat).  GF = per-batch GFLOPs at batch `batch`.
    shapes = [
        ("outer.down", 512, 13, 64, 2),
        ("s0.res256x64", 256, 64, 64, 1),
        ("outer.up", 512, 128, 3, 1),
        ("s1.down", 256, 64, 128, 2),
        ("s1.res128x128", 128, 128, 128, 1),
        ("s1.up", 256, 256, 64, 1),
        ("s2.down", 128, 128, 256, 2),
        ("s2.res64x256", 64, 256, 256, 1),
        ("s2.up", 128, 512, 128, 1),
        ("s3.down", 64, 256, 512, 2),
        ("s3.res32x512", 32, 512, 512, 1),
        ("s3.up", 64, 1024, 256, 1),
        ("s4.res16x512", 16, 512, 512, 1),
        ("s4.up", 32, 1024, 512, 1),
    ]

    @partial(jax.jit, static_argnums=(2, 3))
    def conv(x, w, acc, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6e": 918e12, "trillium": 918e12}
    peak = next((v for k, v in peaks.items() if k in kind), None)

    rng = np.random.default_rng(0)
    for label, H, ci, co, stride in shapes:
        Ho = H // stride
        gflops = 2 * 9 * ci * co * Ho * Ho * batch / 1e9
        x_f = jnp.asarray(rng.normal(size=(batch, H, H, ci)), jnp.bfloat16)
        w_f = jnp.asarray(rng.normal(size=(3, 3, ci, co)), jnp.bfloat16)
        x_i = jnp.asarray(rng.integers(-127, 127, (batch, H, H, ci)), jnp.int8)
        w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8)
        out = {"conv": label, "shape": f"{batch}x{H}x{H}x{ci}->{co}/s{stride}",
               "gflops": round(gflops, 2)}
        for name, (x, w, acc) in {
            "bf16": (x_f, w_f, jnp.float32),
            "int8": (x_i, w_i, jnp.int32),
        }.items():
            try:
                y = conv(x, w, acc, stride)
                _ = float(jnp.sum(jnp.abs(y.ravel()[:1]).astype(jnp.float32)))
                t0 = time.perf_counter()
                K = 30
                for _ in range(K):
                    y = conv(x, w, acc, stride)
                _ = float(jnp.sum(jnp.abs(y.ravel()[:1]).astype(jnp.float32)))
                ms = (time.perf_counter() - t0) / K * 1e3
                out[f"{name}_ms"] = round(ms, 3)
                out[f"{name}_tflops"] = round(gflops / ms, 1)
                if peak:
                    out[f"{name}_pct_bf16_peak"] = round(
                        100 * gflops / ms / (peak / 1e12), 1)
            except Exception as e:  # unsupported lowering
                out[name] = f"ERROR {type(e).__name__}: {e}"[:120]
        if isinstance(out.get("bf16_ms"), float) and isinstance(out.get("int8_ms"), float):
            out["speedup"] = round(out["bf16_ms"] / out["int8_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure streaming per-chunk latency on the current backend.

Streams synthetic audio through StreamingAnimator at the flagship 512^2
config and reports per-push wall time (the latency a live caller sees per
chunk of audio) after a warm-up pass, for several chunk sizes.

    python tools/stream_latency.py [seconds] [image_size]

Prints one JSON line per chunk size.  Note: on this harness every
dispatch crosses a loopback relay (~30 ms each way), so the numbers are
upper bounds on real host-attached latency; the dispatch COUNT per chunk
(also reported) is the harness-independent figure.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    from livespeechportraits_tpu.config import Feature2FaceConfig, PersonConfig
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    quantize = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    chunks = ([int(c) for c in sys.argv[4].split(",")] if len(sys.argv) > 4
              else [8, 16, 32])
    transfer = sys.argv[5] if len(sys.argv) > 5 else "rgb"
    depths = ([int(d) for d in sys.argv[6].split(",")] if len(sys.argv) > 6
              else [0, 1])
    render_batch_override = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    cfg = PersonConfig(
        name="StreamBench",
        feature2face=Feature2FaceConfig(size="large", ngf=64,
                                        n_downsample=min(8, int(np.log2(H))),
                                        load_size=H, precision="bfloat16"),
    )
    assets, models = assets_mod.make_synthetic_person(
        cfg, key=jax.random.PRNGKey(0), image_size=H, bank_size=4096)

    # Raw link speed for THIS window, so cross-window comparisons of the
    # push times are attributable (utils/profiling.link_probe: fresh
    # PRNG-byte fetches; same probe as bench.py).
    from livespeechportraits_tpu.utils import profiling

    link = profiling.link_probe()
    window = time.strftime("%Y-%m-%d %H:%M", time.localtime())

    from livespeechportraits_tpu.pipeline import video as video_mod

    audio = video_mod.make_test_tone(seconds)

    if quantize:
        from livespeechportraits_tpu.pipeline import animate as animate_mod
        import jax.numpy as jnp

        calib = animate_mod.build_render_inputs(cfg, assets, models, audio,
                                                seed=0, max_frames=8)
        models = assets_mod.quantize_person_models(
            models, calibrate_inputs=calib, calibrate_dtype=jnp.bfloat16)

    for chunk in chunks:
        for depth in depths:
            # one warm-up stream compiles every chunk program for this size
            for warm in (True, False):
                st = StreamingAnimator(cfg, assets, models, seed=0, chunk=chunk,
                                       render_batch=(render_batch_override
                                                     or max(4, chunk // 2)),
                                       pipeline_depth=depth, transfer=transfer)
                push = int(chunk / 60 * 16000) + 1  # one chunk of audio per push
                times, frames, stage_rows = [], 0, []
                for lo in range(0, len(audio), push):
                    before = dict(st.stage_ms)
                    t0 = time.perf_counter()
                    out = st.push_audio(audio[lo : lo + push])
                    frames += len(out)
                    times.append(time.perf_counter() - t0)
                    stage_rows.append({k: st.stage_ms.get(k, 0.0)
                                       - before.get(k, 0.0)
                                       for k in st.stage_ms})
                t0 = time.perf_counter()
                frames += len(st.flush())
                flush_s = time.perf_counter() - t0
            if len(times) <= 2:
                print(f"chunk={chunk}: audio too short for a steady-state "
                      f"measurement ({len(times)} pushes); skipping")
                continue
            times_ms = np.asarray(times[2:]) * 1e3  # skip stream-start ramp
            print(json.dumps({
                "metric": f"streaming per-push wall (chunk={chunk} frames, {H}^2)",
                "chunk_frames": chunk,
                "pipeline_depth": depth,
                "render_batch": render_batch_override or max(4, chunk // 2),
                "quantize_int8": quantize,
                "transfer": transfer,
                "push_ms_p50": round(float(np.percentile(times_ms, 50)), 1),
                "push_ms_p95": round(float(np.percentile(times_ms, 95)), 1),
                "push_ms_mean": round(float(times_ms.mean()), 1),
                "push_ms_max": round(float(times_ms.max()), 1),
                "flush_ms": round(flush_s * 1e3, 1),
                "frames": frames,
                "realtime_budget_ms": round(chunk / 60 * 1e3, 1),
                # strict: every push (p95) inside its own chunk budget.
                "realtime": bool(np.percentile(times_ms, 95) < chunk / 60 * 1e3),
                # sustained: the MEAN push inside the budget - with the
                # pipeline_depth>=1 buffered chunk absorbing jitter, a
                # stream sustains real time indefinitely iff the mean
                # stays under budget (utilisation < 1); p95 excursions
                # eat into the buffered chunk and are recovered by
                # under-budget pushes.  That argument needs the buffered
                # chunk, so at depth 0 (no buffer: every over-budget push
                # stalls playback) the flag is null.
                "realtime_sustained": (bool(times_ms.mean() < chunk / 60 * 1e3)
                                       if depth >= 1 else None),
                "latency_frames_algorithmic": st.latency_frames,
                # per-stage medians over the steady-state pushes: the
                # dispatch-budget attribution (which advance pays the
                # relay round-trips) that decides what to fuse next
                "stage_ms_p50": {
                    k: round(float(np.percentile(
                        [r.get(k, 0.0) for r in stage_rows[2:]], 50)), 1)
                    for k in (stage_rows[-1] if stage_rows else {})},
                "device": str(jax.devices()[0]),
                "window": window,
                **link,
            }))


if __name__ == "__main__":
    main()

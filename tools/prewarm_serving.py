#!/usr/bin/env python
"""Pre-warm the serving compile cache; measure cold-boot-to-first-frame.

The 512^2 serving stack costs minutes of remote XLA compilation the
first time each program is seen.  The compile cache is durable by
default (utils/compile_cache: ~/.cache/lsp_jax_cache), so that cost is
paid ONCE - at pack-build time, by running this tool (or
`tools/build_person.py --prewarm`) - and every later boot, including
after a /tmp wipe, is a disk read.  The reference's setup() loads
released torch weights in seconds (/root/reference/predict.py:33-44);
this closes the same load-once contract for a compiled-XLA serving
stack.  Measured before/after: docs/SERVING.md.

    python tools/prewarm_serving.py                   # flagship defaults
    python tools/prewarm_serving.py --quantize 0      # float path too

Prints one JSON line:
    {"setup_s": ..., "predict_first_s": ..., "stream_first_frame_s": ...,
     "total_s": ..., "cache_dir": ...}

predict_first_s is the cold-boot-to-first-frame number for offline
serving (setup + first bucketed predict); stream_first_frame_s is the
time from stream() start to its FIRST yielded frame batch (live
serving).  Run the tool twice to see cold vs warm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--id", default="Synthetic")
    p.add_argument("--config_dir", default="./config")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--quantize", type=int, default=1)
    p.add_argument("--transfer", default="pack4e")
    p.add_argument("--render_batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=1.0,
                   help="test-tone length (one serve bucket)")
    p.add_argument("--streaming", type=int, default=1)
    p.add_argument("--stream_depth", type=int, default=1)
    p.add_argument("--skip_video", type=int, default=1,
                   help="predict(write_video=False): warm only the "
                        "device programs, not the host muxer")
    p.add_argument("--artifact", default="auto",
                   help="serving artifact .npz: built on the first run, "
                        "loaded on every later boot (skips the "
                        "quantize+calibrate work - the load-once "
                        "contract).  'auto' derives a path under the "
                        "compile-cache dir; '' disables")
    args = p.parse_args()

    from livespeechportraits_tpu.utils import compile_cache

    t0 = time.perf_counter()
    cache_dir = compile_cache.enable()

    from livespeechportraits_tpu.pipeline import video as video_mod
    from livespeechportraits_tpu.serve import Predictor

    artifact = args.artifact
    if artifact == "auto":
        artifact = os.path.join(
            cache_dir or os.path.expanduser("~/.cache"),
            f"serve_{args.id}_{args.image_size}"
            f"{'_int8' if args.quantize else ''}.npz")
    pred = Predictor()
    pred.setup(person_id=args.id, config_dir=args.config_dir,
               image_size=args.image_size, quantize=bool(args.quantize),
               artifact=artifact or None)
    setup_s = time.perf_counter() - t0

    audio = video_mod.make_test_tone(args.seconds)
    t1 = time.perf_counter()
    pred.predict(audio, render_batch=args.render_batch,
                 transfer=args.transfer,
                 write_video=not args.skip_video)
    predict_first_s = time.perf_counter() - t1

    stream_first = None
    if args.streaming:
        t2 = time.perf_counter()
        first = None
        for frames in pred.stream(audio, render_batch=args.render_batch,
                                  transfer=args.transfer,
                                  pipeline_depth=args.stream_depth):
            if first is None and len(frames):
                first = time.perf_counter() - t2
        stream_first = first

    out = {
        "setup_s": round(setup_s, 2),
        "predict_first_s": round(predict_first_s, 2),
        "boot_to_first_frame_s": round(setup_s + predict_first_s, 2),
        "stream_first_frame_s": (round(stream_first, 2)
                                 if stream_first is not None else None),
        "total_s": round(time.perf_counter() - t0, 2),
        "cache_dir": cache_dir,
        "quantize": bool(args.quantize),
        "transfer": args.transfer,
        "image_size": args.image_size,
        "artifact": artifact,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

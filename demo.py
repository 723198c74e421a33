#!/usr/bin/env python
"""End-to-end inference CLI (parity with the reference's demo.py surface).

Usage:
    python demo.py --id May --driving_audio ./data/input/00083.wav
    python demo.py --id Synthetic --driving_audio tone.wav   # no checkpoints needed

Loads the per-person YAML from ./config/<id>.yaml when present (reference
format, demo.py:59-62); the special id 'Synthetic' fabricates an asset
pack + random-init models so the whole pipeline runs without released
checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from os.path import join

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--id", default="May",
                        help="person id (Obama1, Obama2, May, Nadella, McStay, Synthetic)")
    parser.add_argument("--driving_audio", default="./data/input/00083.wav")
    parser.add_argument("--save_intermediates", type=int, default=0)
    parser.add_argument("--results_dir", default="./results")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--render_batch", type=int, default=8)
    parser.add_argument("--image_size", type=int, default=0,
                        help="override render resolution (synthetic only; 0 = config)")
    parser.add_argument("--duration", type=float, default=0.0,
                        help="optional cap on driving-audio seconds (0 = full)")
    parser.add_argument("--transfer", default="rgb",
                        choices=["rgb", "yuv420", "jpeg", "jpeg4", "pack4e"],
                        help="frame host-transfer format (yuv420 halves link "
                             "bytes; jpeg = on-device DCT code, ~11x fewer; "
                             "jpeg4 = 4-bit packed DCT code, ~21x fewer)")
    parser.add_argument("--streaming", action="store_true",
                        help="drive the live streaming pipeline (audio pushed "
                             "in 100ms chunks, frames emitted incrementally)")
    parser.add_argument("--bucket_seconds", type=float, default=0.0,
                        help="pad audio up to the next multiple of this many "
                             "seconds so every pipeline program compiles once "
                             "per bucket instead of once per clip length; "
                             "outputs are bit-identical to the unpadded run "
                             "(serve.py semantics). 0 = exact-length compile")
    parser.add_argument("--f2f_ckpt", default="",
                        help="orbax ckpt dir of a train.py feature2face "
                             "run (<checkpoints_dir>/<name>/ckpt): serve "
                             "the trained renderer (QAT tags stripped)")
    parser.add_argument("--a2f_ckpt", default="",
                        help="orbax ckpt dir of a train.py audio2feature run")
    parser.add_argument("--a2h_ckpt", default="",
                        help="orbax ckpt dir of a train.py audio2headpose run")
    parser.add_argument("--apc_ckpt", default="",
                        help="orbax ckpt dir of a train.py apc pretraining "
                             "run (the LLE feature bank must come from the "
                             "same encoder)")
    parser.add_argument("--quantize", action="store_true",
                        help="int8-quantize the renderer for inference "
                             "(2x int8 MXU peak on v5e; fidelity-tested "
                             "vs the float forward)")
    parser.add_argument("--artifact", default="",
                        help="serving-model .npz: load model trees from it "
                             "if it exists (skips checkpoint conversion + "
                             "quantize/calibrate), else save the trees "
                             "built this run to it")
    parser.add_argument("--no_calibrate", action="store_true",
                        help="with --quantize: keep dynamic per-conv "
                             "activation scales instead of calibrating "
                             "static scales on this clip's first frames "
                             "(static skips ~77 amax reductions per "
                             "forward; 257 -> 275 fps at 512^2)")
    parser.add_argument("--pipeline_depth", type=int, default=0,
                        help="with --streaming: double-buffer the render "
                             "fetch N pushes deep (frames identical, "
                             "handed back up to N pushes later; the host "
                             "fetch overlaps the next chunk's device work)")
    parser.add_argument("--fused", action="store_true",
                        help="run the motion half (mel->APC->LLE->mouth->"
                             "head-pose->post) as ONE device program (fewer "
                             "dispatch round-trips; merged stage timing)")
    args = parser.parse_args()

    from livespeechportraits_tpu.config import (
        PersonConfig, load_person_config, replace,
    )
    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.pipeline import video as video_mod

    cfg_path = join("./config", args.id + ".yaml")
    if os.path.exists(cfg_path):
        cfg = load_person_config(cfg_path, name=args.id)
    else:
        cfg = PersonConfig(name=args.id)

    audio_name = os.path.splitext(os.path.basename(args.driving_audio))[0]
    save_root = join(args.results_dir, args.id, audio_name)
    os.makedirs(save_root, exist_ok=True)

    if os.path.exists(args.driving_audio):
        audio = video_mod.load_wav(args.driving_audio)
    else:
        print(f"driving audio {args.driving_audio!r} not found; using a 3 s test tone")
        audio = video_mod.make_test_tone(3.0)
    if args.duration > 0:
        audio = audio[: int(args.duration * 16000)]

    if args.image_size and args.image_size & (args.image_size - 1):
        raise SystemExit(
            f"--image_size {args.image_size} must be a power of two: the "
            "U-Net halves the resolution per stage and odd intermediate "
            "sizes break the skip concatenation")
    if args.id == "Synthetic" or not cfg.data_root:
        if args.image_size:
            import math

            n_down = min(8, int(math.log2(args.image_size)))  # keep innermost >= 1px
            cfg = replace(cfg, feature2face=replace(
                cfg.feature2face, load_size=args.image_size, n_downsample=n_down))
        person_assets, person_models = assets_mod.make_synthetic_person(
            cfg, image_size=cfg.feature2face.load_size)
    else:
        person_assets = assets_mod.load_person(cfg)
        if args.artifact and os.path.exists(args.artifact):
            person_models = None  # artifact load below skips ckpt convert
        else:
            person_models = assets_mod.load_person_models(cfg)
    min_seconds = (cfg.audio2headpose.frame_future + 1) / 60.0
    if len(audio) < int(min_seconds * 16000) + 16000 // 60:
        raise SystemExit(
            f"driving audio too short: {len(audio)/16000:.2f}s; the head-pose "
            f"decoder predicts {cfg.audio2headpose.frame_future} frames ahead and "
            f"needs > {min_seconds:.2f}s of audio"
        )

    if args.f2f_ckpt or args.a2f_ckpt or args.a2h_ckpt or args.apc_ckpt:
        if args.artifact and os.path.exists(args.artifact):
            # never silently serve stale artifact weights over a
            # freshly named checkpoint
            raise SystemExit(
                f"--artifact {args.artifact} already exists and would "
                "shadow the --*_ckpt weights; delete it (it will be "
                "rebuilt from the checkpoints) or drop the ckpt flags")
        # train->serve loop: our own trainers' orbax checkpoints slot in
        # before quantization / artifact save, so both apply to them
        person_models = assets_mod.load_trained_person_models(
            cfg, base=person_models, f2f_ckpt=args.f2f_ckpt,
            a2f_ckpt=args.a2f_ckpt, a2h_ckpt=args.a2h_ckpt,
            apc_ckpt=args.apc_ckpt)
    if args.artifact and os.path.exists(args.artifact):
        person_models = assets_mod.load_models_artifact(args.artifact)
    elif args.quantize:
        calib = None
        calib_dtype = None
        if not args.no_calibrate:
            import jax.numpy as jnp

            calib = animate_mod.build_render_inputs(
                cfg, person_assets, person_models, audio, seed=args.seed,
                max_frames=max(args.render_batch, 8))
            if cfg.feature2face.precision == "bfloat16":
                calib_dtype = jnp.bfloat16
        person_models = assets_mod.quantize_person_models(
            person_models, calibrate_inputs=calib, calibrate_dtype=calib_dtype)
    if args.artifact and not os.path.exists(args.artifact):
        assets_mod.save_models_artifact(person_models, args.artifact)

    print(f"Animating {len(audio)/16000:.2f}s of audio for '{args.id}' ...")
    t0 = time.perf_counter()
    if args.streaming:
        ignored = [n for n, v in (("--save_intermediates",
                                   args.save_intermediates),
                                  ("--bucket_seconds", args.bucket_seconds),
                                  ("--fused", args.fused)) if v]
        if ignored:
            print(f"note: {', '.join(ignored)} have no effect with "
                  "--streaming (offline-path flags)")
        from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

        stream = StreamingAnimator(cfg, person_assets, person_models,
                                   seed=args.seed, render_batch=args.render_batch,
                                   transfer=args.transfer,
                                   pipeline_depth=args.pipeline_depth)
        chunks, first_frame_at = [], None
        for lo in range(0, len(audio), 1600):  # 100 ms pushes
            out = stream.push_audio(audio[lo : lo + 1600])
            if len(out):
                if first_frame_at is None:
                    first_frame_at = time.perf_counter() - t0
                chunks.append(out)
        tail = stream.flush()
        if len(tail):
            if first_frame_at is None:  # short clip and/or pipeline_depth:
                first_frame_at = time.perf_counter() - t0  # all at flush
            chunks.append(tail)
        frames = np.concatenate(chunks)
        wall = time.perf_counter() - t0
        print(f"streaming: first frame after {first_frame_at:.2f}s "
              f"(algorithmic latency {stream.latency_frames} frames); "
              f"{len(frames)} frames in {wall:.2f}s -> {len(frames)/wall:.1f} fps")
        out_path = join(save_root, audio_name + "_streamed.avi")
        video_mod.write_video(frames, out_path, audio)
        print(f"wrote {out_path}")
        return

    true_audio = audio
    valid_frames = None
    if args.bucket_seconds > 0:
        bucket = int(args.bucket_seconds * 16000)
        padded = -(-len(audio) // bucket) * bucket
        audio = np.pad(audio, (0, padded - len(audio)))
        valid_frames = int(len(true_audio) / 16000 * 60)

    result = animate_mod.animate(
        cfg, person_assets, person_models, audio,
        seed=args.seed, render_batch=args.render_batch,
        keep_feature_maps=bool(cfg.feature2face.save_input),
        transfer=args.transfer, valid_frames=valid_frames, fused=args.fused,
    )
    wall = time.perf_counter() - t0
    print(f"stages (ms): {json.dumps({k: round(v, 1) for k, v in result.stage_ms.items()})}")
    print(f"{result.nframe} frames in {wall:.2f}s -> {result.nframe / wall:.1f} fps end-to-end")

    out_path = join(save_root, audio_name + ".avi")
    video_mod.write_video(result.frames, out_path, true_audio)
    print(f"wrote {out_path}")
    if result.feature_maps is not None:
        fmap_path = join(save_root, audio_name + "_feature_maps.avi")
        video_mod.write_video(
            np.repeat(result.feature_maps[..., None], 3, axis=-1), fmap_path,
            true_audio)
        print(f"wrote {fmap_path}")
    if args.save_intermediates:
        video_mod.save_frames(result.frames, save_root, "pred_")
        np.save(join(save_root, "landmarks.npy"), result.landmarks)
        np.save(join(save_root, "headpose.npy"), result.headpose)
    print("Finish!")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fidelity comparison tool: score one pipeline run against another.

Compares the artifacts two runs produced (ours vs the reference demo's, or
any two of ours) and prints the BASELINE fidelity metrics:

    python tools/parity.py --landmarks_a a/landmarks.npy --landmarks_b b/landmarks.npy \
                           --video_a a/out.avi --video_b b/out.avi

Videos are compared frame-by-frame with PSNR and an LPIPS-style VGG
perceptual distance; landmark tracks with mean per-point L2 (px).
Run the reference's demo.py with --save_intermediates (or ours) to produce
the inputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# runnable from anywhere: the package lives one level above tools/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_video(path: str, max_frames: int = 0) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    if not frames:
        raise SystemExit(
            f"no frames decoded from {path!r} (missing file or unreadable "
            "codec) - refusing to report an empty parity comparison as "
            "success")
    return np.stack(frames)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--landmarks_a")
    p.add_argument("--landmarks_b")
    p.add_argument("--video_a")
    p.add_argument("--video_b")
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--vgg_weights", default="",
                   help="optional VGG19 .npz for the perceptual metric")
    p.add_argument("--pts3d_a", help="optional canonical [T,73,3] tracks: "
                                     "adds the pose-factored mouth rows")
    p.add_argument("--pts3d_b")
    p.add_argument("--pose_a", help="optional [T,6] head-pose tracks: adds "
                                    "the pose-realism Wasserstein rows")
    p.add_argument("--pose_b")
    p.add_argument("--f2f_ckpt", default="",
                   help="trained F2F checkpoint dir: scores the "
                        "d_feature_distance column in the trained "
                        "discriminator's own feature space (no external "
                        "weights needed)")
    p.add_argument("--person_yaml", default="",
                   help="person YAML for --f2f_ckpt's architecture "
                        "(defaults to the flagship 512^2 'large' config)")
    args = p.parse_args()

    from livespeechportraits_tpu.utils import metrics

    # the one shared report path (utils/metrics.fidelity_report): the e2e
    # subject eval (tools/e2e_subject.py --phases eval) produces the SAME
    # keys from the same functions, so released-checkpoint parity and the
    # from-scratch loop score on one scale
    la = np.load(args.landmarks_a) if args.landmarks_a else None
    lb = np.load(args.landmarks_b) if args.landmarks_b else None
    va = load_video(args.video_a, args.max_frames) if args.video_a else None
    vb = load_video(args.video_b, args.max_frames) if args.video_b else None
    d_params = None
    if args.f2f_ckpt:
        from livespeechportraits_tpu import config as config_mod
        from livespeechportraits_tpu.pipeline import assets as assets_mod

        if args.person_yaml:
            name = os.path.splitext(os.path.basename(args.person_yaml))[0]
            cfg = config_mod.load_person_config(args.person_yaml, name)
        else:
            from livespeechportraits_tpu.config import (
                Feature2FaceConfig, PersonConfig,
            )

            cfg = PersonConfig(name="Parity", feature2face=Feature2FaceConfig(
                size="large", ngf=64, n_downsample=8, load_size=512,
                precision="bfloat16"))
        d_params = assets_mod.load_trained_discriminator(cfg, args.f2f_ckpt)
    out = metrics.fidelity_report(
        frames_a=va, frames_b=vb, landmarks_a=la, landmarks_b=lb,
        vgg_weights_path=args.vgg_weights,
        pts3d_a=np.load(args.pts3d_a) if args.pts3d_a else None,
        pts3d_b=np.load(args.pts3d_b) if args.pts3d_b else None,
        pose_a=np.load(args.pose_a) if args.pose_a else None,
        pose_b=np.load(args.pose_b) if args.pose_b else None,
        d_params=d_params)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

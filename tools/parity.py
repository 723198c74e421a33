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
    args = p.parse_args()

    from livespeechportraits_tpu.models import losses
    from livespeechportraits_tpu.utils import metrics

    out = {}
    if args.landmarks_a and args.landmarks_b:
        la, lb = np.load(args.landmarks_a), np.load(args.landmarks_b)
        out["landmark_l2_px"] = metrics.landmark_l2(la, lb)
    if args.video_a and args.video_b:
        va = load_video(args.video_a, args.max_frames)
        vb = load_video(args.video_b, args.max_frames)
        n = min(len(va), len(vb))
        out["frames_compared"] = n
        if n:
            out["psnr_db"] = metrics.psnr(va[:n], vb[:n])
            vgg = (losses.load_vgg19_npz(args.vgg_weights) if args.vgg_weights
                   else losses.init_vgg19())
            out["perceptual_distance"] = metrics.perceptual_distance(
                vgg, va[:n], vb[:n])
            out["perceptual_note"] = ("pretrained VGG" if args.vgg_weights
                                      else "random-VGG (relative comparisons only)")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

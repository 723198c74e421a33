#!/usr/bin/env python
"""Export torchvision VGG19 conv weights to the .npz layout consumed by
models/losses.load_vgg19_npz.

This container has zero egress and no cached torch hub weights, so the
pretrained perceptual loss cannot be realised HERE (docs/TRAIN_512.md
documents the measured random-VGG ablation).  Anywhere with the weights
available, this closes the last gap to the reference's exact training
signal (ref losses.py:236-267):

    # online (downloads):
    python tools/export_vgg19.py vgg19.npz
    # or from a local torchvision/torch-hub state dict:
    python tools/export_vgg19.py vgg19.npz --state_dict vgg19-dcbb9e9d.pth

    train_feature2face(..., vgg_params=losses.load_vgg19_npz("vgg19.npz"))
"""

from __future__ import annotations

import argparse

import numpy as np


def export(out_path: str, state_dict=None) -> int:
    import torch

    if state_dict is None:
        from torchvision.models import vgg19

        model = vgg19(weights="IMAGENET1K_V1")
        state_dict = model.features.state_dict()
    elif isinstance(state_dict, str):
        sd = torch.load(state_dict, map_location="cpu", weights_only=True)
        # accept either a full-model or a features-only state dict
        state_dict = {
            k.removeprefix("features."): v
            for k, v in sd.items()
            if k.startswith("features.") or "." not in k.split(".", 1)[0]
        } or sd

    arrays = {}
    ci = 0
    # torchvision features keys: '<layer_idx>.weight' / '.bias' for convs;
    # sort by the integer index to keep conv order
    idxs = sorted({int(k.split(".")[0]) for k in state_dict if k.endswith(".weight")})
    for li in idxs:
        w = state_dict[f"{li}.weight"]
        b = state_dict[f"{li}.bias"]
        arrays[f"conv{ci}_w"] = np.asarray(w, dtype=np.float32)  # OIHW
        arrays[f"conv{ci}_b"] = np.asarray(b, dtype=np.float32)
        ci += 1
    assert ci == 16, f"expected 16 VGG19 convs, got {ci}"
    np.savez(out_path, **arrays)
    return ci


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .npz path")
    p.add_argument("--state_dict", default=None,
                   help="local .pth instead of downloading")
    args = p.parse_args()
    n = export(args.out, args.state_dict)
    print(f"wrote {n} conv layers to {args.out}")


if __name__ == "__main__":
    main()

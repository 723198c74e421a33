#!/usr/bin/env python
"""Build a servable subject pack from reference-format training clips.

    python tools/build_person.py --dataroot data/NewPerson \\
        --clip_names clip1,clip2 --apc_ckpt checkpoints/apc/ckpt

Writes mean_pts3d.npy, 3d_fit_data.npz, tracked3D points,
APC_feature_base.npy, camera_intrinsic.npy, shoulder files and
candidates/ into --dataroot, after which `demo.py --id NewPerson` (with
a config/NewPerson.yaml whose dataset_params.root points there) serves
the subject.  The reference ships these files pre-baked for its five
subjects and no code to produce them (pipeline/build_person.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True,
                   help="person root containing the clip directories; "
                        "serving files are written here")
    p.add_argument("--clip_names", required=True,
                   help="comma-separated clip directory names")
    p.add_argument("--apc_ckpt", default="",
                   help="APC encoder for the LLE feature bank: a "
                        "`train.py --task apc` orbax dir or a reference "
                        ".model file.  MUST match the encoder used at "
                        "inference; empty skips the bank (use_LLE=false)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--bank_stride", type=int, default=1,
                   help="keep every Nth frame of the APC feature bank "
                        "(bounds LLE KNN cost for long subjects)")
    p.add_argument("--prewarm", action="store_true",
                   help="after building, compile the serving stack into "
                        "the durable compile cache (tools/prewarm_serving)"
                        " so the subject's first real boot is a disk read "
                        "- pays the one-time minutes of remote XLA "
                        "compilation HERE, at pack-build time")
    args = p.parse_args()

    from livespeechportraits_tpu.config import APCConfig
    from livespeechportraits_tpu.pipeline import build_person
    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    apc_params = None
    if args.apc_ckpt and os.path.isdir(args.apc_ckpt):
        from livespeechportraits_tpu.models import apc as apc_model

        apc_params = apc_model.load_pretrained_encoder(args.apc_ckpt, APCConfig())
    elif args.apc_ckpt:
        from livespeechportraits_tpu.utils import torch_convert

        sd = torch_convert.load_state_dict_numpy(args.apc_ckpt)
        apc_params = torch_convert.convert_apc(sd, APCConfig())

    manifest = build_person.build_person_pack(
        args.dataroot, args.clip_names.split(","), apc_params=apc_params,
        image_size=args.image_size, bank_stride=args.bank_stride)
    for k, v in manifest.items():
        print(f"  {k:45s} {v}")
    name = os.path.basename(os.path.normpath(args.dataroot))
    print(f"pack written to {args.dataroot}")
    print(f"next: cp {os.path.join(args.dataroot, name + '.yaml')} "
          f"./config/{name}.yaml && python demo.py --id {name} "
          f"--driving_audio <wav> [--f2f_ckpt ... --a2f_ckpt ... "
          f"--a2h_ckpt ... --apc_ckpt ...]")

    if args.prewarm:
        import subprocess

        # the built YAML lives INSIDE dataroot (<dataroot>/<name>.yaml),
        # so that is the config_dir setup must search
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "prewarm_serving.py"),
             "--id", name, "--config_dir", args.dataroot,
             "--image_size", str(args.image_size)],
            check=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training CLI - the train.py the reference never shipped (SURVEY.md §3.2).

    python train.py --task audio2feature  --name a2f  [--synthetic]
    python train.py --task audio2headpose --name a2h  [--synthetic]
    python train.py --task feature2face   --name f2f  [--synthetic]

--synthetic fabricates training clips (random audio features + smooth
random motion) so every trainer runs end-to-end without subject data; with
a real data root the samplers expect reference-format per-clip files
(SURVEY.md §2.1 #21-22).
"""

from __future__ import annotations

import argparse

import numpy as np


def synthetic_clips(n_clips: int, frames: int, feat_dim: int = 512):
    from livespeechportraits_tpu.train import datasets

    rng = np.random.default_rng(0)
    clips = []
    for _ in range(n_clips):
        t = np.arange(frames)
        pose = np.stack([5 * np.sin(t / (13 + 3 * i)) for i in range(3)] +
                        [0.02 * np.cos(t / (17 + 2 * i)) for i in range(3)], axis=1)
        clips.append(datasets.make_clip(
            audio_features=rng.normal(0, 1, (2 * frames, feat_dim)).astype(np.float32),
            pts3d=rng.normal(0, 0.01, (frames, 73, 3)).astype(np.float32),
            rot_angles=pose[:, :3].astype(np.float32) + np.array([170.0, 0, 0], np.float32),
            trans=pose[:, 3:].astype(np.float32),
        ))
    return clips


def synthetic_face_data(n_frames: int, H: int, seed: int = 0,
                        device_rasterize: bool = False):
    """Structured synthetic renderer data with a real learning signal.

    Landmarks follow smooth head sway + mouth open/close over a plausible
    73-point face; the target frame is a deterministic stylised rendering
    of those same landmarks (edge glow over a vignette), so the GAN must
    actually learn the feature-map -> image mapping and the epoch panels
    show it happening (pure-noise targets can only converge to grey).
    """
    from livespeechportraits_tpu.config import MOUTH_INDICES
    from livespeechportraits_tpu.ops import rasterize
    from livespeechportraits_tpu.pipeline.assets import _synthetic_face_landmarks
    from livespeechportraits_tpu.train import datasets

    pts = _synthetic_face_landmarks()  # [73, 3], ~0.2 units, origin-centred
    f = H * 2.4
    t = np.arange(n_frames, dtype=np.float32)
    sway = np.stack(
        [0.02 * np.sin(t / 11.0), 0.015 * np.cos(t / 17.0), np.zeros_like(t)], axis=1)
    mouth_open = 0.5 + 0.5 * np.sin(t / 3.0)  # [0, 1]
    mouth = np.asarray(MOUTH_INDICES)

    xs = np.linspace(H * 0.2, H * 0.8, 9, dtype=np.float32)
    shoulders = np.concatenate([
        np.stack([xs, np.full(9, H * 0.8)], 1),
        np.stack([xs, np.full(9, H * 0.8 + 14)], 1),
    ]).astype(np.float32)

    from livespeechportraits_tpu.pipeline.synth_subject import stylise_edges

    lms, edges = [], []
    for i in range(n_frames):
        p = pts + sway[i]
        p[mouth, 1] = -0.05 + (pts[mouth, 1] + 0.05) * (1.0 + 1.5 * mouth_open[i]) + sway[i, 1]
        X = p + np.array([0.0, 0.05, 1.0], np.float32)
        lm = np.stack([f * X[:, 0] / X[:, 2] + H / 2,
                       f * X[:, 1] / X[:, 2] + H / 2], axis=1).astype(np.float32)
        e = rasterize.rasterize_feature_map_host(lm, shoulders, (H, H))
        lms.append(lm)
        edges.append(e)

    images = stylise_edges(np.stack(edges).astype(np.float32) / 255.0)
    cand = np.repeat(((images[0].astype(np.float32) / 255.0 - 0.5) / 0.5)[None], 4, 0)
    return datasets.FaceFrameSampler(images, np.stack(lms), shoulders, cand,
                                     load_size=H,
                                     device_rasterize=device_rasterize)


def synthetic_mels(n_utts: int, frames: int, mel_dim: int = 80):
    """Predictable synthetic log-mel sequences: smooth sums of slow
    sinusoidal formant tracks (plus a little noise), so future-frame
    prediction has real signal and the APC loss can actually fall."""
    rng = np.random.default_rng(0)
    t = np.arange(frames, dtype=np.float32)[:, None]
    bins = np.arange(mel_dim, dtype=np.float32)[None, :]
    utts = []
    for _ in range(n_utts):
        m = np.zeros((frames, mel_dim), np.float32)
        for _ in range(4):  # wandering formants
            centre = (mel_dim / 2) * (1 + np.sin(t / rng.uniform(40, 120)
                                                 + rng.uniform(0, 6)))
            width = rng.uniform(3, 8)
            m += np.exp(-((bins - centre) ** 2) / (2 * width * width))
        m += rng.normal(0, 0.02, m.shape)
        utts.append(np.clip(m, 0.0, 1.0).astype(np.float32))
    return utts


def _load_mels(args):
    """120 Hz log-mel sequences from reference-layout clip wavs."""
    import os

    from livespeechportraits_tpu.ops import mel as mel_ops
    from livespeechportraits_tpu.pipeline import video as video_mod

    if not args.dataroot or not args.clip_names:
        raise SystemExit("real-data training needs --dataroot and --clip_names "
                         "(or use --synthetic)")
    mels = []
    for name in args.clip_names.split(","):
        clip_root = os.path.join(args.dataroot, name)
        den = os.path.join(clip_root, name + "_denoise.wav")
        wav = den if os.path.exists(den) else os.path.join(clip_root, name + ".wav")
        mels.append(np.asarray(mel_ops.compute_mel_sequence(video_mod.load_wav(wav))))
    return mels


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True,
                   choices=["apc", "audio2feature", "audio2headpose",
                            "feature2face"])
    p.add_argument("--name", default=None)
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--synthetic", action="store_true",
                   help="train on fabricated data (smoke/e2e runs)")
    p.add_argument("--dataroot", default="",
                   help="subject data root (reference layout: <root>/<clip>/...)")
    p.add_argument("--clip_names", default="",
                   help="comma-separated clip directory names under --dataroot")
    p.add_argument("--apc_ckpt", default="",
                   help="APC encoder for feature precompute: a reference "
                        ".model file OR a `--task apc` run's orbax ckpt "
                        "directory")
    p.add_argument("--mel_window", type=int, default=480,
                   help="apc: training window length in 120 Hz mel frames")
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--n_epochs", type=int, default=2)
    p.add_argument("--n_epochs_decay", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all devices")
    p.add_argument("--zero1", action="store_true",
                   help="partition optimizer state over the data axis "
                        "(ZeRO-1; needs --data_parallel)")
    p.add_argument("--smooth_loss", type=float, default=0.0)
    p.add_argument("--loss", default="L2", choices=["L2", "GMM"],
                   help="audio2feature loss: MSE or the intended GMM NLL")
    p.add_argument("--TTUR", action="store_true")
    p.add_argument("--fused_step", action="store_true",
                   help="feature2face: one-program GAN step sharing the "
                        "G/D forward towers (faster; G sees the pre-update "
                        "D - see steps.make_f2f_fused_step)")
    p.add_argument("--remat", action="store_true",
                   help="feature2face: rematerialise the G forward in the "
                        "backward pass (memory lever for larger batches)")
    p.add_argument("--qat", action="store_true",
                   help="feature2face: quantization-aware training - the "
                        "generator forward runs the deployed int8 "
                        "arithmetic (STE fake-quant convs) so the weights "
                        "fine-tune onto the int8 grid before "
                        "quantize_generator deployment")
    p.add_argument("--qat_int8", action="store_true",
                   help="feature2face: QAT with the forward convs on the "
                        "REAL int8 MXU kernel (bit-identical to the "
                        "deployed quantized net, STE gradients; implies "
                        "--qat and runs the QAT forward at int8 speed)")
    p.add_argument("--qat_d", action="store_true",
                   help="feature2face: the discriminator's interior convs "
                        "run the int8 MXU kernel in training (STE "
                        "gradients; pure training-FLOPs lever - D never "
                        "deploys, checkpoints stay float)")
    p.add_argument("--vgg", default="none",
                   help="feature2face perceptual/style loss backbone: "
                        "'none', 'random' (random-init VGG19 - measured "
                        "strictly worse than none on the synthetic task, "
                        "docs/TRAIN_512.md), or a path to a torchvision "
                        "VGG19 .npz (losses.load_vgg19_npz)")
    p.add_argument("--vgg_microbatch", type=int, default=0,
                   help="chunk+rematerialise the VGG loss tower in "
                        "m-sample chunks (0 = unchunked): bounds its "
                        "activation memory so B>=16 512^2 training can "
                        "afford a perceptual loss")
    p.add_argument("--device_rasterize", action="store_true",
                   help="feature2face: rasterise edge maps on DEVICE per "
                        "batch instead of per-frame host cv2 (same kernel "
                        "as inference)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--sequence_length", type=int, default=240)
    p.add_argument("--time_frame_length", type=int, default=240)
    p.add_argument("--no_save_best", action="store_true",
                   help="do not keep <name>/ckpt_best (the lowest-"
                        "validation epoch; serving prefers it when present)")
    args = p.parse_args()

    from livespeechportraits_tpu.config import (
        Audio2FeatureConfig, Audio2HeadposeConfig, Feature2FaceConfig,
    )
    from livespeechportraits_tpu.train import datasets, trainer
    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()  # reruns/resumes reuse the step compiles

    loop = trainer.TrainLoopConfig(
        n_epochs=args.n_epochs, n_epochs_decay=args.n_epochs_decay,
        lr=args.lr, batch_size=args.batch_size, print_freq=args.print_freq,
        checkpoints_dir=args.checkpoints_dir,
        name=args.name or args.task,
        continue_train=args.continue_train,
        smooth_loss=args.smooth_loss, ttur=args.TTUR,
        data_parallel=args.data_parallel,
        fused_step=args.fused_step, remat=args.remat, qat=args.qat,
        qat_int8=args.qat_int8, qat_d=args.qat_d, zero1=args.zero1,
        vgg_microbatch=args.vgg_microbatch,
        save_best=not args.no_save_best,
    )

    if args.task == "apc":
        from livespeechportraits_tpu.config import APCConfig

        cfg = APCConfig()
        mels = synthetic_mels(4, 2400) if args.synthetic else _load_mels(args)
        n_val = max(1, len(mels) // 8) if len(mels) > 1 else 0
        sampler = datasets.MelWindowSampler(mels[n_val:] or mels,
                                            window=args.mel_window,
                                            stride=args.mel_window // 2)
        val_sampler = (datasets.MelWindowSampler(mels[:n_val],
                                                 window=args.mel_window)
                       if n_val else None)
        trainer.train_apc(cfg, loop, sampler, val_sampler)
    elif args.task == "audio2feature":
        cfg = Audio2FeatureConfig(loss=args.loss)
        clips = synthetic_clips(2, 1400) if args.synthetic else _load_real_clips(args)
        sampler = datasets.AudioVisualSampler(
            clips, task="audio2feature", seq_len=args.sequence_length,
            frame_jump_stride=4, device_audio=True)
        trainer.train_audio2feature(cfg, loop, sampler)
    elif args.task == "audio2headpose":
        cfg = Audio2HeadposeConfig()
        clips = synthetic_clips(2, 1800) if args.synthetic else _load_real_clips(args)
        sampler = datasets.AudioVisualSampler(
            clips, task="audio2headpose",
            target_length=args.time_frame_length,
            receptive_field=cfg.wavenet.receptive_field,
            frame_future=cfg.frame_future, device_audio=True)
        trainer.train_audio2headpose(cfg, loop, sampler)
    else:
        cfg = Feature2FaceConfig(load_size=args.image_size,
                                 n_downsample=min(8, int(np.log2(args.image_size))))
        if args.synthetic:
            sampler = synthetic_face_data(
                80, args.image_size, device_rasterize=args.device_rasterize)
        else:
            sampler = _load_real_face_data(args)
            for s in getattr(sampler, "samplers", [sampler]):
                s.device_rasterize = args.device_rasterize
        if args.vgg == "none":
            vgg_params = None
        else:
            from livespeechportraits_tpu.models import losses

            vgg_params = (losses.init_vgg19(0) if args.vgg == "random"
                          else losses.load_vgg19_npz(args.vgg))
        trainer.train_feature2face(cfg, loop, sampler, vgg_params=vgg_params)
    print("training done")


def _load_real_clips(args):
    """Reference-layout audio-visual clips: wav + 3d_fit_data.npz per clip,
    APC features computed once and cached (train/data_io.prepare_clip)."""
    import os

    import jax

    from livespeechportraits_tpu.config import APCConfig
    from livespeechportraits_tpu.models import apc as apc_model
    from livespeechportraits_tpu.train import data_io
    from livespeechportraits_tpu.utils import torch_convert

    if not args.dataroot or not args.clip_names:
        raise SystemExit("real-data training needs --dataroot and --clip_names "
                         "(or use --synthetic)")
    apc_cfg = APCConfig()
    if args.apc_ckpt and os.path.isdir(args.apc_ckpt):
        # a `train.py --task apc` run's own orbax checkpoint directory
        apc_params = apc_model.load_pretrained_encoder(args.apc_ckpt, apc_cfg)
    elif args.apc_ckpt:
        sd = torch_convert.load_state_dict_numpy(args.apc_ckpt)
        apc_params = torch_convert.convert_apc(sd, apc_cfg)
    else:
        print("WARNING: no --apc_ckpt; using random-init APC features "
              "(pretrain one: train.py --task apc)")
        apc_params = apc_model.init_apc(jax.random.PRNGKey(0), apc_cfg)
    clips = []
    for name in args.clip_names.split(","):
        clip_root = os.path.join(args.dataroot, name)
        clips.append(data_io.prepare_clip(clip_root, name, apc_params, apc_cfg))
    return clips


def _load_real_face_data(args):
    """Reference-layout renderer data: h5 jpg store + landmarks + candidates
    per clip, decoded lazily per sampled frame and spanning every clip
    (train/data_io.load_face_clip + datasets.ConcatFaceSampler;
    face_dataset.py:36-77)."""
    import os

    from livespeechportraits_tpu.train import data_io, datasets

    if not args.dataroot or not args.clip_names:
        raise SystemExit("real-data training needs --dataroot and --clip_names "
                         "(or use --synthetic)")
    samplers = [
        data_io.load_face_clip(os.path.join(args.dataroot, name), name,
                               load_size=args.image_size)
        for name in args.clip_names.split(",")
    ]
    return samplers[0] if len(samplers) == 1 else datasets.ConcatFaceSampler(samplers)


if __name__ == "__main__":
    main()

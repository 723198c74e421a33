"""Assemble a servable person pack from per-clip training data.

The reference's demo consumes a preprocessed subject directory
(mean_pts3d.npy, APC_feature_base.npy, candidates/, camera_intrinsic.npy,
shoulder files, concatenated fit data - demo.py:80-108) but ships no code
that produces one; its released subjects came with these files
pre-baked.  This module closes the onboarding loop for a NEW subject:
given reference-format *training* clips (the same per-clip files the
trainers read: wav + 3d_fit_data.npz + tracked points + h5 frames,
audiovisual_dataset.py:118-168 / face_dataset.py:75-150) and an APC
encoder (pretrained here via `train.py --task apc`, or converted), it
writes every file `assets.load_person` needs, so

    train all four stages -> build_person_pack -> demo.py --id <name>

works end-to-end with zero reference checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from livespeechportraits_tpu.config import MOUTH_INDICES


def _concat_fit_data(person_root: str, clip_names: Sequence[str]):
    """Concatenate each clip's 3d_fit_data.npz (+ tracked points when
    present) across clips, in clip order."""
    pts, rots, trans, tracked = [], [], [], []
    for name in clip_names:
        clip_root = os.path.join(person_root, name)
        fit = np.load(os.path.join(clip_root, "3d_fit_data.npz"))
        p = fit["pts_3d"].astype(np.float32)
        t = fit["trans"].astype(np.float32)
        if t.ndim == 2:  # [T, 3] -> the reference's [T, 3, 1] layout
            t = t[:, :, None]
        pts.append(p)
        rots.append(fit["rot_angles"].astype(np.float32))
        trans.append(t)
        tr_path = os.path.join(clip_root,
                               "tracked3D_normalized_pts_fix_contour.npy")
        tracked.append(np.load(tr_path).astype(np.float32)
                       if os.path.exists(tr_path) else p)
    return (np.concatenate(pts), np.concatenate(rots),
            np.concatenate(trans), np.concatenate(tracked))


def select_candidate_frames(landmarks2d: np.ndarray, n: int = 4) -> List[int]:
    """Pick `n` spread-out frames for the candidate-image set.

    The paper's candidates cover appearance extremes (mouth wide open /
    closed, head turned left / right) so the generator always has a
    nearby texture reference; the released packs chose them by hand.
    Heuristic stand-in: extremes of mouth vertical extent and of the
    face-contour horizontal offset (a yaw proxy), deduplicated.
    """
    lm = np.asarray(landmarks2d, np.float32)
    mouth = lm[:, list(MOUTH_INDICES), 1]
    openness = mouth.max(axis=1) - mouth.min(axis=1)
    yaw = lm[:, :15, 0].mean(axis=1) - lm[:, 35:46, 0].mean(axis=1)
    picks: List[int] = []
    for order in (np.argsort(-openness), np.argsort(openness),
                  np.argsort(-yaw), np.argsort(yaw)):
        # a clip shorter than n frames exhausts the unpicked indices
        fresh = next((int(i) for i in order if int(i) not in picks), None)
        if fresh is not None:
            picks.append(fresh)
        if len(picks) == n:
            break
    while len(picks) < n:  # tiny clips (< n frames): repeat round-robin
        picks.append(picks[len(picks) % len(lm)])
    return picks[:n]


def _build_candidates(person_root: str, clip_names: Sequence[str],
                      out_dir: str) -> Optional[str]:
    """Write candidates/normalized_full_{0..3}.jpg from the longest clip
    that has an h5 frame store + tracked 2D landmarks."""
    from PIL import Image

    from livespeechportraits_tpu.train import data_io

    best = None
    for name in clip_names:
        clip_root = os.path.join(person_root, name)
        h5_path = os.path.join(clip_root, name + ".h5")
        lm_path = os.path.join(clip_root,
                               "tracked2D_normalized_pts_fix_contour.npy")
        if os.path.exists(h5_path) and os.path.exists(lm_path):
            lm = np.load(lm_path).astype(np.float32)
            if best is None or len(lm) > len(best[2]):
                best = (clip_root, name, lm)
    if best is None:
        return None
    clip_root, name, lm = best
    frames = data_io.LazyH5Frames(
        os.path.join(clip_root, name + ".h5"), name,
        data_io.make_change_paras_normalise(clip_root))
    os.makedirs(out_dir, exist_ok=True)
    for j, idx in enumerate(select_candidate_frames(lm[: len(frames)])):
        Image.fromarray(frames[idx]).save(
            os.path.join(out_dir, f"normalized_full_{j}.jpg"))
    return name


def build_person_pack(
    person_root: str,
    clip_names: Sequence[str],
    apc_params: Optional[Any] = None,
    image_size: int = 512,
    bank_stride: int = 1,
) -> Dict[str, str]:
    """Write the serving-level subject files into `person_root`.

    Returns a manifest {filename: how it was produced}.  Existing
    candidate images are kept (they may be hand-picked); everything
    else is (re)derived from the clips.  `apc_params` builds the LLE
    feature bank - it MUST be the same encoder later used at inference
    (pass None to skip the bank, e.g. when use_LLE=false).
    """
    from livespeechportraits_tpu.train import data_io

    manifest: Dict[str, str] = {}
    pts, rots, trans, tracked = _concat_fit_data(person_root, clip_names)

    np.save(os.path.join(person_root, "mean_pts3d.npy"),
            tracked.mean(axis=0).astype(np.float32))
    manifest["mean_pts3d.npy"] = f"mean of {len(tracked)} tracked frames"
    np.savez(os.path.join(person_root, "3d_fit_data.npz"),
             pts_3d=pts, rot_angles=rots, trans=trans)
    manifest["3d_fit_data.npz"] = f"concatenated {len(clip_names)} clips"
    np.save(os.path.join(person_root,
                         "tracked3D_normalized_pts_fix_contour.npy"), tracked)
    manifest["tracked3D_normalized_pts_fix_contour.npy"] = "concatenated"

    # LLE feature bank: the target person's speech manifold (demo.py:105)
    if apc_params is not None:
        from livespeechportraits_tpu.pipeline import video as video_mod

        feats = []
        for name in clip_names:
            clip_root = os.path.join(person_root, name)
            den = os.path.join(clip_root, name + "_denoise.wav")
            wav = den if os.path.exists(den) else os.path.join(
                clip_root, name + ".wav")
            feats.append(data_io.compute_apc_features(
                video_mod.load_wav(wav), apc_params))
        bank = np.concatenate(feats)[::max(1, int(bank_stride))]
        np.save(os.path.join(person_root, "APC_feature_base.npy"), bank)
        manifest["APC_feature_base.npy"] = f"[{bank.shape[0]}, {bank.shape[1]}]"
    else:
        manifest["APC_feature_base.npy"] = "SKIPPED (no APC encoder given)"

    # camera intrinsics: tracker-provided when available, else a plausible
    # pinhole at the serving resolution (flagged - projections will only
    # be as good as this guess)
    cam_out = os.path.join(person_root, "camera_intrinsic.npy")
    for name in clip_names:
        src = os.path.join(person_root, name, "camera_intrinsic.npy")
        if os.path.exists(src):
            np.save(cam_out, np.load(src).astype(np.float32))
            manifest["camera_intrinsic.npy"] = f"copied from clip {name}"
            break
    else:
        if not os.path.exists(cam_out):
            f, c = image_size * 2.4, image_size / 2.0
            np.save(cam_out, np.array([[f, 0, c], [0, f, c], [0, 0, 1]],
                                      np.float32))
            manifest["camera_intrinsic.npy"] = "SYNTHESIZED pinhole fallback"
        else:
            manifest["camera_intrinsic.npy"] = "kept existing"

    # shoulders: 2D reference row + 3D points (assets.py reads frame [1]
    # of shoulder_points3D, mirroring demo.py:98-100)
    sh2d = None
    for name in clip_names:
        src = os.path.join(person_root, name, "normalized_shoulder_points.npy")
        if os.path.exists(src):
            sh2d = np.load(src).astype(np.float32)
            if sh2d.ndim == 3:  # per-frame [T, 18, 2] -> reference frame
                sh2d = sh2d[1 if len(sh2d) > 1 else 0]
            break
    if sh2d is None:
        xs = np.linspace(image_size * 0.2, image_size * 0.8, 9,
                         dtype=np.float32)
        sh2d = np.concatenate([
            np.stack([xs, np.full(9, image_size * 0.8, np.float32)], 1),
            np.stack([xs, np.full(9, image_size * 0.8 + 14, np.float32)], 1),
        ])
        manifest["normalized_shoulder_points.npy"] = "SYNTHESIZED fallback"
    else:
        manifest["normalized_shoulder_points.npy"] = "from clip data"
    np.save(os.path.join(person_root, "normalized_shoulder_points.npy"), sh2d)

    sh3d_out = os.path.join(person_root, "shoulder_points3D.npy")
    for name in clip_names:
        src = os.path.join(person_root, name, "shoulder_points3D.npy")
        if os.path.exists(src):
            np.save(sh3d_out, np.load(src).astype(np.float32))
            manifest["shoulder_points3D.npy"] = f"copied from clip {name}"
            break
    else:
        # back-project the 2D shoulders at the mean head depth so the
        # demo's shoulder deduction (demo.py:246-255) moves plausibly
        cam = np.load(cam_out)
        z = float(abs(trans[:, 2, 0].mean())) or 1.0
        x = (sh2d[:, 0] - cam[0, 2]) / cam[0, 0] * z
        y = (sh2d[:, 1] - cam[1, 2]) / cam[1, 1] * z
        sh3d = np.stack([x, y, np.full_like(x, z)], axis=1).astype(np.float32)
        np.save(sh3d_out, np.stack([sh3d, sh3d]))  # [2, 18, 3]; [1] is read
        manifest["shoulder_points3D.npy"] = "BACK-PROJECTED from 2D fallback"

    # candidate images (kept if already present - often hand-curated)
    cand_dir = os.path.join(person_root, "candidates")
    have = all(os.path.exists(os.path.join(cand_dir, f"normalized_full_{j}.jpg"))
               for j in range(4))
    if have:
        manifest["candidates/"] = "kept existing"
    else:
        src = _build_candidates(person_root, clip_names, cand_dir)
        manifest["candidates/"] = (
            f"4 spread frames from clip {src}" if src
            else "MISSING (no clip has an h5 frame store + 2D landmarks)")

    # per-person YAML (reference config/<id>.yaml format, e.g. May.yaml):
    # copy it to ./config/<id>.yaml and `demo.py --id <id>` boots the
    # pack.  ckp_path fields stay empty - a from-scratch subject's
    # weights come from this framework's trainers via the --*_ckpt flags
    # (assets.load_trained_person_models); load_person_models random-
    # inits stages with no torch checkpoint configured.
    name = os.path.basename(os.path.normpath(person_root))
    yaml_path = os.path.join(person_root, name + ".yaml")
    write_person_yaml(yaml_path, person_root,
                      use_lle=apc_params is not None)
    manifest[name + ".yaml"] = "person config (copy into ./config/)"
    return manifest


def write_person_yaml(path: str, person_root: str, use_lle: bool = True,
                      size: str = "large") -> None:
    """Emit the reference-format per-person YAML for a built pack
    (config.load_person_config reads it back; same knob surface as the
    reference's config/May.yaml)."""
    root = person_root.rstrip("/")
    text = f"""# Generated by pipeline/build_person.py - reference config/<id>.yaml format.
# ckp_path fields are empty: pass this framework's trainer checkpoints to
# demo.py via --apc_ckpt/--a2f_ckpt/--a2h_ckpt/--f2f_ckpt, or fill in
# converted reference .pkl paths.
model_params:
    APC:
        ckp_path: ''
        mel_dim: 80
        hidden_size: 512
        num_layers: 3
        residual: false
        use_LLE: {1 if use_lle else 0}
        Knear: 10
        LLE_percent: 1
    Audio2Mouth:
        ckp_path: ''
        smooth: 1.5
        AMP: ['XYZ', 2, 2, 2]
    Headpose:
        ckp_path: ''
        sigma: 0.3
        smooth: [5, 10]
        AMP: [1, 0.5]
        shoulder_AMP: 0.5
    Image2Image:
        ckp_path: ''
        size: '{size}'
        save_input: 0

dataset_params:
    root: '{root}/'
    fit_data_path: '{root}/3d_fit_data.npz'
    pts3d_path: '{root}/tracked3D_normalized_pts_fix_contour.npy'
"""
    with open(path, "w") as f:
        f.write(text)

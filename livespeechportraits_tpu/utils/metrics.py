"""Fidelity metrics: landmark L2 and VGG-space perceptual distance.

The BASELINE targets (BASELINE.md) call for landmark L2 and LPIPS parity
against reference outputs.  `landmark_l2` compares projected 2D landmark
tracks; `perceptual_distance` is an LPIPS-style normalised VGG feature
distance (exact LPIPS needs its learned per-channel weights, which are not
shipped in this image; with unit weights this is the standard 'VGG
distance' variant and is monotonic with LPIPS in practice).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.models import losses as losses_mod


def landmark_l2(pred: np.ndarray, ref: np.ndarray) -> float:
    """Mean per-landmark L2 distance in pixels; [T, N, 2] tracks."""
    pred, ref = np.asarray(pred), np.asarray(ref)
    T = min(pred.shape[0], ref.shape[0])
    return float(np.linalg.norm(pred[:T] - ref[:T], axis=-1).mean())


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / mse))


def fidelity_report(frames_a: Optional[np.ndarray] = None,
                    frames_b: Optional[np.ndarray] = None,
                    landmarks_a: Optional[np.ndarray] = None,
                    landmarks_b: Optional[np.ndarray] = None,
                    vgg_params=None,
                    vgg_weights_path: str = "",
                    pts3d_a: Optional[np.ndarray] = None,
                    pts3d_b: Optional[np.ndarray] = None,
                    pose_a: Optional[np.ndarray] = None,
                    pose_b: Optional[np.ndarray] = None,
                    d_params=None) -> dict:
    """The ONE fidelity report both harnesses produce: landmark L2 (px),
    frame PSNR (dB), the LPIPS-style VGG perceptual distance, and - when
    the extra inputs are given - the pose-factored geometry rows
    (canonical mouth-shape L2 from pts3d_*, pose-realism Wasserstein
    rows from pose_*) and the trained-discriminator feature distance
    (d_params from a trained F2F checkpoint - the GAN's own learned
    perceptual space, no external weights needed).

    `tools/parity.py` feeds it two runs' artifacts (ours vs the
    reference's released checkpoints, /root/reference/demo.py:144-171,
    the moment those appear); `tools/e2e_subject.py --phases eval` feeds
    it the served frames vs stored ground truth - same keys, same
    metrics, so the numbers are comparable across both paths."""
    out: dict = {}
    if landmarks_a is not None and landmarks_b is not None:
        out["landmark_l2_px"] = round(landmark_l2(landmarks_a, landmarks_b),
                                      3)
    if pts3d_a is not None and pts3d_b is not None:
        out.update(canonical_mouth_metrics(pts3d_a, pts3d_b))
    if pose_a is not None and pose_b is not None:
        out.update(pose_realism_w1(pose_a, pose_b))
    if frames_a is not None and frames_b is not None:
        n = min(len(frames_a), len(frames_b))
        out["frames_compared"] = n
        if n:
            out["psnr_db"] = round(psnr(frames_a[:n], frames_b[:n]), 2)
            if vgg_params is None:
                if vgg_weights_path:
                    vgg_params = losses_mod.load_vgg19_npz(vgg_weights_path)
                    out["perceptual_note"] = "pretrained VGG"
                else:
                    vgg_params = losses_mod.init_vgg19()
                    out["perceptual_note"] = ("random-VGG (relative "
                                              "comparisons only)")
            out["perceptual_distance"] = round(perceptual_distance(
                vgg_params, frames_a[:n], frames_b[:n]), 6)
            if d_params is not None:
                out["d_feature_distance"] = round(d_feature_distance(
                    d_params, frames_a[:n], frames_b[:n]), 6)
    return out


MOUTH_SLICE = slice(46, 64)  # the 73-pt layout's mouth block (demo.py:242)


def canonical_mouth_metrics(pred_pts3d: np.ndarray,
                            gt_pts3d: np.ndarray) -> dict:
    """Pose-factored mouth-shape errors, in the 3D canonical frame.

    Image-space mouth L2 is pose-contaminated: head pose is SAMPLED at
    inference (/root/reference/demo.py:203-215), so a motionless control
    can beat a well-trained predictor on it whenever the sampled pose
    wanders.  These rows compare mouth landmarks BEFORE pose projection
    (funcs/utils.py:231-242 is where pose enters), where motion quality
    is the only thing measured:

    - canon_mouth_l2: mean per-landmark L2 of canonical mouth positions.
    - canon_mouth_delta_l2: the same after subtracting each track's OWN
      time-mean mouth (rest pose).  A motionless control scores exactly
      the GT motion RMS here - the trained predictor must crush it.
    """
    p = np.asarray(pred_pts3d, np.float64)[:, MOUTH_SLICE]
    g = np.asarray(gt_pts3d, np.float64)[:, MOUTH_SLICE]
    T = min(p.shape[0], g.shape[0])
    p, g = p[:T], g[:T]
    l2 = np.linalg.norm(p - g, axis=-1).mean()
    pd = p - p.mean(axis=0, keepdims=True)
    gd = g - g.mean(axis=0, keepdims=True)
    dl2 = np.linalg.norm(pd - gd, axis=-1).mean()
    return {"canon_mouth_l2": round(float(l2), 5),
            "canon_mouth_delta_l2": round(float(dl2), 5)}


def _w1(a: np.ndarray, b: np.ndarray) -> float:
    """1-Wasserstein distance between two equal-size 1-D samples."""
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    return float(np.abs(np.sort(a)[:n] - np.sort(b)[:n]).mean())


def pose_realism_w1(pred_pose: np.ndarray, gt_pose: np.ndarray) -> dict:
    """Distribution-level head-pose realism: per-channel 1-Wasserstein
    distance between predicted and ground-truth VELOCITY (and
    acceleration) distributions, each normalised by the GT channel's
    std so channels average meaningfully.

    Head pose is sampled, not regressed (audio2headpose_model.py:169-187
    samples a GMM per frame), so trajectories are not comparable
    pointwise - but their DYNAMICS are: a well-trained sampler moves
    like the subject (same velocity spread), an untrained one jitters or
    freezes.  Constant convention offsets (+180 x-rot, mean translation)
    cancel in the differences."""
    p = np.asarray(pred_pose, np.float64)
    g = np.asarray(gt_pose, np.float64)
    T = min(p.shape[0], g.shape[0])
    p, g = p[:T], g[:T]
    out = {}
    for name, order in (("pose_vel_w1", 1), ("pose_acc_w1", 2)):
        pv = np.diff(p, n=order, axis=0)
        gv = np.diff(g, n=order, axis=0)
        stds = gv.std(axis=0)
        # channels the subject does not move (GT diff std ~ 0 - e.g. a
        # tracker that locks translation, or the synthetic subject's
        # fixed rot-z/trans) carry no realism information; dividing a
        # sampler's micro-motion there by ~0 swamps the average.  Score
        # only channels with at least 0.1% of the most-dynamic channel's
        # spread; if NO channel moves, report the unnormalised W1.
        live = stds > 1e-3 * stds.max()
        if not live.any():
            out[name] = round(float(np.mean(
                [_w1(pv[:, c], gv[:, c]) for c in range(p.shape[1])])), 4)
            continue
        per = [_w1(pv[:, c], gv[:, c]) / stds[c]
               for c in range(p.shape[1]) if live[c]]
        out[name] = round(float(np.mean(per)), 4)
    return out


def d_feature_distance(d_params, a: np.ndarray, b: np.ndarray,
                       cond: Optional[np.ndarray] = None,
                       chunk: int = 8) -> float:
    """Perceptual distance in the trained multiscale-PatchGAN
    discriminator's feature space - the GAN's OWN learned feature-match
    space (the reference's FM loss measures exactly this distance,
    feature2face_model.py:129-156), trained per-subject.  Unlike the
    random-VGG fallback this backbone has *learned* features whenever a
    trained F2F checkpoint exists, with zero external weights.

    cond: optional [T, H, W, C-3] conditioning (edge map + candidates)
    fed to both sides, as in FM training; zeros when absent (both sides
    off-distribution equally - the comparison stays meaningful).
    Frames are uint8 RGB [T, H, W, 3]."""
    from livespeechportraits_tpu.models import feature2face as f2f_model

    a = np.asarray(a)
    b = np.asarray(b)
    T, H, W = a.shape[:3]
    # conditioning channel count from the first conv's weights
    first = d_params["scales"][0]["layers"][0]["conv"]["w"]
    cond_ch = first.shape[2] - 3

    def _feats(img, c):
        inp = jnp.concatenate([c, img], axis=-1)
        res, _ = f2f_model.apply_discriminator(d_params, inp, training=False)
        return [f for scale in res for f in scale[:-1]]  # drop the logits

    vals, weights = [], []
    for i in range(0, T, chunk):
        n = min(chunk, T - i)
        xa = jnp.asarray(a[i:i + n], jnp.float32) / 127.5 - 1.0
        xb = jnp.asarray(b[i:i + n], jnp.float32) / 127.5 - 1.0
        if n < chunk:  # fixed compile shape
            pad = ((0, chunk - n), (0, 0), (0, 0), (0, 0))
            xa, xb = jnp.pad(xa, pad), jnp.pad(xb, pad)
        if cond is not None:
            cc = jnp.asarray(cond[i:i + n], jnp.float32)
            if n < chunk:
                cc = jnp.pad(cc, ((0, chunk - n), (0, 0), (0, 0), (0, 0)))
        else:
            cc = jnp.zeros((chunk, H, W, cond_ch), jnp.float32)
        fa, fb = _feats(xa, cc), _feats(xb, cc)
        total = 0.0
        for ya, yb in zip(fa, fb):
            na = ya / (jnp.linalg.norm(ya, axis=-1, keepdims=True) + 1e-10)
            nb = yb / (jnp.linalg.norm(yb, axis=-1, keepdims=True) + 1e-10)
            # padded frames are identical in both inputs -> contribute 0;
            # undo their dilution of the mean
            total = total + jnp.mean((na - nb) ** 2) * (chunk / n)
        vals.append(float(total) / len(fa))
        weights.append(n)
    return float(np.average(vals, weights=weights))


def perceptual_distance(vgg_params, a: np.ndarray, b: np.ndarray,
                        chunk: int = 8) -> float:
    """LPIPS-style distance between uint8 RGB frames [T, H, W, 3]:
    channel-normalised VGG features, mean squared difference per slice.

    Frames run through VGG in fixed `chunk`-size batches: a whole clip at
    once would materialise ~25 GB of relu_1 features for 10 s of 512^2
    video, and every distinct T would trace a new program."""
    T = a.shape[0]

    def _dist(xa, xb):
        fa = losses_mod.vgg19_features(vgg_params, xa)
        fb = losses_mod.vgg19_features(vgg_params, xb)
        total = 0.0
        for ya, yb in zip(fa, fb):
            na = ya / (jnp.linalg.norm(ya, axis=-1, keepdims=True) + 1e-10)
            nb = yb / (jnp.linalg.norm(yb, axis=-1, keepdims=True) + 1e-10)
            total = total + jnp.mean((na - nb) ** 2)
        return total / len(fa)

    vals = []
    for i in range(0, T, chunk):
        xa = jnp.asarray(a[i:i + chunk], jnp.float32) / 127.5 - 1.0
        xb = jnp.asarray(b[i:i + chunk], jnp.float32) / 127.5 - 1.0
        n = xa.shape[0]
        if n < chunk:  # pad to the fixed compile shape
            pad = ((0, chunk - n), (0, 0), (0, 0), (0, 0))
            xa, xb = jnp.pad(xa, pad), jnp.pad(xb, pad)
            # padded frames are identical in both inputs, so they add 0 to
            # the feature difference but dilute the batch mean by n/chunk;
            # undo the dilution
            vals.append(float(_dist(xa, xb)) * chunk / n)
        else:
            vals.append(float(_dist(xa, xb)))
    return float(np.average(vals, weights=[min(chunk, T - i)
                                           for i in range(0, T, chunk)]))

"""Synthesize a reference-format raw-clip subject with learnable structure.

The reference ships five pre-baked subject packs and no code to produce
one (its demo only READS, /root/reference/demo.py:80-108); our
pipeline/build_person.py closes the onboarding gap given raw training
clips.  This module fabricates those raw clips so the ENTIRE loop -
clip -> APC pretrain -> build pack -> train A2F/A2H/F2F -> serve ->
score on held-out data - runs with zero released data (tools/
e2e_subject.py drives it; docs/E2E_SUBJECT.md records the run).

Every mapping in the generated subject is deterministic and learnable:

- audio -> mouth: the wav is a tone whose amplitude envelope is a sum of
  incommensurate sinusoids; inner-mouth landmarks (rows 46:64 - exactly
  the rows the serving pipeline reconstructs, pipeline/animate._jit_post)
  open proportionally to that envelope.  Frame-rate energy is trivially
  recoverable from the log-mels the APC encoder consumes, so
  Audio2Feature has real signal.
- audio -> head pose: rotation angles follow a low-passed copy of the
  same envelope (small, a few degrees), translation is constant - so
  Audio2Headpose's GMM has a deterministic target at sigma_scale 0 and
  the shoulder deduction stays exactly static.
- landmarks -> frame: the target frames are a deterministic stylisation
  (edge glow over a vignette, shared with train.synthetic_face_data)
  of the SAME rasterised edge maps the renderer consumes, so
  Feature2Face must genuinely learn the edge->image mapping and a
  perfectly trained pipeline reproduces the held-out frames exactly.

Conventions matched to the serving path (all verified against
pipeline/animate.py + pipeline/assets.load_person + train/datasets.py):

- raw rot_x sits near -180 deg: datasets.make_clip remaps it to ~0 and
  _jit_post adds the 180 back (demo.py:232 parity), and Euler angles are
  360-periodic so projecting with the raw angles is identical.
- trans is constant [0, 0, 1]: the pack's mean_translation then equals
  it, the A2H target velocity is zero, and project_shoulders' deduction
  (trans - ref_trans) vanishes -> shoulders match the static GT rows.
- the face spans > half the frame (FACE_SCALE): FaceFrameSampler's
  face-centred crop (train/datasets.py crop_coords) then clamps to the
  whole 512 frame, so F2F trains on exactly the full-frame framing the
  serving rasteriser produces.
- only rows 46:64 animate; jaw/contour MOUTH rows 4:11 stay static
  because _jit_post discards them from the prediction, and eyebrows stay
  static so the serving eyebrow cycling (candidate_eye_brow deltas = 0)
  is a no-op.
"""

from __future__ import annotations

import io
import os
from typing import Dict, Optional

import numpy as np

FPS = 60
SR = 16000
FACE_SCALE = 1.8  # projected face width ~440 px of 512 (see module doc)
TRANS = np.array([0.0, 0.0, 1.0], np.float32)  # y=0: the face (with
# its mouth fully open and the pose sway) stays fully inside the frame


def envelope(n_frames: int, seed: int = 0) -> np.ndarray:
    """Smooth amplitude envelope in [0.05, 1] at frame rate: a product of
    incommensurate sinusoids (never periodic over a clip) with a floor so
    the carrier never fully vanishes (silent frames would make the
    audio->mouth inverse ill-posed)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_frames, dtype=np.float64) / FPS
    p1, p2, p3 = rng.uniform(0, 2 * np.pi, 3)
    e = (0.5 + 0.5 * np.sin(2 * np.pi * 0.43 * t + p1)
         * np.cos(2 * np.pi * 0.091 * t + p2))
    e = 0.7 * e + 0.3 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.17 * t + p3))
    return np.clip(e, 0.05, 1.0).astype(np.float32)


def lowpass(x: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian lowpass with reflect padding (matches the serving
    smoother's edge handling closely enough for generation)."""
    r = max(1, int(3 * sigma))
    k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    k /= k.sum()
    xp = np.pad(x, r, mode="reflect")
    return np.convolve(xp, k, mode="valid").astype(np.float32)


def make_audio(env: np.ndarray, seed: int = 0) -> np.ndarray:
    """Envelope at frame rate -> [-1, 1] float wav at 16 kHz.

    Carrier pitch wobbles slowly (distinct mel shapes over time) and the
    sample-level amplitude is the linearly interpolated envelope, so the
    frame-rate energy the mels carry IS the mouth-opening signal."""
    rng = np.random.default_rng(seed + 1)
    n = int(len(env) / FPS * SR)
    ts = np.arange(n, dtype=np.float64) / SR
    amp = np.interp(ts, np.arange(len(env)) / FPS, env.astype(np.float64))
    freq = 220.0 + 40.0 * np.sin(2 * np.pi * 0.073 * ts
                                 + rng.uniform(0, 2 * np.pi))
    phase = 2 * np.pi * np.cumsum(freq) / SR
    wav = amp * (0.8 * np.sin(phase) + 0.2 * np.sin(2 * phase))
    return (0.95 * wav / np.abs(wav).max()).astype(np.float32)


def stylise_edges(edges: np.ndarray) -> np.ndarray:
    """[B, H, W] edge maps in [0, 1] -> [B, H, W, 3] uint8 frames.

    The same deterministic stylisation as train.synthetic_face_data (edge
    glow over a radial vignette): a fixed, learnable landmark->image
    mapping with structure at every scale the U-Net sees."""
    B, H, W = edges.shape
    e = edges.astype(np.float32) * 255.0
    try:
        import cv2

        g = np.stack([cv2.GaussianBlur(ei, (0, 0), 3) for ei in e])
    except ImportError:  # pragma: no cover
        g = e
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r = np.hypot(xx - W / 2, yy - H / 2) / max(H, W)
    vign = (np.clip(1.2 - 1.4 * r, 0.0, 1.0) * 70.0 + 30.0)[None]
    return np.stack([
        np.clip(vign + 0.7 * g, 0, 255),
        np.clip(0.8 * vign + 0.9 * e, 0, 255),
        np.clip(0.6 * vign + 0.5 * g, 0, 255),
    ], axis=-1).astype(np.uint8)


def subject_pts3d(n_frames: int, seed: int = 0,
                  env: Optional[np.ndarray] = None) -> np.ndarray:
    """[T, 73, 3] tracked (head-pose-free) landmarks: static face with the
    inner mouth (rows 46:64) opening with the envelope."""
    from livespeechportraits_tpu.pipeline.assets import (
        _synthetic_face_landmarks,
    )

    if env is None:
        env = envelope(n_frames, seed)
    base = _synthetic_face_landmarks()  # [73, 3], ~0.2 units
    pts = np.repeat(base[None], n_frames, axis=0)
    m = slice(46, 64)
    # open about the mouth vertical centre; only rows 46:64 move (the rows
    # _jit_post reconstructs; everything else must stay static for a
    # perfect pipeline to reproduce the clip exactly)
    c = -0.05
    pts[:, m, 1] = c + (base[None, m, 1] - c) * (1.0 + 1.5 * env[:, None])
    return (pts * FACE_SCALE).astype(np.float32)


def subject_headpose(n_frames: int, seed: int = 0,
                     env: Optional[np.ndarray] = None):
    """(rot_angles [T, 3] deg, trans [T, 3, 1]): rotation a few degrees,
    driven by a low-passed envelope (audio-recoverable); translation
    constant (see module doc)."""
    if env is None:
        env = envelope(n_frames, seed)
    slow = lowpass(env, 30.0)
    slow = slow - slow.mean()
    rot = np.stack([
        -180.0 + 3.0 * slow,         # raw x near -180 (make_clip remaps)
        2.0 * lowpass(env, 45.0) - 2.0 * np.mean(lowpass(env, 45.0)),
        np.zeros(n_frames, np.float32),
    ], axis=1).astype(np.float32)
    trans = np.repeat(TRANS[None, :, None], n_frames, axis=0)
    return rot, trans.astype(np.float32)


def camera_matrix(image_size: int = 512) -> np.ndarray:
    """The same pinhole build_person_pack synthesizes (f = 2.4 * size)."""
    f, c = image_size * 2.4, image_size / 2.0
    return np.array([[f, 0, c], [0, f, c], [0, 0, 1]], np.float32)


def default_shoulders(image_size: int = 512) -> np.ndarray:
    """[18, 2] static shoulder rows (same layout as make_synthetic_person)."""
    xs = np.linspace(image_size * 0.2, image_size * 0.8, 9, dtype=np.float32)
    y = image_size * 0.8
    return np.concatenate([
        np.stack([xs, np.full(9, y, np.float32)], 1),
        np.stack([xs, np.full(9, y + 14, np.float32)], 1),
    ])


def project_clip(pts3d: np.ndarray, rot: np.ndarray, trans: np.ndarray,
                 image_size: int = 512) -> np.ndarray:
    """[T, 73, 2] GT 2D landmarks via the SAME projection the serving
    pipeline uses (ops/geometry.project_landmarks; Euler angles are
    360-periodic so raw angles give the identical R as the remap+180)."""
    import jax.numpy as jnp

    from livespeechportraits_tpu.ops import geometry

    K = jnp.asarray(camera_matrix(image_size))
    head = jnp.asarray(
        np.concatenate([rot, trans[:, :, 0]], axis=1), jnp.float32)
    lm = geometry.project_landmarks(K, jnp.eye(3), jnp.zeros(3), 1.0, head,
                                    jnp.asarray(pts3d))
    return np.asarray(lm, np.float32)


def render_clip_frames(landmarks2d: np.ndarray, shoulders: np.ndarray,
                       image_size: int = 512, batch: int = 32) -> np.ndarray:
    """GT frames: device-rasterised edge maps (the SAME rasteriser the
    renderer consumes, ops/rasterize.rasterize_feature_maps) stylised
    deterministically.  Returns [T, H, W, 3] uint8."""
    import jax.numpy as jnp

    from livespeechportraits_tpu.ops import rasterize

    T = landmarks2d.shape[0]
    sh = np.repeat(shoulders[None], min(batch, T), axis=0)
    out = []
    for lo in range(0, T, batch):
        lm = jnp.asarray(landmarks2d[lo:lo + batch])
        edges = np.asarray(rasterize.rasterize_feature_maps(
            lm, jnp.asarray(sh[: lm.shape[0]]), (image_size, image_size)))
        out.append(stylise_edges(edges))
    return np.concatenate(out)


def write_raw_clip(person_root: str, name: str, n_frames: int,
                   seed: int = 0, image_size: int = 512,
                   with_face: bool = True, jpg_quality: int = 97) -> Dict:
    """Write one reference-format raw training clip under
    <person_root>/<name>/ (wav + 3d_fit_data.npz + tracked points + h5
    frame store + 2D landmarks + shoulders + change_paras + camera), i.e.
    exactly the files train.py's real-data loaders and
    pipeline/build_person.py consume.  Returns the ground truth
    {env, pts3d, rot, trans, landmarks2d, shoulders} for scoring."""
    import h5py
    from PIL import Image
    from scipy.io import wavfile

    root = os.path.join(person_root, name)
    os.makedirs(root, exist_ok=True)

    env = envelope(n_frames, seed)
    wav = make_audio(env, seed)
    wavfile.write(os.path.join(root, name + ".wav"), SR,
                  (wav * 32767).astype(np.int16))

    pts3d = subject_pts3d(n_frames, seed, env)
    rot, trans = subject_headpose(n_frames, seed, env)
    np.savez(os.path.join(root, "3d_fit_data.npz"),
             pts_3d=pts3d, rot_angles=rot, trans=trans)
    np.save(os.path.join(root, "tracked3D_normalized_pts_fix_contour.npy"),
            pts3d)
    np.save(os.path.join(root, "camera_intrinsic.npy"),
            camera_matrix(image_size))

    shoulders = default_shoulders(image_size)
    lm2d = project_clip(pts3d, rot, trans, image_size)
    gt = {"env": env, "pts3d": pts3d, "rot": rot, "trans": trans,
          "landmarks2d": lm2d, "shoulders": shoulders, "wav": wav}
    np.save(os.path.join(root, "normalized_shoulder_points.npy"),
            np.repeat(shoulders[None], n_frames, axis=0))
    if not with_face:
        return gt

    np.save(os.path.join(root, "tracked2D_normalized_pts_fix_contour.npy"),
            lm2d)
    frames = render_clip_frames(lm2d, shoulders, image_size)
    with h5py.File(os.path.join(root, name + ".h5"), "w") as f:
        ds = f.create_dataset(
            name, (n_frames,), dtype=h5py.vlen_dtype(np.dtype("uint8")))
        for i in range(n_frames):
            buf = io.BytesIO()
            # subsampling=0: PIL's default 4:2:0 chroma subsampling costs
            # ~14 dB on these sharp synthetic edges (30.7 -> 48 dB at q97)
            # and would cap every downstream PSNR eval
            Image.fromarray(frames[i]).save(buf, format="JPEG",
                                            quality=jpg_quality,
                                            subsampling=0)
            ds[i] = np.frombuffer(buf.getvalue(), np.uint8)
    # frames are authored at the serving resolution: identity normalise
    np.savez(os.path.join(root, "change_paras.npz"),
             scale=np.float32(512.0 / image_size),
             xc=np.int32(256), yc=np.int32(256))
    return gt

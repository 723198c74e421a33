"""Smoke test for the fidelity comparison CLI."""

import json
import subprocess
import sys

import numpy as np


def test_parity_cli(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    la = rng.uniform(0, 512, (20, 73, 2)).astype(np.float32)
    lb = la + 1.0
    np.save(tmp_path / "a.npy", la)
    np.save(tmp_path / "b.npy", lb)

    frames = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    for name in ["a.avi", "b.avi"]:
        out = cv2.VideoWriter(str(tmp_path / name), cv2.VideoWriter_fourcc(*"DIVX"),
                              60, (64, 64))
        for f in frames:
            out.write(f)
        out.release()

    proc = subprocess.run(
        [sys.executable, "tools/parity.py",
         "--landmarks_a", str(tmp_path / "a.npy"),
         "--landmarks_b", str(tmp_path / "b.npy"),
         "--video_a", str(tmp_path / "a.avi"),
         "--video_b", str(tmp_path / "b.avi")],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().split("\n")[-1] if "{" not in proc.stdout[:1]
                     else proc.stdout[proc.stdout.index("{"):])
    assert out["landmark_l2_px"] == __import__("pytest").approx(np.sqrt(2), rel=1e-3)
    assert out["frames_compared"] == 8
    assert out["psnr_db"] > 20  # identical videos modulo codec loss


def test_fidelity_report_shared_by_parity_and_e2e_eval():
    """parity.py and e2e_subject's eval both print
    utils.metrics.fidelity_report keys - ONE report path, so a released-
    checkpoint comparison and the from-scratch loop score on one scale."""
    from livespeechportraits_tpu.utils.metrics import fidelity_report

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-6, 6, a.shape), 0,
                255).astype(np.uint8)
    la = rng.uniform(0, 32, (4, 73, 2)).astype(np.float32)
    r = fidelity_report(frames_a=a, frames_b=b, landmarks_a=la,
                        landmarks_b=la + 2.0)
    assert r["frames_compared"] == 4
    assert r["landmark_l2_px"] == __import__("pytest").approx(
        np.sqrt(8), rel=1e-3)
    assert 20 < r["psnr_db"] < 60
    assert r["perceptual_distance"] >= 0
    assert "random-VGG" in r["perceptual_note"]
    # landmark-only and frames-only calls degrade gracefully
    assert set(fidelity_report(landmarks_a=la, landmarks_b=la)) == {
        "landmark_l2_px"}
    assert "landmark_l2_px" not in fidelity_report(frames_a=a, frames_b=b)


def test_canonical_mouth_metrics_decisive_vs_motionless_control():
    """The pose-factored mouth rows must (a) score a perfect prediction
    at ~0 and (b) charge a MOTIONLESS control exactly the GT motion
    magnitude - the decisiveness the image-space mouth L2 lacks
    (pose is sampled, demo.py:203-215)."""
    from livespeechportraits_tpu.utils.metrics import canonical_mouth_metrics

    rng = np.random.default_rng(0)
    T = 120
    base = rng.normal(0, 0.05, (73, 3))
    motion = np.zeros((T, 73, 3))
    motion[:, 46:64] = 0.01 * np.sin(
        np.linspace(0, 8 * np.pi, T))[:, None, None]
    gt = base[None] + motion

    perfect = canonical_mouth_metrics(gt, gt)
    assert perfect["canon_mouth_l2"] == 0.0
    assert perfect["canon_mouth_delta_l2"] == 0.0

    frozen = canonical_mouth_metrics(np.repeat(base[None], T, 0), gt)
    # the delta row charges the frozen control the GT motion magnitude
    gt_motion = np.linalg.norm(
        motion[:, 46:64] - motion[:, 46:64].mean(0, keepdims=True),
        axis=-1).mean()
    np.testing.assert_allclose(frozen["canon_mouth_delta_l2"], gt_motion,
                               rtol=1e-3)
    # a constant rest-pose offset must NOT move the delta row
    shifted = canonical_mouth_metrics(gt + 0.5, gt)
    assert shifted["canon_mouth_delta_l2"] < 1e-6
    assert shifted["canon_mouth_l2"] > 0.4


def test_pose_realism_w1_separates_dynamics():
    """Same dynamics -> ~0; frozen pose -> ~the normalised GT velocity
    scale; offset conventions (+180 rot-x, mean translation) cancel."""
    from livespeechportraits_tpu.utils.metrics import pose_realism_w1

    rng = np.random.default_rng(1)
    T = 400
    t = np.linspace(0, 20, T)
    gt = np.stack([np.sin(t * (1 + 0.1 * c)) for c in range(6)], axis=1)
    gt += rng.normal(0, 0.02, gt.shape)

    same = pose_realism_w1(gt + np.array([180, 0, 0, 1, 2, 3]), gt)
    assert same["pose_vel_w1"] < 1e-6 and same["pose_acc_w1"] < 1e-6

    other = np.stack([np.sin(t * (1 + 0.1 * c) + 0.7) for c in range(6)],
                     axis=1) + rng.normal(0, 0.02, gt.shape)
    close = pose_realism_w1(other, gt)  # same distribution, other phase
    frozen = pose_realism_w1(np.zeros_like(gt), gt)
    assert close["pose_vel_w1"] < 0.2
    assert frozen["pose_vel_w1"] > 5 * close["pose_vel_w1"]


def test_pose_realism_w1_ignores_frozen_gt_channels():
    """Channels the subject never moves (GT diff std ~ 0, e.g. locked
    translation) must not blow up the score: a sampler with micro-motion
    there used to divide by ~0 and read WORSE than a frozen head."""
    from livespeechportraits_tpu.utils.metrics import pose_realism_w1

    rng = np.random.default_rng(2)
    T = 400
    t = np.linspace(0, 20, T)
    gt = np.zeros((T, 6))
    gt[:, 0] = np.sin(t) + rng.normal(0, 0.02, T)
    gt[:, 1] = np.cos(1.3 * t) + rng.normal(0, 0.02, T)
    # gt rot-z + trans frozen (the synthetic subject's layout)

    good = gt.copy() + rng.normal(0, 1e-4, gt.shape)  # micro-noise all chans
    frozen = np.zeros_like(gt)
    w_good = pose_realism_w1(good, gt)
    w_frozen = pose_realism_w1(frozen, gt)
    assert w_good["pose_vel_w1"] < 0.2, w_good
    assert w_frozen["pose_vel_w1"] > 5 * w_good["pose_vel_w1"]

    # fully-static GT degenerates to the unnormalised W1, not a div-by-0
    allzero = pose_realism_w1(np.zeros((T, 6)), np.zeros((T, 6)))
    assert allzero["pose_vel_w1"] == 0.0


def test_d_feature_distance_properties():
    """Identity -> 0; sensitive to content; deterministic; chunk-size
    invariant (incl. a ragged tail)."""
    import jax

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f
    from livespeechportraits_tpu.utils.metrics import d_feature_distance

    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5,
                             load_size=32, ndf=8, num_D=2, n_layers_D=2)
    d = f2f.init_discriminator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    assert d_feature_distance(d, a, a) == 0.0
    dist = d_feature_distance(d, a, b)
    assert dist > 0
    np.testing.assert_allclose(d_feature_distance(d, a, b, chunk=2), dist,
                               rtol=1e-4)


def test_fidelity_report_new_rows():
    from livespeechportraits_tpu.utils.metrics import fidelity_report

    rng = np.random.default_rng(3)
    p3 = rng.normal(size=(20, 73, 3))
    pose = rng.normal(size=(20, 6))
    r = fidelity_report(pts3d_a=p3, pts3d_b=p3, pose_a=pose, pose_b=pose)
    assert set(r) == {"canon_mouth_l2", "canon_mouth_delta_l2",
                      "pose_vel_w1", "pose_acc_w1"}
    assert r["canon_mouth_l2"] == 0.0 and r["pose_vel_w1"] == 0.0

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

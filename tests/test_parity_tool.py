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

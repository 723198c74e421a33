"""New-subject onboarding: build a servable person pack from raw
training clips (pipeline/build_person.py), then load and animate it.
The reference ships pre-baked packs for its five subjects and no
builder (demo.py:80-108 only reads)."""

import io
import os

import numpy as np
import pytest

from livespeechportraits_tpu.pipeline import build_person


def _write_clip(person_root, name, T=600, H=64, seed=0, with_face=True,
                with_wav=True):
    """Reference-format training clip: wav + fit data + tracked points,
    plus the renderer-side h5/landmark/shoulder files."""
    import h5py
    from PIL import Image
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    root = person_root / name
    root.mkdir(parents=True, exist_ok=True)
    if with_wav:
        sr = 16000
        t = np.arange(int(T / 60 * sr)) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        wavfile.write(str(root / f"{name}.wav"), sr,
                      (wav * 32767).astype(np.int16))
    np.savez(str(root / "3d_fit_data.npz"),
             pts_3d=rng.normal(0, 0.05, (T, 73, 3)).astype(np.float32),
             rot_angles=rng.uniform(-170, 170, (T, 3)).astype(np.float32),
             trans=rng.normal(0, 0.1, (T, 3, 1)).astype(np.float32) + 1.0)
    np.save(str(root / "tracked3D_normalized_pts_fix_contour.npy"),
            rng.normal(0, 0.05, (T, 73, 3)).astype(np.float32))
    if not with_face:
        return root
    N = 12
    with h5py.File(str(root / f"{name}.h5"), "w") as f:
        ds = f.create_dataset(name, (N,), dtype=h5py.vlen_dtype(np.dtype("uint8")))
        for i in range(N):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (H, H, 3), dtype=np.uint8)).save(
                buf, format="JPEG")
            ds[i] = np.frombuffer(buf.getvalue(), np.uint8)
    np.savez(str(root / "change_paras.npz"), scale=np.float32(512 / H),
             xc=np.int32(256), yc=np.int32(256))
    np.save(str(root / "tracked2D_normalized_pts_fix_contour.npy"),
            rng.uniform(100, 400, (N, 73, 2)).astype(np.float32))
    np.save(str(root / "normalized_shoulder_points.npy"),
            rng.uniform(100, 400, (T, 18, 2)).astype(np.float32))
    return root


def test_select_candidate_frames_spread():
    rng = np.random.default_rng(0)
    lm = rng.uniform(0, 512, (40, 73, 2)).astype(np.float32)
    picks = build_person.select_candidate_frames(lm)
    assert len(picks) == 4 and len(set(picks)) == 4
    assert all(0 <= i < 40 for i in picks)
    # degenerate tiny clip still yields 4 distinct frames
    picks = build_person.select_candidate_frames(lm[:4])
    assert len(set(picks)) == 4


def test_build_pack_then_load_and_animate(tmp_path):
    import jax

    from livespeechportraits_tpu.config import APCConfig, replace
    from livespeechportraits_tpu.models import apc as apc_mod
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio

    person_root = tmp_path / "NewPerson"
    _write_clip(person_root, "clip1", T=600, seed=0)
    _write_clip(person_root, "clip2", T=480, seed=1, with_face=False)

    apc_cfg = APCConfig()
    enc = apc_mod.init_apc(jax.random.PRNGKey(0), apc_cfg)
    manifest = build_person.build_person_pack(
        str(person_root), ["clip1", "clip2"], apc_params=enc,
        image_size=64, bank_stride=4)
    for fname in ("mean_pts3d.npy", "3d_fit_data.npz",
                  "tracked3D_normalized_pts_fix_contour.npy",
                  "APC_feature_base.npy", "camera_intrinsic.npy",
                  "normalized_shoulder_points.npy", "shoulder_points3D.npy",
                  "candidates/normalized_full_3.jpg"):
        assert os.path.exists(person_root / fname), (fname, manifest)

    fit = np.load(person_root / "3d_fit_data.npz")
    assert fit["pts_3d"].shape == (1080, 73, 3)  # both clips concatenated
    bank = np.load(person_root / "APC_feature_base.npy")
    assert bank.shape[1] == apc_cfg.hidden_size and len(bank) > 100

    cfg = replace(tiny_person(), name="NewPerson", data_root=str(person_root))
    a = assets_mod.load_person(cfg)
    assert a.mean_pts3d.shape == (73, 3)
    assert a.candidate_images.shape == (4, 512, 512, 3)
    assert a.shoulders.shape == (18, 2) and a.shoulder3D.shape == (18, 3)
    assert a.scale == 1.0  # id_scale.mat absent -> documented fallback

    # the built pack animates end-to-end with random-init models
    a.candidate_images = a.candidate_images[:, ::8, ::8]  # 64px test scale
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    from livespeechportraits_tpu.models import (
        audio2feature, audio2headpose, feature2face)
    m = assets_mod.PersonModels(
        apc=enc,
        audio2feature=audio2feature.init_audio2feature(k[1], cfg.audio2feature),
        audio2headpose=audio2headpose.init_audio2headpose(k[2], cfg.audio2headpose),
        feature2face=feature2face.init_generator(k[3], cfg.feature2face),
    )
    out = animate_mod.animate(cfg, a, m, _sine_audio(1.0), render_batch=4)
    want = 60 - cfg.audio2headpose.frame_future  # head-pose tail trim
    assert out.frames.shape[0] == want and np.isfinite(out.frames).all()


def test_select_candidate_frames_tiny_clips():
    """Clips with fewer frames than candidates must pad by repetition,
    not crash (1-3 frame clips exhaust the distinct-pick orders)."""
    from livespeechportraits_tpu.pipeline.build_person import (
        select_candidate_frames,
    )

    rng = np.random.default_rng(0)
    for n_frames in (1, 2, 3, 4, 7):
        lm = rng.uniform(0, 64, (n_frames, 73, 2)).astype(np.float32)
        picks = select_candidate_frames(lm)
        assert len(picks) == 4
        assert all(0 <= p < n_frames for p in picks)
        if n_frames >= 4:
            assert len(set(picks)) == 4


def test_built_pack_yaml_round_trips_and_models_fallback(tmp_path):
    """build_person_pack emits a reference-format per-person YAML that
    load_person_config reads back pointing at the pack, and
    load_person_models on a pack with no torch checkpoints random-inits
    every stage instead of crashing (the from-scratch onboarding path)."""
    from livespeechportraits_tpu.config import load_person_config
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.pipeline.build_person import build_person_pack

    root = tmp_path / "NewFace"
    _write_clip(root, "clip1", T=120)
    manifest = build_person_pack(str(root), ["clip1"], apc_params=None,
                                 image_size=64)
    assert "NewFace.yaml" in manifest
    cfg = load_person_config(str(root / "NewFace.yaml"), name="NewFace")
    assert cfg.data_root.rstrip("/") == str(root)
    assert not cfg.apc.use_LLE  # no APC bank was built
    assert cfg.feature2face.ckpt_path == ""

    models = assets_mod.load_person_models(cfg)
    for stage in (models.apc, models.audio2feature, models.audio2headpose,
                  models.feature2face):
        assert stage is not None

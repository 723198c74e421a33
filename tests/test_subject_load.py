"""Full released-subject path: fabricate a reference-format subject
directory (YAML config + torch .pkl checkpoints + asset .npy/.mat files),
then load + animate through the same code demo.py uses."""

import os

import numpy as np
import jax
import pytest

import scipy.io as sio
import yaml
from PIL import Image

from livespeechportraits_tpu.config import (
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    PersonConfig,
    WaveNetConfig,
    load_person_config,
    replace,
)
from livespeechportraits_tpu.pipeline import animate as animate_mod
from livespeechportraits_tpu.pipeline import assets as assets_mod
from livespeechportraits_tpu.utils import torch_convert as tc
from tests.test_pipeline import tiny_person, _sine_audio


@pytest.fixture(scope="module")
def subject_dir(tmp_path_factory):
    pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("subject") / "Maylet"
    (root / "candidates").mkdir(parents=True)
    (root / "checkpoints").mkdir()
    rng = np.random.default_rng(0)

    cfg = tiny_person()
    # assets in the reference's exact file layout
    base_assets, base_models = assets_mod.make_synthetic_person(
        cfg, key=jax.random.PRNGKey(1), image_size=64, bank_size=64)
    np.save(root / "mean_pts3d.npy", base_assets.mean_pts3d)
    tracked = base_assets.std_mean_pts3d[None] + rng.normal(
        0, 2e-3, (40, 73, 3)).astype(np.float32)
    np.save(root / "tracked3D_normalized_pts_fix_contour.npy", tracked)
    trans = np.repeat(base_assets.mean_translation[None, :, None], 40, axis=0)
    np.savez(root / "3d_fit_data.npz",
             pts_3d=tracked.astype(np.float32),
             rot_angles=np.zeros((40, 3), np.float32),
             trans=trans.astype(np.float32))
    np.save(root / "normalized_shoulder_points.npy", base_assets.shoulders)
    np.save(root / "shoulder_points3D.npy",
            np.repeat(base_assets.shoulder3D[None], 3, axis=0))
    np.save(root / "camera_intrinsic.npy", base_assets.camera_intrinsic)
    np.save(root / "APC_feature_base.npy", base_assets.apc_feature_base)
    sio.savemat(root / "id_scale.mat", {"scale": np.array([[1.0]])})
    for j in range(4):
        img = ((base_assets.candidate_images[j] * 0.5 + 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "candidates" / f"normalized_full_{j}.jpg")

    # reference-format checkpoints via the export converters
    tc.save_state_dict_torch(tc.export_apc(base_models.apc),
                             str(root / "checkpoints" / "APC.model"))
    tc.save_state_dict_torch(tc.export_audio2feature(base_models.audio2feature),
                             str(root / "checkpoints" / "Audio2Feature.pkl"))
    tc.save_state_dict_torch(tc.export_audio2headpose(base_models.audio2headpose),
                             str(root / "checkpoints" / "Audio2Headpose.pkl"))
    tc.save_state_dict_torch(
        tc.export_feature2face_g(base_models.feature2face, num_downs=6),
        str(root / "checkpoints" / "Feature2Face.pkl"))

    # reference-format per-person YAML
    config = {
        "model_params": {
            "APC": {
                "ckp_path": str(root / "checkpoints" / "APC.model"),
                "mel_dim": 80, "hidden_size": 512, "num_layers": 3,
                "residual": False, "use_LLE": 1, "Knear": 10, "LLE_percent": 1,
            },
            "Audio2Mouth": {
                "ckp_path": str(root / "checkpoints" / "Audio2Feature.pkl"),
                "smooth": 1.5, "AMP": ["XYZ", 2, 2, 2],
            },
            "Headpose": {
                "ckp_path": str(root / "checkpoints" / "Audio2Headpose.pkl"),
                "sigma": 0.3, "smooth": [5, 10], "AMP": [1, 0.5],
                "shoulder_AMP": 0.5,
            },
            "Image2Image": {
                "ckp_path": str(root / "checkpoints" / "Feature2Face.pkl"),
                "size": "normal", "save_input": 1,
            },
        },
        "dataset_params": {
            "root": str(root),
            "fit_data_path": str(root / "3d_fit_data.npz"),
            "pts3d_path": str(root / "tracked3D_normalized_pts_fix_contour.npy"),
        },
    }
    yaml_path = root / "Maylet.yaml"
    with open(yaml_path, "w") as f:
        yaml.safe_dump(config, f)
    return root, yaml_path, cfg, base_models


def test_load_released_subject_and_animate(subject_dir):
    root, yaml_path, tiny_cfg, base_models = subject_dir
    cfg = load_person_config(str(yaml_path))
    assert cfg.name == "Maylet"
    assert cfg.feature2face.size == "normal"
    assert cfg.audio2headpose.trans_amp == 0.5

    # the tiny test checkpoints use non-default architecture sizes; overlay
    # them (a real released subject uses the defaults)
    cfg = replace(
        cfg,
        audio2headpose=replace(tiny_cfg.audio2headpose,
                               ckpt_path=cfg.audio2headpose.ckpt_path),
        feature2face=replace(tiny_cfg.feature2face,
                             ckpt_path=cfg.feature2face.ckpt_path,
                             save_input=cfg.feature2face.save_input),
    )

    assets = assets_mod.load_person(cfg)
    assert assets.mean_pts3d.shape == (73, 3)
    assert assets.apc_feature_base.shape[1] == 512
    assert assets.scale == 1.0

    models = assets_mod.load_person_models(cfg)
    # converted checkpoints match the originals exactly
    for a, b in zip(jax.tree.leaves(models.audio2headpose),
                    jax.tree.leaves(base_models.audio2headpose)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    audio = _sine_audio(0.8)
    res = animate_mod.animate(cfg, assets, models, audio, seed=0, render_batch=4)
    assert res.nframe == int(0.8 * 60) - cfg.audio2headpose.frame_future
    assert res.frames.shape[1:] == (64, 64, 3)
    assert np.isfinite(res.landmarks).all()

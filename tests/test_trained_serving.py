"""Train->serve loop: this framework's own trainer checkpoints (orbax)
slot into a serving PersonModels (assets.load_trained_person_models) -
the path the reference leaves manual (its demo only reads released torch
.pkl files, demo.py:144-171, and ships no trainer)."""

import numpy as np
import jax
import jax.numpy as jnp

from livespeechportraits_tpu.config import (
    Audio2FeatureConfig, Feature2FaceConfig, PersonConfig, replace,
)
from livespeechportraits_tpu.models import feature2face as f2f
from livespeechportraits_tpu.pipeline import assets as assets_mod
from livespeechportraits_tpu.train import datasets, trainer
from livespeechportraits_tpu.train.datasets import FaceFrameSampler


def _face_sampler(rng, H=32, n=40):
    images = rng.integers(0, 255, (n, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (n, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    return FaceFrameSampler(images, lms, sh, cands, load_size=H)


def _person_cfg(H, f2f_cfg):
    cfg = PersonConfig(name="Synthetic")
    return replace(cfg, feature2face=f2f_cfg)


def test_load_trained_f2f_roundtrip(tmp_path):
    """A float GAN checkpoint restores into serving with the exact
    trained weights (list-valued res blocks re-nested from orbax's
    dict-ified form included)."""
    H = 32
    f2f_cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5,
                                 load_size=H, num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=50,
        checkpoints_dir=str(tmp_path), name="f2f_srv", save_epoch_freq=1,
    )
    g_state, _ = trainer.train_feature2face(
        f2f_cfg, loop, _face_sampler(np.random.default_rng(0), H))

    cfg = _person_cfg(H, f2f_cfg)
    models = assets_mod.load_trained_person_models(
        cfg, f2f_ckpt=str(tmp_path / "f2f_srv" / "ckpt"))

    # exact round-trip of the trained weights
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        models.feature2face["net"], g_state.params)
    assert models.feature2face["size"] == "normal"

    x = jnp.zeros((1, H, H, f2f_cfg.input_nc), jnp.float32)
    y, _ = f2f.apply_generator(models.feature2face, x, training=False)
    assert y.shape == (1, H, H, 3) and np.isfinite(np.asarray(y)).all()


def test_load_trained_f2f_qat_strips_tags(tmp_path):
    """A QAT checkpoint restores through the tagged template, comes out
    stripped (plain float tree), matches the in-memory stripped forward,
    and deploys through quantize_person_models."""
    H = 32
    f2f_cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5,
                                 load_size=H, num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=50,
        checkpoints_dir=str(tmp_path), name="f2f_srv_qat", save_epoch_freq=1,
        qat=True,
    )
    g_state, _ = trainer.train_feature2face(
        f2f_cfg, loop, _face_sampler(np.random.default_rng(1), H))
    assert f2f.is_qat_generator({"net": g_state.params})

    cfg = _person_cfg(H, f2f_cfg)
    models = assets_mod.load_trained_person_models(
        cfg, f2f_ckpt=str(tmp_path / "f2f_srv_qat" / "ckpt"))
    assert not f2f.is_qat_generator(models.feature2face)

    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, H, H, f2f_cfg.input_nc)), jnp.float32)
    y_loaded, _ = f2f.apply_generator(models.feature2face, x, training=False)
    stripped = f2f.strip_qat_generator({"net": g_state.params, "size": "normal"})
    y_mem, _ = f2f.apply_generator(stripped, x, training=False)
    np.testing.assert_array_equal(np.asarray(y_loaded), np.asarray(y_mem))

    # deployment stack applies to the loaded tree
    q = assets_mod.quantize_person_models(models)
    yq, _ = f2f.apply_generator(q.feature2face, x, training=False)
    assert np.isfinite(np.asarray(yq)).all()


def test_load_trained_a2f_roundtrip(tmp_path):
    """An audio2feature TrainState checkpoint restores its params
    exactly into the serving slot."""
    cfg_a2f = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=8,
                                  output_dim=75, frame_future=2)
    rng = np.random.default_rng(3)
    n = 600
    clips = [datasets.make_clip(
        audio_features=rng.normal(0, 1, (2 * n, 8)).astype(np.float32),
        pts3d=rng.normal(0, 0.01, (n, 73, 3)).astype(np.float32),
        rot_angles=rng.normal(0, 1, (n, 3)).astype(np.float32),
        trans=rng.normal(0, 1, (n, 3)).astype(np.float32),
    )]
    sampler = datasets.AudioVisualSampler(clips, task="audio2feature",
                                          seq_len=16, frame_jump_stride=8)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=1e-3, batch_size=4, print_freq=50,
        checkpoints_dir=str(tmp_path), name="a2f_srv", save_epoch_freq=1,
    )
    st = trainer.train_audio2feature(cfg_a2f, loop, sampler)

    cfg = replace(PersonConfig(name="Synthetic"), audio2feature=cfg_a2f)
    models = assets_mod.load_trained_person_models(
        cfg, a2f_ckpt=str(tmp_path / "a2f_srv" / "ckpt"))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        models.audio2feature, st.params)


def test_load_trained_cfg_mismatch_raises(tmp_path):
    """A checkpoint trained under a different architecture fails at load
    with the mismatch named, not at apply time."""
    import jax as _jax
    import pytest

    from livespeechportraits_tpu.utils import checkpoint as ckpt

    H = 32
    trained_cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5,
                                     load_size=H)
    net = f2f.init_generator(_jax.random.PRNGKey(0), trained_cfg)["net"]
    ckpt.save_checkpoint(str(tmp_path / "ckpt"), {"G": {"params": net}}, 1)

    # wrong width -> shape mismatch named
    wide = replace(PersonConfig(name="Synthetic"),
                   feature2face=replace(trained_cfg, ngf=8))
    with pytest.raises(ValueError, match="shapes do not match"):
        assets_mod.load_trained_person_models(
            wide, f2f_ckpt=str(tmp_path / "ckpt"))

    # wrong depth -> architecture mismatch named
    deep = replace(PersonConfig(name="Synthetic"),
                   feature2face=replace(trained_cfg, n_downsample=6,
                                        load_size=64))
    with pytest.raises(ValueError, match="does not match"):
        assets_mod.load_trained_person_models(
            deep, f2f_ckpt=str(tmp_path / "ckpt"))

    # MORE res blocks than the serving cfg ('large' ckpt, 'normal' cfg):
    # must refuse, never silently truncate to half the trained blocks
    large_cfg = replace(trained_cfg, size="large")
    net_l = f2f.init_generator(_jax.random.PRNGKey(1), large_cfg)["net"]
    ckpt.save_checkpoint(str(tmp_path / "ckpt_l"), {"G": {"params": net_l}}, 1)
    with pytest.raises(ValueError, match="does not match"):
        assets_mod.load_trained_person_models(
            replace(PersonConfig(name="Synthetic"), feature2face=trained_cfg),
            f2f_ckpt=str(tmp_path / "ckpt_l"))

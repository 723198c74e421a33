"""End-to-end trainer loop: epochs, scalar logs, checkpointing, resume."""

import os

import numpy as np
import pytest

from livespeechportraits_tpu.config import Audio2FeatureConfig
from livespeechportraits_tpu.train import datasets, trainer


def _clips():
    rng = np.random.default_rng(0)
    T, F = 600, 8
    return [datasets.make_clip(
        audio_features=rng.normal(size=(2 * T, F)).astype(np.float32),
        pts3d=rng.normal(size=(T, 73, 3)).astype(np.float32) * 0.01,
        rot_angles=rng.uniform(-170, 170, (T, 3)).astype(np.float32),
        trans=rng.normal(size=(T, 3)).astype(np.float32),
    )]


def test_train_audio2feature_loop_and_resume(tmp_path):
    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=8, output_dim=75,
                              frame_future=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=1, lr=1e-3, batch_size=4, print_freq=5,
        checkpoints_dir=str(tmp_path), name="a2f_test", save_epoch_freq=1,
    )
    sampler = datasets.AudioVisualSampler(_clips(), task="audio2feature",
                                          seq_len=16, frame_jump_stride=8)
    st = trainer.train_audio2feature(cfg, loop, sampler, val_sampler=sampler)
    assert int(st.step) > 0

    ckpt_dir = tmp_path / "a2f_test" / "ckpt"
    assert os.path.isdir(ckpt_dir)
    assert os.path.exists(tmp_path / "a2f_test" / "loss_log.txt")
    assert os.path.exists(tmp_path / "a2f_test" / "scalars.csv")

    # resume: continue_train picks up the last saved epoch
    loop2 = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=2, lr=1e-3, batch_size=4, print_freq=5,
        checkpoints_dir=str(tmp_path), name="a2f_test", continue_train=True,
    )
    st2 = trainer.train_audio2feature(cfg, loop2, sampler)
    assert int(st2.step) > int(st.step)  # kept training from the restore


def test_train_then_animate(tmp_path):
    """Params trained here drop straight into the inference pipeline."""
    import jax
    from livespeechportraits_tpu.train import state as state_mod, steps
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio
    import optax

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    # a few GAN steps on synthetic face data at the pipeline's size
    from livespeechportraits_tpu.models import feature2face
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(0)
    H = 64
    images = rng.integers(0, 255, (70, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(10, 54, (70, 73, 2)).astype(np.float32)
    sh = rng.uniform(10, 54, (18, 2)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, a.candidate_images, load_size=H)

    tx = optax.adam(2e-4, b1=0.5)
    d = feature2face.init_discriminator(jax.random.PRNGKey(1), cfg.feature2face)
    g_state = state_mod.create_state(m.feature2face["net"], tx)
    d_state = state_mod.create_state(d, tx)
    d_step, g_step = steps.make_f2f_steps(cfg.feature2face, tx, tx)
    for batch in sampler.batches(2, rng):
        d_state, _ = d_step(d_state, g_state.params, batch)
        g_state, _ = g_step(g_state, d_state.params, batch)
        break

    # trained generator params back into the inference pipeline
    m.feature2face = {"net": g_state.params, "size": cfg.feature2face.size}
    res = animate_mod.animate(cfg, a, m, _sine_audio(0.6), seed=0, render_batch=4)
    assert res.frames.shape[1:] == (64, 64, 3)
    assert np.isfinite(res.landmarks).all()


def test_train_cli_real_data_path(tmp_path, monkeypatch):
    """train.py's real-data branch loads reference-layout clips through
    data_io and trains."""
    import sys
    import jax
    from scipy.io import wavfile

    pytest_torch = pytest.importorskip("torch")
    from livespeechportraits_tpu.config import APCConfig
    from livespeechportraits_tpu.models import apc as apc_model
    from livespeechportraits_tpu.utils import torch_convert as tc

    # fabricate a reference-layout clip (long enough for the A2F sampler)
    root = tmp_path / "subject"
    clip = root / "c1"
    clip.mkdir(parents=True)
    T = 600
    sr = 16000
    t = np.arange(T * sr // 60) / sr
    wavfile.write(str(clip / "c1.wav"), sr,
                  (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
    rng = np.random.default_rng(0)
    np.savez(str(clip / "3d_fit_data.npz"),
             pts_3d=rng.normal(size=(T, 73, 3)).astype(np.float32),
             rot_angles=rng.uniform(-170, 170, (T, 3)).astype(np.float32),
             trans=rng.normal(size=(T, 3, 1)).astype(np.float32))
    np.save(str(root / "mean_pts3d.npy"), np.zeros((73, 3), np.float32))
    apc_ckpt = str(tmp_path / "apc.model")
    tc.save_state_dict_torch(
        tc.export_apc(apc_model.init_apc(jax.random.PRNGKey(0), APCConfig())),
        apc_ckpt)

    import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--task", "audio2feature", "--dataroot", str(root),
        "--clip_names", "c1", "--apc_ckpt", apc_ckpt,
        "--n_epochs", "1", "--n_epochs_decay", "0", "--batch_size", "4",
        "--sequence_length", "16",
        "--checkpoints_dir", str(tmp_path / "ck"), "--name", "real_a2f",
    ])
    train_cli.main()
    assert (tmp_path / "ck" / "real_a2f" / "loss_log.txt").exists()


def test_f2f_trainer_loop_resume_and_ttur(tmp_path):
    """GAN trainer: TTUR optimizers, dual-state checkpointing, resume."""
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(0)
    H = 32
    images = rng.integers(0, 255, (66, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (66, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2, gan_mode="hinge")
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=2,
        checkpoints_dir=str(tmp_path), name="f2f_t", save_epoch_freq=1, ttur=True,
    )
    g1, d1 = trainer.train_feature2face(cfg, loop, sampler)
    assert int(g1.step) > 0 and int(d1.step) > 0

    loop2 = trainer.TrainLoopConfig(
        n_epochs=2, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=2,
        checkpoints_dir=str(tmp_path), name="f2f_t", continue_train=True, ttur=True,
    )
    g2, d2 = trainer.train_feature2face(cfg, loop2, sampler)
    assert int(g2.step) > int(g1.step)  # resumed, not restarted


def test_train_audio2feature_gmm_mode(tmp_path):
    """The reference's intended-but-broken GMM option
    (audio2feature_model.py:85) is runnable here: wider GMM head, NLL
    loss, and mean decoding back to [T, output_dim] landmarks."""
    import jax
    import jax.numpy as jnp
    from livespeechportraits_tpu.models import audio2feature as a2f

    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=8, output_dim=75,
                              frame_future=2, loss="GMM", gmm_ncenter=2)
    assert a2f.head_dim(cfg) == (2 * 75 + 1) * 2
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=1e-3, batch_size=4, print_freq=5,
        checkpoints_dir=str(tmp_path), name="a2f_gmm", save_epoch_freq=1,
    )
    sampler = datasets.AudioVisualSampler(_clips(), task="audio2feature",
                                          seq_len=16, frame_jump_stride=8)
    st = trainer.train_audio2feature(cfg, loop, sampler, val_sampler=sampler)
    assert int(st.step) > 0

    # decode: GMM parameters -> component-mean landmarks, pipeline-shaped
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(40, 8)), jnp.float32)
    out = a2f.generate_sequence(st.params, feats, frame_future=cfg.frame_future,
                                cfg=cfg, key=jax.random.PRNGKey(0))
    assert out.shape == (20, 75)
    assert np.isfinite(np.asarray(out)).all()


def test_f2f_trainer_fused_step_loop(tmp_path):
    """train_feature2face(fused_step=True) drives the one-program GAN step
    through the same loop machinery (metrics logged, checkpoints saved)."""
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(1)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=2,
        checkpoints_dir=str(tmp_path), name="f2f_fused", save_epoch_freq=1,
        ttur=True, fused_step=True,
    )
    g1, d1 = trainer.train_feature2face(cfg, loop, sampler)
    assert int(g1.step) > 0 and int(d1.step) > 0
    log = (tmp_path / "f2f_fused" / "loss_log.txt").read_text()
    assert "loss_G" in log and "loss_D" in log


def test_f2f_trainer_device_rasterize(tmp_path):
    """FaceFrameSampler(device_rasterize=True): the host never draws the
    edge map - the trainer rasterises the batch on device with the same
    kernel the inference pipeline uses, and the resulting feature_map
    matches ops.rasterize on the raw coords."""
    import jax
    import jax.numpy as jnp
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.ops import rasterize
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler
    from livespeechportraits_tpu.train.trainer import _device_rasterize_batch

    rng = np.random.default_rng(3)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H,
                               device_rasterize=True)

    s = sampler.sample(0)
    assert "feature_map" not in s and s["landmarks"].shape == (73, 2)

    batch = next(iter(sampler.batches(2, rng)))
    placed = _device_rasterize_batch(jax.device_put(batch))
    assert placed["feature_map"].shape == (2, H, H, 1)
    ref = rasterize.rasterize_feature_maps(
        jnp.asarray(batch["landmarks"]), jnp.asarray(batch["shoulders"]),
        (H, H))[..., None]
    np.testing.assert_allclose(np.asarray(placed["feature_map"]),
                               np.asarray(ref), atol=1e-6)

    # full GAN trainer loop runs end to end on device-rasterised inputs
    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=4,
        checkpoints_dir=str(tmp_path), name="f2f_devrast", save_epoch_freq=1,
        fused_step=True,
    )
    g1, d1 = trainer.train_feature2face(cfg, loop, sampler, val_sampler=sampler)
    assert int(g1.step) > 0


def test_f2f_trainer_qat_loop(tmp_path):
    """train_feature2face(qat=True): the generator trains against the
    int8 fake-quant forward; checkpoints carry the QAT tags, resume does
    not double-tag, and the trained tree deploys through the standard
    quantize stack."""
    import jax.numpy as jnp
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(5)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=2,
        checkpoints_dir=str(tmp_path), name="f2f_qat", save_epoch_freq=1,
        qat=True,
    )
    g1, d1 = trainer.train_feature2face(cfg, loop, sampler)
    assert int(g1.step) > 0
    g_tree = {"net": g1.params, "size": "normal"}
    assert f2f.is_qat_generator(g_tree)

    # resume keeps the tags (no double-tagging, same treedef restores)
    loop2 = trainer.TrainLoopConfig(
        n_epochs=2, n_epochs_decay=0, lr=2e-4, batch_size=2, print_freq=2,
        checkpoints_dir=str(tmp_path), name="f2f_qat", continue_train=True,
        qat=True,
    )
    g2, _ = trainer.train_feature2face(cfg, loop2, sampler)
    assert int(g2.step) > int(g1.step)

    # deploy: strip -> quantize -> finite frames
    deployed = f2f.quantize_generator(f2f.strip_qat_generator(
        {"net": g2.params, "size": "normal"}))
    x = jnp.zeros((1, H, H, cfg.input_nc), jnp.float32)
    y, _ = f2f.apply_generator(deployed, x, training=False)
    assert np.isfinite(np.asarray(y)).all()


def test_f2f_qat_warm_start_from_float_checkpoint(tmp_path):
    """--qat --continue_train over a FLOAT checkpoint = the fine-tune
    flow: restores the float weights, tags them, resets optimizer
    moments, and trains; the reverse (float resume of a QAT run) drops
    the tags with a warning instead of crashing."""
    import jax.numpy as jnp
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(7)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    base = dict(n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2,
                print_freq=50, checkpoints_dir=str(tmp_path), name="f2f_ws",
                save_epoch_freq=1)
    g_float, _ = trainer.train_feature2face(
        cfg, trainer.TrainLoopConfig(**base), sampler)
    assert not f2f.is_qat_generator({"net": g_float.params})

    # float -> QAT fine-tune
    loop_qat = trainer.TrainLoopConfig(**{**base, "n_epochs": 2},
                                       continue_train=True, qat=True)
    g_qat, _ = trainer.train_feature2face(cfg, loop_qat, sampler)
    assert f2f.is_qat_generator({"net": g_qat.params})

    # QAT -> float resume: tags dropped, no crash
    loop_f = trainer.TrainLoopConfig(**{**base, "n_epochs": 3},
                                     continue_train=True)
    g_back, _ = trainer.train_feature2face(cfg, loop_f, sampler)
    assert not f2f.is_qat_generator({"net": g_back.params})


def test_f2f_trainer_qat_int8_loop_and_retag(tmp_path):
    """train_feature2face(qat_int8=True): the generator trains with the
    REAL int8 forward kernel (fq8 tags); resuming the checkpoint under
    the float-emulation mode retags fq8 -> fq in params AND optimizer
    moments instead of failing on a treedef mismatch."""
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(9)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    base = dict(n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=2,
                print_freq=50, checkpoints_dir=str(tmp_path), name="f2f_q8",
                save_epoch_freq=1)
    g1, _ = trainer.train_feature2face(
        cfg, trainer.TrainLoopConfig(**base, qat_int8=True), sampler)
    assert int(g1.step) > 0
    assert f2f.qat_tag_mode({"net": g1.params}) == "fq8"

    # fq8 checkpoint resumed under the float-emulation mode: retagged
    loop_fq = trainer.TrainLoopConfig(**{**base, "n_epochs": 2},
                                      continue_train=True, qat=True)
    g2, _ = trainer.train_feature2face(cfg, loop_fq, sampler)
    assert int(g2.step) > int(g1.step)
    assert f2f.qat_tag_mode({"net": g2.params}) == "fq"

    # and back: fq checkpoint resumed under the int8-forward mode
    loop_q8 = trainer.TrainLoopConfig(**{**base, "n_epochs": 3},
                                      continue_train=True, qat_int8=True)
    g3, _ = trainer.train_feature2face(cfg, loop_q8, sampler)
    assert int(g3.step) > int(g2.step)
    assert f2f.qat_tag_mode({"net": g3.params}) == "fq8"


def test_f2f_trainer_data_parallel_eval_paths(tmp_path):
    """data_parallel + device_rasterize + validation + epoch panels: the
    eval-side batches must be placed compatibly with the mesh-sharded
    params (they are replicated; a device-0-committed batch used to crash
    the jitted validate with 'incompatible devices')."""
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    rng = np.random.default_rng(11)
    H = 32
    images = rng.integers(0, 255, (40, H, H, 3), dtype=np.uint8)
    lms = rng.uniform(5, 27, (40, 73, 2)).astype(np.float32)
    sh = rng.uniform(5, 27, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    sampler = FaceFrameSampler(images, lms, sh, cands, load_size=H,
                               device_rasterize=True)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=H,
                             num_D=2, n_layers_D=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=2e-4, batch_size=8, print_freq=50,
        checkpoints_dir=str(tmp_path), name="f2f_dp_eval", save_epoch_freq=1,
        data_parallel=True, validate_epoch=1, display_epoch_freq=1,
    )
    g, d = trainer.train_feature2face(cfg, loop, sampler, val_sampler=sampler)
    assert int(g.step) > 0
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "f2f_dp_eval"))


def test_save_best_checkpoint_tracks_val_optimum(tmp_path):
    """TrainLoopConfig.save_best keeps <ckpt>_best = the epoch with the
    LOWEST validation mean (the reference can only serve whatever epoch
    the schedule ended on, models/__init__.py:74-104), and
    checkpoint.prefer_best routes serving loads to it."""
    import csv

    from livespeechportraits_tpu.utils import checkpoint as ckpt_mod

    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=8,
                              output_dim=75, frame_future=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=2, n_epochs_decay=2, lr=2e-3, batch_size=4, print_freq=50,
        checkpoints_dir=str(tmp_path), name="a2f_best", save_epoch_freq=1,
    )
    sampler = datasets.AudioVisualSampler(_clips(), task="audio2feature",
                                          seq_len=16, frame_jump_stride=8)
    trainer.train_audio2feature(cfg, loop, sampler, val_sampler=sampler)

    ckpt_dir = str(tmp_path / "a2f_best" / "ckpt")
    best_dir = ckpt_dir + "_best"
    assert os.path.isdir(best_dir)
    # prefer_best: routes to _best when present, identity otherwise
    assert ckpt_mod.prefer_best(ckpt_dir) == best_dir
    assert ckpt_mod.prefer_best(str(tmp_path / "nope")) == str(tmp_path / "nope")
    assert ckpt_mod.prefer_best("") == ""

    # the val series logged to scalars.csv (one val_loss row per epoch,
    # in epoch order) must argmin exactly at the best save's epoch
    vals = []
    with open(tmp_path / "a2f_best" / "scalars.csv") as f:
        key_idx = None
        for row in csv.reader(f):
            if row and row[0] == "step":
                key_idx = row.index("val_loss") if "val_loss" in row else None
            elif key_idx is not None and len(row) > key_idx:
                vals.append(float(row[key_idx]))
    assert vals, "validation rows missing from scalars.csv"
    assert ckpt_mod.latest_step(best_dir) == int(np.argmin(vals)) + 1
    # every epoch still saved in the plain dir
    assert ckpt_mod.latest_step(ckpt_dir) == len(vals)

    # the serving loader resolves the best save without an explicit step
    from livespeechportraits_tpu.utils.checkpoint import restore_checkpoint
    best = restore_checkpoint(best_dir)
    assert "params" in best

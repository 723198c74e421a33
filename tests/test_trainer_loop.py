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

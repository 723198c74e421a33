"""Coverage for remaining paths: VGG weight import, Griffin-Lim inversion,
data-parallel trainer loop, streaming chunk-size invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_vgg19_npz_import(tmp_path):
    """Conv weights exported in torchvision's OIHW layout load correctly."""
    from livespeechportraits_tpu.models import losses as L

    rng = np.random.default_rng(0)
    plan = [s for s in L._VGG19_PLAN if s != "M"]
    data = {}
    in_ch = 3
    for i, out_ch in enumerate(plan):
        data[f"conv{i}_w"] = rng.normal(0, 0.05, (int(out_ch), in_ch, 3, 3)).astype(np.float32)
        data[f"conv{i}_b"] = rng.normal(0, 0.01, (int(out_ch),)).astype(np.float32)
        in_ch = int(out_ch)
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **data)

    params = L.load_vgg19_npz(path)
    feats = L.vgg19_features(params, jnp.zeros((1, 64, 64, 3)))
    assert len(feats) == 5
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[4].shape[-1] == 512
    # imported kernel matches the HWIO transpose of the OIHW source
    np.testing.assert_allclose(
        np.asarray(params["convs"][0]["w"]),
        data["conv0_w"].transpose(2, 3, 1, 0), atol=0)


def test_mel_to_audio_roundtrip_tone():
    from livespeechportraits_tpu.ops import mel as M

    t = np.arange(4000) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    m = M.audio_to_mel(audio, n_fft=512, hop_length=256, win_length=512)[0]
    rec = np.asarray(M.mel_to_audio(m, n_fft=512, hop_length=256, win_length=512,
                                    n_iter=8))
    assert np.isfinite(rec).all()
    f_orig = np.abs(np.fft.rfft(audio)).argmax() / len(audio)
    f_rec = np.abs(np.fft.rfft(rec)).argmax() / len(rec)
    assert abs(f_rec - f_orig) / f_orig < 0.05  # dominant tone survives


def test_trainer_data_parallel_runs(tmp_path):
    """The data_parallel=True loop shards batches over the 8-device mesh."""
    from livespeechportraits_tpu.config import Audio2FeatureConfig
    from livespeechportraits_tpu.train import datasets, trainer

    rng = np.random.default_rng(0)
    T, F = 600, 8
    clip = datasets.make_clip(
        audio_features=rng.normal(size=(2 * T, F)).astype(np.float32),
        pts3d=rng.normal(size=(T, 73, 3)).astype(np.float32) * 0.01,
        rot_angles=rng.uniform(-170, 170, (T, 3)).astype(np.float32),
        trans=rng.normal(size=(T, 3)).astype(np.float32),
    )
    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=8, output_dim=75,
                              frame_future=2)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=1e-3, batch_size=8, print_freq=100,
        checkpoints_dir=str(tmp_path), name="dp_test", save_epoch_freq=10,
        data_parallel=True,
    )
    sampler = datasets.AudioVisualSampler([clip], task="audio2feature",
                                          seq_len=16, frame_jump_stride=16)
    st = trainer.train_audio2feature(cfg, loop, sampler)
    assert int(st.step) > 0
    assert np.isfinite(np.asarray(jax.tree.leaves(st.params)[0])).all()


def test_streaming_chunk_size_invariance():
    """Different device chunk sizes must produce identical streams."""
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator
    from tests.test_pipeline import tiny_person, _sine_audio

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    audio = _sine_audio(1.0)
    outs = []
    for chunk in [8, 24]:
        s = StreamingAnimator(cfg, a, m, seed=1, chunk=chunk, render_batch=4)
        frames = [s.push_audio(audio)]
        frames.append(s.flush())
        outs.append(np.concatenate([f for f in frames if len(f)]))
    assert outs[0].shape == outs[1].shape
    diff = np.abs(outs[0].astype(int) - outs[1].astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_export_vgg19_state_dict_oracle(tmp_path):
    """tools/export_vgg19 converts a torch(vision)-layout features state
    dict into our npz; the imported extractor must match the torch
    features pipeline at every tap (conv indices 0,2,5,...,34 of VGG19)."""
    import torch
    import torch.nn as nn

    from livespeechportraits_tpu.models import losses as L
    from tools.export_vgg19 import export

    torch.manual_seed(0)
    plan = L._VGG19_PLAN
    layers, sd = [], {}
    li = 0
    in_ch = 3
    for spec in plan:
        if spec == "M":
            layers.append(nn.MaxPool2d(2, 2))
            li += 1
            continue
        conv = nn.Conv2d(in_ch, int(spec), 3, padding=1)
        sd[f"{li}.weight"] = conv.weight.detach()
        sd[f"{li}.bias"] = conv.bias.detach()
        layers.extend([conv, nn.ReLU(inplace=False)])
        li += 2
        in_ch = int(spec)
    torch_feats = nn.Sequential(*layers).eval()

    path = str(tmp_path / "vgg19.npz")
    n = export(path, state_dict=sd)
    assert n == 16
    params = L.load_vgg19_npz(path)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = L.vgg19_features(params, jnp.asarray(x), from_tanh_range=False)

    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        taps = []
        # relu layer indices after conv1_1, 2_1, 3_1, 4_1, 5_1 (losses.py:246-255)
        tap_idx = {1, 6, 11, 20, 29}
        for i, layer in enumerate(torch_feats):
            h = layer(h)
            if i in tap_idx:
                taps.append(h.numpy().transpose(0, 2, 3, 1))
    assert len(taps) == 5
    for a, b in zip(ours, taps):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)

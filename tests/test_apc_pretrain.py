"""APC self-supervised pretraining: the encoder the reference only ever
loads frozen (demo.py:145-160) is trainable in-framework (L1 future-mel
prediction), and the result drops into feature precompute and serving."""

import numpy as np
import pytest

from livespeechportraits_tpu.config import APCConfig
from livespeechportraits_tpu.train import datasets, trainer


def _structured_mels(n_utts: int, frames: int, mel_dim: int = 16, seed: int = 0):
    """Smooth wandering-formant mels: future frames are predictable from
    the past, so pretraining has real signal (white noise would not)."""
    rng = np.random.default_rng(seed)
    t = np.arange(frames, dtype=np.float32)[:, None]
    bins = np.arange(mel_dim, dtype=np.float32)[None, :]
    utts = []
    for _ in range(n_utts):
        m = np.zeros((frames, mel_dim), np.float32)
        for _ in range(3):
            centre = (mel_dim / 2) * (1 + np.sin(t / rng.uniform(15, 40)
                                                 + rng.uniform(0, 6)))
            m += np.exp(-((bins - centre) ** 2) / (2 * 4.0))
        m += rng.normal(0, 0.01, m.shape)
        utts.append(np.clip(m, 0.0, 1.0).astype(np.float32))
    return utts


def test_mel_window_sampler_windows_and_boundaries():
    mels = [np.arange(50, dtype=np.float32).repeat(4).reshape(50, 4),
            100 + np.arange(20, dtype=np.float32).repeat(4).reshape(20, 4)]
    s = datasets.MelWindowSampler(mels, window=16, stride=8)
    rng = np.random.default_rng(0)
    batches = list(s.batches(2, rng, shuffle=False))
    assert all(b["mels"].shape == (2, 16, 4) for b in batches)
    # no window straddles the utterance seam: each window is contiguous
    # within one source array (values rise by exactly 1 per frame)
    for b in batches:
        diffs = np.diff(b["mels"][..., 0], axis=1)
        assert np.all(diffs == 1.0)
    with pytest.raises(ValueError, match="no utterance"):
        datasets.MelWindowSampler([np.zeros((8, 4), np.float32)], window=16)

    # validation-style iteration: a set smaller than the batch still
    # yields (trainers pass drop_last=False so val never averages [])
    small = datasets.MelWindowSampler(mels[1:], window=16, stride=4)  # 2 windows
    assert list(small.batches(8, rng, shuffle=False)) == []
    got = list(small.batches(8, rng, shuffle=False, drop_last=False))
    assert len(got) == 1 and got[0]["mels"].shape == (2, 16, 4)


def test_apc_pretrain_loss_falls_and_beats_random(tmp_path):
    import jax

    from livespeechportraits_tpu.models import apc as apc_mod
    from livespeechportraits_tpu.train import steps

    cfg = APCConfig(mel_dim=16, hidden_size=16, num_layers=2, time_shift=3)
    mels = _structured_mels(3, 400)
    sampler = datasets.MelWindowSampler(mels[1:], window=40, stride=20)
    val = datasets.MelWindowSampler(mels[:1], window=40)
    loop = trainer.TrainLoopConfig(
        n_epochs=3, n_epochs_decay=0, lr=3e-3, batch_size=4, print_freq=20,
        checkpoints_dir=str(tmp_path), name="apc_test", save_epoch_freq=3,
    )
    st = trainer.train_apc(cfg, loop, sampler, val_sampler=val)
    assert int(st.step) > 0

    validate = steps.apc_validate(cfg)
    rng = np.random.default_rng(0)
    val_batch = next(val.batches(4, rng, shuffle=False, drop_last=False))
    random_params = apc_mod.init_apc_pretrain(jax.random.PRNGKey(7), cfg)
    trained_l1 = float(validate(st.params, val_batch))
    random_l1 = float(validate(random_params, val_batch))
    assert np.isfinite(trained_l1)
    # held-out future-frame prediction must beat an untrained encoder
    assert trained_l1 < 0.7 * random_l1, (trained_l1, random_l1)


def test_apc_checkpoint_feeds_precompute_and_serving(tmp_path):
    import jax
    import jax.numpy as jnp

    from livespeechportraits_tpu.config import PersonConfig, replace
    from livespeechportraits_tpu.models import apc as apc_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod

    cfg = APCConfig(mel_dim=16, hidden_size=16, num_layers=2, time_shift=2)
    sampler = datasets.MelWindowSampler(_structured_mels(2, 200), window=40)
    loop = trainer.TrainLoopConfig(
        n_epochs=1, n_epochs_decay=0, lr=1e-3, batch_size=4, print_freq=50,
        checkpoints_dir=str(tmp_path), name="apc_ck", save_epoch_freq=1,
    )
    st = trainer.train_apc(cfg, loop, sampler)
    ckpt_dir = str(tmp_path / "apc_ck" / "ckpt")

    # train.py --apc_ckpt <orbax dir> path: encoder restores and encodes
    enc = apc_mod.load_pretrained_encoder(ckpt_dir, cfg)
    feats = apc_mod.encode(enc, jnp.zeros((1, 12, cfg.mel_dim)))
    assert feats.shape == (1, 12, cfg.hidden_size)
    got = jax.tree_util.tree_leaves(enc)
    want = jax.tree_util.tree_leaves(st.params["encoder"])
    assert all(np.allclose(a, b) for a, b in zip(got, want))

    # serving path: load_trained_person_models swaps the APC stage
    person = replace(PersonConfig(name="Synthetic"), apc=cfg)
    models = assets_mod.load_trained_person_models(person, apc_ckpt=ckpt_dir)
    got = jax.tree_util.tree_leaves(models.apc)
    assert all(np.allclose(a, b) for a, b in zip(got, want))

    # config mismatch fails loudly with the stage named
    deep = replace(person, apc=APCConfig(mel_dim=16, hidden_size=16, num_layers=3))
    with pytest.raises(ValueError, match="apc checkpoint does not match"):
        assets_mod.load_trained_person_models(deep, apc_ckpt=ckpt_dir)

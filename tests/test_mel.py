"""Golden tests for the mel front-end against torch.stft semantics.

The independent oracle below re-derives the reference's documented
behaviour (funcs/audio_funcs.py:56-75, funcs/utils.py:61-83) directly with
public torch APIs; our JAX implementation must match to float tolerance.
"""

import math

import numpy as np
import pytest
import torch

from livespeechportraits_tpu.ops import mel as mel_ops


def torch_log_mel(audio: np.ndarray, n_fft=512, hop=256, win=1024, sr=16000,
                  n_mels=80, fmin=90.0, fmax=7600.0, normalize=True) -> np.ndarray:
    """Oracle: reflect-pad + torch.stft(center=False) + mel matmul + log clamp."""
    x = torch.from_numpy(audio).float()
    if x.ndim == 1:
        x = x[None]
    p = (n_fft - hop) // 2
    x = torch.nn.functional.pad(x[:, None, :], (p, p), "reflect")[:, 0, :]
    window = torch.hann_window(win)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      window=window, center=False, return_complex=True)
    mag = spec.abs()
    basis = torch.from_numpy(mel_ops.mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    out = torch.log(torch.clamp(basis @ mag, min=1e-5))
    if normalize:
        m = math.log(1e-5)
        out = (out - m) / -m
    return out.numpy()


def test_mel_filterbank_properties():
    fb = mel_ops.mel_filterbank()
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # Slaney norm: each filter integrates to ~2/bandwidth; every filter hits
    # at least one non-zero bin at 16 kHz/512-pt resolution.
    assert (fb.max(axis=1) > 0).all()
    try:
        import librosa  # pragma: no cover

        ref = librosa.filters.mel(sr=16000, n_fft=512, n_mels=80, fmin=90, fmax=7600.0)
        np.testing.assert_allclose(fb, ref, atol=1e-6)
    except ImportError:
        pass


@pytest.mark.parametrize("T,params", [
    (4000, dict(n_fft=512, hop=133, win=266)),   # the live 120 Hz framing params
    (16000, dict(n_fft=512, hop=256, win=512)),  # generic STFT
])
def test_audio_to_mel_matches_torch(T, params):
    rng = np.random.default_rng(0)
    audio = rng.uniform(-1, 1, size=T).astype(np.float32)
    ours = np.asarray(
        mel_ops.audio_to_mel(audio, n_fft=params["n_fft"],
                             hop_length=params["hop"], win_length=params["win"])
    )
    ref = torch_log_mel(audio, n_fft=params["n_fft"], hop=params["hop"], win=params["win"])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_audio_to_mel_rejects_win_gt_nfft():
    with pytest.raises(ValueError):
        mel_ops.audio_to_mel(np.zeros(4000, np.float32), n_fft=512, hop_length=256,
                             win_length=1024)


def test_mel_sequence_matches_reference_framing():
    """Each 120 Hz frame equals Audio2Mel on its own 266-sample clip."""
    rng = np.random.default_rng(1)
    sr = 16000
    audio = rng.uniform(-1, 1, size=int(0.5 * sr)).astype(np.float32)
    ours = np.asarray(mel_ops.compute_mel_sequence(audio))
    nframe = int(audio.shape[0] / sr * 60)
    assert ours.shape == (2 * nframe, 80)

    win_len = sr // 60  # 266
    step = sr * 0.5 / 60
    for i in [0, 1, 7, 2 * nframe - 1]:
        st = int(i * step)
        clip = audio[st : st + win_len]
        if len(clip) < win_len:
            clip = np.concatenate([clip, np.zeros(win_len - len(clip), np.float32)])
        ref = torch_log_mel(clip, n_fft=512, hop=sr // 120, win=win_len)
        np.testing.assert_allclose(ours[i], ref[0, :, 0], atol=2e-4)


def test_mel_sequence_empty():
    out = mel_ops.compute_mel_sequence(np.zeros(10, np.float32))
    assert out.shape == (0, 80)


def test_mu_law_roundtrip():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    enc = np.asarray(mel_ops.mu_law_encode(x))
    assert enc.min() >= 0 and enc.max() <= 255
    dec = np.asarray(mel_ops.mu_law_decode(enc))
    # 8-bit mu-law relative quantisation error is ~2% near |x|=1
    assert np.abs(dec - x).max() < 2.1e-2
    assert np.abs(dec - x)[np.abs(x) < 0.5].max() < 1.1e-2


def test_frame_energy_shape():
    audio = np.random.default_rng(2).uniform(-1, 1, 16000).astype(np.float32)
    e = np.asarray(mel_ops.frame_energy(audio))
    assert e.ndim == 2 and e.shape[0] == 1
    assert np.isfinite(e).all()


def test_mel_energy():
    import jax.numpy as jnp

    mels = jnp.zeros((1, 80, 5))  # exp(0)=1 -> mean 1 -> log 0
    e = mel_ops.mel_energy(mels)
    assert e.shape == (1, 5)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-6)


def test_mel_to_audio_explicit_short_length():
    """length shorter than hop*T' must trim the RETURNED waveform only
    (the internal STFT keeps its frame count); longer zero-extends."""
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    audio = rng.uniform(-0.3, 0.3, 4096).astype(np.float32)
    m = mel_ops.audio_to_mel(jnp.asarray(audio), win_length=512)[0]
    full = np.asarray(mel_ops.mel_to_audio(m, n_iter=2, win_length=512))
    short = np.asarray(mel_ops.mel_to_audio(m, n_iter=2, win_length=512, length=1000))
    np.testing.assert_array_equal(short, full[:1000])
    longer = np.asarray(mel_ops.mel_to_audio(m, n_iter=2, win_length=512, length=len(full) + 64))
    np.testing.assert_array_equal(longer[: len(full)], full)
    np.testing.assert_array_equal(longer[len(full):], 0.0)


def test_audio_to_mel_rejects_sub_pad_audio():
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="too short"):
        mel_ops.audio_to_mel(jnp.zeros(100), win_length=512)
    with pytest.raises(ValueError, match="too short"):
        mel_ops.frame_energy(jnp.zeros(100))

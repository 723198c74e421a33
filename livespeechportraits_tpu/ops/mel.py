"""Log-mel audio front-end, TPU-native.

Capability parity with the reference's ``Audio2Mel``
(funcs/audio_funcs.py:20-113) and ``compute_mel_one_sequence``
(funcs/utils.py:61-83), re-designed for XLA:

* The reference extracts 120 Hz mel frames in a Python loop - one
  ``torch.stft`` call **per frame** on a 266-sample clip.  Here the whole
  utterance is framed at once with a single static gather, windowed, pushed
  through one batched rFFT and one mel-filterbank matmul - one fused jit,
  no host<->device ping-pong.
* The mel filterbank is built in numpy at trace time (matching librosa's
  slaney-scale/slaney-norm construction used at audio_funcs.py:36-38) and
  becomes a constant folded into the jitted graph.

Numerical semantics match the reference exactly (golden-tested against
torch.stft in tests/test_mel.py): reflect-padding of each 266-sample clip by
(n_fft - hop)//2 = 189, a periodic Hann window of win_length zero-padded to
n_fft=512, magnitude spectrum, mel projection, log-clamp at 1e-5 and [0,1]
normalisation by -log(1e-5).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.config import FPS, MEL_RATE, SAMPLE_RATE

LOG_MEL_MIN = math.log(1e-5)


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible: slaney scale, slaney area norm)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int = SAMPLE_RATE,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> np.ndarray:
    """[n_mels, 1 + n_fft//2] triangular filterbank, slaney-normalised.

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    0.7.x positional signature used at reference audio_funcs.py:36-38.
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_periodic(n: int) -> np.ndarray:
    """torch.hann_window default (periodic=True)."""
    k = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))).astype(np.float32)


def _reflect_index(p: np.ndarray, n: int) -> np.ndarray:
    """PyTorch 'reflect' padding index map (edge excluded), valid for |pad|<n."""
    p = np.where(p < 0, -p, p)
    p = np.where(p >= n, 2 * (n - 1) - p, p)
    return p


# ---------------------------------------------------------------------------
# Generic batched Audio2Mel (parity with Audio2Mel.forward)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "sr", "n_mels", "normalize"),
)
def audio_to_mel(
    audio: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 1024,
    sr: int = SAMPLE_RATE,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
    normalize: bool = True,
) -> jnp.ndarray:
    """[B, T] audio in [-1, 1] -> [B, n_mels, T'] normalised log-mel.

    Parity target: funcs/audio_funcs.py:56-75 (reflect pad by
    (n_fft-hop)//2, torch.stft center=False with a periodic Hann window of
    win_length zero-padded symmetrically to n_fft).
    """
    if win_length > n_fft:
        raise ValueError(
            f"win_length ({win_length}) must be <= n_fft ({n_fft}); torch.stft "
            "imposes the same constraint, so the reference's class defaults "
            "(win=1024, n_fft=512) are unusable there too - every live call "
            "site passes win_length <= n_fft (funcs/utils.py:65-66)."
        )
    if audio.ndim == 1:
        audio = audio[None]
    B, T = audio.shape
    pad = (n_fft - hop_length) // 2
    if T <= pad:
        # torch's reflect pad requires pad < input size; past that the
        # index map below would silently clamp instead of reflecting
        raise ValueError(
            f"audio too short for the mel front-end: {T} samples <= "
            f"reflect pad {pad} (~{pad / sr * 1000:.0f} ms minimum)")
    Tp = T + 2 * pad
    n_frames = 1 + (Tp - n_fft) // hop_length

    # Build [n_frames, n_fft] gather indices into the *unpadded* signal with
    # reflect semantics at both edges (static, folded at trace time).
    frame_idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :] - pad
    frame_idx = _reflect_index(frame_idx, T)

    # Periodic hann of win_length, symmetrically zero-padded to n_fft
    # (torch.stft behaviour when win_length < n_fft).
    w = _hann_periodic(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.zeros(n_fft, dtype=np.float32)
    window[lpad : lpad + win_length] = w

    frames = audio[:, frame_idx] * jnp.asarray(window)  # [B, n_frames, n_fft]
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    mag = jnp.abs(spec)  # [B, n_frames, n_fft//2+1]
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    melspec = jnp.einsum("btf,mf->bmt", mag, basis, precision=jax.lax.Precision.HIGHEST)
    log_mel = jnp.log(jnp.clip(melspec, min=1e-5))
    if normalize:
        log_mel = (log_mel - LOG_MEL_MIN) / -LOG_MEL_MIN
    return log_mel


# ---------------------------------------------------------------------------
# 120 Hz utterance framing (parity with compute_mel_one_sequence)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_sequence_impl(audio: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    sr = SAMPLE_RATE
    n_fft, n_mels = 512, 80
    win_length = sr // FPS  # 266
    step = sr * 0.5 / FPS  # 133.333... (fractional hop, floor per frame)
    pad = (n_fft - sr // MEL_RATE) // 2  # 189

    starts = np.floor(np.arange(n_frames) * step).astype(np.int64)
    # Gather [n_frames, n_fft] windows directly from the zero-tail-padded
    # signal.  Column j of frame i reads clip sample reflect(j - pad) of the
    # 266-sample clip starting at starts[i]; clips whose tail crosses the end
    # of the audio are zero-padded (utils.py:78-79).
    col = _reflect_index(np.arange(n_fft) - pad, win_length)
    idx = starts[:, None] + col[None, :]

    w = _hann_periodic(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.zeros(n_fft, dtype=np.float32)
    window[lpad : lpad + win_length] = w

    audio_padded = jnp.concatenate(
        [audio.astype(jnp.float32), jnp.zeros(win_length, jnp.float32)]
    )
    frames = audio_padded[idx] * jnp.asarray(window)  # [n_frames, n_fft]
    mag = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, 90.0, 7600.0))
    melspec = jnp.einsum("tf,mf->tm", mag, basis, precision=jax.lax.Precision.HIGHEST)
    log_mel = jnp.log(jnp.clip(melspec, min=1e-5))
    return (log_mel - LOG_MEL_MIN) / -LOG_MEL_MIN


def compute_mel_sequence(audio: np.ndarray | jnp.ndarray) -> jnp.ndarray:
    """Frame an utterance into 120 Hz 80-d normalised log-mel features.

    Parity target: funcs/utils.py:61-83 - each video frame (60 FPS) yields
    two mel frames; frame i covers samples [floor(i*sr/120), +sr/60) of the
    waveform, independently reflect-padded and windowed.  Returns
    [2 * floor(len(audio)/sr*60), 80].

    Zero-length audio returns an empty [0, 80] array.
    """
    n_video_frames = int(np.asarray(audio).shape[0] / SAMPLE_RATE * FPS)
    n_frames = 2 * n_video_frames
    if n_frames == 0:
        return jnp.zeros((0, 80), jnp.float32)
    return _mel_sequence_impl(jnp.asarray(audio), n_frames)


# ---------------------------------------------------------------------------
# Companding & energy (parity with audio_funcs.py:94-152)
# ---------------------------------------------------------------------------


def mel_energy(mels: jnp.ndarray) -> jnp.ndarray:
    """Per-frame energy from a log-mel spectrogram [B, n_mels, T]:
    log(mean(exp(mel))) over bins (Audio2Mel.get_energy_mel,
    audio_funcs.py:107-113)."""
    return jnp.log(jnp.exp(mels).mean(axis=1))


def mu_law_encode(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """mu-law compand + quantise to [0, mu] (audio_funcs.py:118-131)."""
    x = jnp.clip(x, -1.0, 1.0)
    fx = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    return jnp.floor((fx + 1) / 2 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(y: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """Inverse mu-law (audio_funcs.py:134-141)."""
    fy = 2.0 * (y.astype(jnp.float32) / mu) - 1.0
    return jnp.sign(fy) / mu * ((1 + mu) ** jnp.abs(fy) - 1.0)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "normalize"))
def frame_energy(
    audio: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 1024,
    normalize: bool = True,
) -> jnp.ndarray:
    """Per-frame log-RMS energy (audio_funcs.py:94-104)."""
    if audio.ndim == 1:
        audio = audio[None]
    B, T = audio.shape
    pad = (n_fft - hop_length) // 2
    if T <= pad:
        raise ValueError(
            f"audio too short for frame_energy: {T} samples <= reflect "
            f"pad {pad}")
    n_frames = 1 + (T + 2 * pad - win_length) // hop_length
    idx = _reflect_index(
        np.arange(n_frames)[:, None] * hop_length + np.arange(win_length)[None, :] - pad, T
    )
    frames = audio[:, idx]
    energy = jnp.sqrt(jnp.mean(frames**2, axis=-1))
    energy = jnp.log(jnp.clip(energy, min=1e-5))
    if normalize:
        energy = (energy - LOG_MEL_MIN) / -LOG_MEL_MIN
    return energy


# ---------------------------------------------------------------------------
# Mel inversion (parity with Audio2Mel.mel_to_audio, audio_funcs.py:77-85)
# ---------------------------------------------------------------------------


def _stft_frames(audio: jnp.ndarray, n_fft: int, hop: int, win_length: int,
                 window: jnp.ndarray, T: int) -> jnp.ndarray:
    pad = (n_fft - hop) // 2
    n_frames = 1 + (T + 2 * pad - n_fft) // hop
    idx = _reflect_index(
        np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :] - pad, T
    )
    return audio[idx] * window


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                             "sr", "n_iter", "length"))
def mel_to_audio(
    mel: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    sr: int = SAMPLE_RATE,
    fmin: float = 90.0,
    fmax: float = 7600.0,
    n_iter: int = 32,
    length: int | None = None,
    normalized: bool = True,
) -> jnp.ndarray:
    """Invert a (normalised) log-mel spectrogram to audio via Griffin-Lim.

    Parity target: Audio2Mel.mel_to_audio (audio_funcs.py:77-85), which
    undoes the [0,1] normalisation, squares to a power spectrum and runs
    librosa's 32-iteration Griffin-Lim.  Fully jitted: the mel
    pseudo-inverse is a matmul, each GL iteration is one iSTFT + STFT.

    Args:
        mel: [n_mels, T'] normalised log-mel (or raw log-mel when
            normalized=False).
    Returns:
        [length or hop*T'] waveform estimate.
    """
    if normalized:
        log_mel = mel * (-LOG_MEL_MIN) + LOG_MEL_MIN
    else:
        log_mel = mel
    power = jnp.exp(log_mel) ** 2  # magnitude**2 spectrum in mel space

    # NNLS-lite: pseudo-inverse projection clipped at 0 (librosa uses nnls).
    pinv = jnp.asarray(np.linalg.pinv(mel_filterbank(sr, n_fft, mel.shape[0], fmin, fmax)))
    spec_power = jnp.clip(pinv @ power, 0.0)  # [F, T']
    mag = jnp.sqrt(spec_power)

    T_frames = mel.shape[1]
    # Synthesise at the full frame extent; an explicit `length` trims (or
    # zero-extends) only the RETURNED waveform - a shorter length must not
    # shrink the internal STFT, whose frame count the GL loop relies on.
    full = hop_length * T_frames
    if length is None:
        length = full
    pad = (n_fft - hop_length) // 2

    w_np = _hann_periodic(win_length)
    lpad = (n_fft - win_length) // 2
    window_np = np.pad(w_np, (lpad, n_fft - win_length - lpad))
    window = jnp.asarray(window_np)

    # iSTFT overlap-add as ONE scatter-add: [T', n_fft] target indices and
    # the input-independent window-power normaliser are trace-time
    # constants (the old per-frame dynamic_update_slice unroll traced
    # 2 ops per frame PER GL ITERATION - minutes of compile on long clips)
    frame_starts = np.arange(T_frames) * hop_length  # in padded coords
    ola_idx_np = frame_starts[:, None] + np.arange(n_fft)[None, :]
    wsum_np = np.zeros(full + 2 * pad, np.float64)
    np.add.at(wsum_np, ola_idx_np,
              np.broadcast_to(window_np.astype(np.float64) ** 2,
                              (T_frames, n_fft)))
    ola_idx = jnp.asarray(ola_idx_np)
    inv_wsum = jnp.asarray(1.0 / np.maximum(wsum_np, 1e-8), jnp.float32)

    def istft(spec):
        frames = jnp.fft.irfft(spec, n=n_fft, axis=0).T  # [T', n_fft]
        frames = frames * window
        y = jnp.zeros(full + 2 * pad).at[ola_idx].add(frames)
        y = y * inv_wsum
        return y[pad : pad + full]

    def stft_c(audio):
        return _stft_frames(audio, n_fft, hop_length, win_length, window, full)

    key_angles = jnp.zeros_like(mag)  # zero-phase init (deterministic)
    angles = jnp.exp(1j * key_angles)

    def gl_step(i, angles):
        y = istft(mag * angles)
        frames = stft_c(y)
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1).T  # [F, T'']
        spec = spec[:, :T_frames]
        return spec / jnp.maximum(jnp.abs(spec), 1e-16)

    angles = jax.lax.fori_loop(0, n_iter, gl_step, angles)
    y = istft(mag * angles)
    if length == full:
        return y
    if length < full:
        return y[:length]
    return jnp.pad(y, (0, length - full))

"""Audio2Headpose: autoregressive probabilistic 6-DoF head-pose generator.

Capability parity with models/audio2headpose.py (conditional WaveNet + GMM
head, plus the LSTM variant) and the autoregressive inference loop of
models/audio2headpose_model.py:133-203.

TPU re-design of the decode loop
--------------------------------
The reference slides a 255-frame window per output frame, recomputing the
full WaveNet every step and sampling the GMM on the CPU with a Python loop
(audio2headpose_model.py:169-187, losses.py:99-102) - per-frame cost
O(RF * layers) plus a device<->host round trip.  Here the whole utterance
decodes inside ONE `jax.lax.scan`:

* per-layer WaveNet ring buffers carry the receptive field (exact
  streaming, models/wavenet.py) - O(layers) work per frame;
* the audio conditioning projections for every layer and every frame are
  hoisted out of the scan into big MXU matmuls;
* GMM sampling runs on device with jax.random, keys threaded through the
  scan carry.

Alignment semantics match the reference exactly: with `frame_future` = f
and receptive field R, decode step i consumes audio row i+f (rows < 0
clamped to row 0, reproducing the fill-zero warmup that repeats
audio_feats[0] R-1 times, audio2headpose_model.py:153-157), and the
history window starts as `pre_headpose` repeated R times.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.config import Audio2HeadposeConfig
from livespeechportraits_tpu.models import nn_core, wavenet
from livespeechportraits_tpu.ops import gmm


def init_audio2headpose(key: jax.Array, cfg: Audio2HeadposeConfig) -> Dict[str, Any]:
    H = cfg.apc_hidden_size
    ks = jax.random.split(key, 4)
    return {
        "down1": nn_core.dense_init(ks[0], 2 * H, H),
        "down_bn": nn_core.batchnorm_init(H),
        "down2": nn_core.dense_init(ks[1], H, H),
        "wavenet": wavenet.init_wavenet(ks[2], cfg.wavenet, cfg.gmm_output_dim),
    }


def _audio_downsample(params: Dict[str, Any], audio: jnp.ndarray, training: bool):
    """[B, T, 1024] paired APC frames -> [B, T, 512] conditioning
    (audio2headpose.py:16-21 MLP; BatchNorm over flattened rows)."""
    B, T, D = audio.shape
    x = audio.reshape(B * T, D)
    x = nn_core.dense(params["down1"], x)
    x, bn = nn_core.batchnorm(params["down_bn"], x, training)
    x = nn_core.leaky_relu(x)
    x = nn_core.dense(params["down2"], x)
    return x.reshape(B, T, -1), bn


def apply_audio2headpose(
    params: Dict[str, Any],
    cfg: Audio2HeadposeConfig,
    history: jnp.ndarray,
    audio_feats: jnp.ndarray,
    output_length: Optional[int] = None,
    training: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Training/batch forward (audio2headpose.py:40-52).

    Args:
        history: [B, L, 12] pose+velocity history window.
        audio_feats: [B, L, 1024] paired APC features (audio_windows=2).
        output_length: crop to trailing frames (time_frame_length in
            training, 1 at reference-style inference).
    Returns:
        ([B, output_length, (2*ndim+1)*ncenter] GMM params, updated params).
    """
    cond, bn = _audio_downsample(params, audio_feats, training)
    preds = wavenet.forward(
        params["wavenet"], cfg.wavenet, history, cond,
        output_length=output_length, dropout_rng=dropout_rng,
    )
    return preds, dict(params, down_bn=bn)


# ---------------------------------------------------------------------------
# Autoregressive decode (one lax.scan for the whole utterance)
# ---------------------------------------------------------------------------


def _decode_scan(
    params: Dict[str, Any],
    cfg: Audio2HeadposeConfig,
    audio_ds: jnp.ndarray,
    pre_headpose: jnp.ndarray,
    key: jax.Array,
    nframe: int,
    sigma_scale: float,
) -> jnp.ndarray:
    """Core streaming decode; audio_ds: [T, cond_ch] downsampled audio."""
    R = cfg.wavenet.receptive_field
    f = cfg.frame_future
    wparams = params["wavenet"]

    # Warmup: prime ring buffers on R-1 frames of repeated pre_headpose with
    # the clamped audio rows (see module docstring for the index algebra).
    warm_times = np.arange(-(R - 1), 0)
    warm_idx = jnp.asarray(np.maximum(warm_times + f, 0))
    cond_warm = audio_ds[warm_idx][None]  # [1, R-1, C]
    x_warm = jnp.broadcast_to(pre_headpose, (1, R - 1, pre_headpose.shape[-1]))
    state = wavenet.stream_init(wparams, cfg.wavenet, x_warm, cond_warm)

    # Hoist per-layer conditional projections for all decode steps.
    step_idx = jnp.asarray(np.arange(nframe) + f)
    cond_steps = audio_ds[step_idx][None]  # [1, nframe, C]
    cond_proj = wavenet.precompute_cond_projections(wparams, cond_steps)
    if any(p is None for p in cond_proj):
        raise ValueError(
            "audio2headpose decoding needs a conditioned WaveNet "
            "(cfg.wavenet.cond=True); an unconditioned head-pose model "
            "would ignore the audio entirely")
    f_stack = jnp.stack([p[0][0] for p in cond_proj], axis=1)  # [nframe, L, C]
    g_stack = jnp.stack([p[1][0] for p in cond_proj], axis=1)
    # Per-step keys are fold_in(key, i): decode step i draws the same
    # randomness regardless of utterance length, so streaming decode
    # (pipeline/streaming.py) is sample-identical to this offline scan.
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(nframe))

    def step(carry, xs):
        state, x_prev = carry
        f_adds, g_adds, k = xs  # [L, C], [L, C], key
        proj_t = [(f_adds[li][None], g_adds[li][None]) for li in range(f_adds.shape[0])]
        state, out = wavenet.stream_step(
            wparams, cfg.wavenet, state, x_prev[None], cond_proj_t=proj_t
        )
        sample = gmm.sample_gmm(k, out, cfg.ncenter, cfg.ndim, sigma_scale=sigma_scale)
        return (state, sample[0]), sample[0]

    (_, _), samples = jax.lax.scan(step, (state, pre_headpose), (f_stack, g_stack, keys))
    return samples  # [nframe, ndim]


def generate_sequence(
    params: Dict[str, Any],
    cfg: Audio2HeadposeConfig,
    audio_feats: jnp.ndarray,
    pre_headpose: jnp.ndarray,
    key: jax.Array,
    sigma_scale: float = 0.3,
) -> jnp.ndarray:
    """Full-utterance AR head-pose decode
    (audio2headpose_model.py:133-189 parity).

    Args:
        audio_feats: [2T, 512] 120 Hz APC features.
        pre_headpose: [12] initial pose+velocity (zeros in demo.py:211).
        sigma_scale: GMM sampling temperature (demo.py:212 uses 0.3).
    Returns:
        [T - frame_future, 12] sampled pose (+velocity) sequence.
    """
    T = audio_feats.shape[0] // 2
    paired = audio_feats[: 2 * T].reshape(T, -1)[None]  # [1, T, 1024]
    audio_ds, _ = _audio_downsample(params, paired, training=False)
    nframe = T - cfg.frame_future
    if nframe <= 0:
        raise ValueError(
            f"utterance too short: {T} frames <= frame_future {cfg.frame_future}"
        )
    return _jit_decode(params, cfg, audio_ds[0], pre_headpose, key, nframe, float(sigma_scale))


@functools.partial(jax.jit, static_argnames=("cfg", "nframe", "sigma_scale"))
def _jit_decode(params, cfg, audio_ds, pre_headpose, key, nframe, sigma_scale):
    return _decode_scan(params, cfg, audio_ds, pre_headpose, key, nframe, sigma_scale)


# ---------------------------------------------------------------------------
# Reference-style sliding-window decode (oracle for equivalence tests)
# ---------------------------------------------------------------------------


def generate_sequence_sliding_window(
    params: Dict[str, Any],
    cfg: Audio2HeadposeConfig,
    audio_feats: jnp.ndarray,
    pre_headpose: jnp.ndarray,
    key: jax.Array,
    sigma_scale: float = 0.3,
) -> jnp.ndarray:
    """Direct transcription of the reference's O(T*RF) decode loop
    (audio2headpose_model.py:151-189), kept as a slow oracle: feeds the
    full 255-frame window through `wavenet.forward` per output frame.
    Uses the same per-step PRNG stream as `generate_sequence` so the two
    paths are comparable sample-for-sample.
    """
    R = cfg.wavenet.receptive_field
    f = cfg.frame_future
    T = audio_feats.shape[0] // 2
    paired = np.asarray(audio_feats[: 2 * T].reshape(T, -1))
    nframe = T - f
    audio_pad = np.concatenate([np.tile(paired[0], (R - 1, 1)), paired])

    history = jnp.broadcast_to(pre_headpose, (1, R, pre_headpose.shape[-1]))
    keys = [jax.random.fold_in(key, i) for i in range(nframe)]
    out = []
    for i in range(nframe):
        window_audio = jnp.asarray(audio_pad[i + f : i + f + R])[None]
        preds, _ = apply_audio2headpose(params, cfg, history, window_audio, output_length=1)
        sample = gmm.sample_gmm(keys[i], preds, cfg.ncenter, cfg.ndim, sigma_scale=sigma_scale)
        out.append(np.asarray(sample[0, 0]))
        history = jnp.concatenate([history[:, 1:], sample], axis=1)
    return jnp.asarray(np.stack(out))


# ---------------------------------------------------------------------------
# LSTM variant (models/audio2headpose.py:57-102)
# ---------------------------------------------------------------------------


def init_audio2headpose_lstm(key: jax.Array, cfg: Audio2HeadposeConfig) -> Dict[str, Any]:
    H = cfg.apc_hidden_size
    ks = jax.random.split(key, 9)
    return {
        "down1": nn_core.dense_init(ks[0], 2 * H, H),
        "down_bn": nn_core.batchnorm_init(H),
        "down2": nn_core.dense_init(ks[1], H, H),
        "lstm": [
            nn_core.lstm_layer_init(ks[2], H, 256),
            nn_core.lstm_layer_init(ks[3], 256, 256),
            nn_core.lstm_layer_init(ks[4], 256, 256),
        ],
        "fc1": nn_core.dense_init(ks[5], 256, 512),
        "fc1_bn": nn_core.batchnorm_init(512),
        "fc2": nn_core.dense_init(ks[6], 512, 512),
        "fc2_bn": nn_core.batchnorm_init(512),
        "fc3": nn_core.dense_init(ks[7], 512, cfg.gmm_output_dim),
    }


def generate_sequence_lstm(
    params: Dict[str, Any],
    cfg: Audio2HeadposeConfig,
    audio_feats: jnp.ndarray,
    key: jax.Array,
    sigma_scale: float = 0.3,
) -> jnp.ndarray:
    """One-shot (non-autoregressive) LSTM-variant inference
    (audio2headpose_model.py:191-203): the whole utterance in one forward,
    GMM-sampled per frame.

    Args:
        audio_feats: [2T, 512] 120 Hz APC features.
    Returns:
        [T, ndim] sampled pose sequence.
    """
    T = audio_feats.shape[0] // 2
    paired = audio_feats[: 2 * T].reshape(T, -1)[None]
    preds, _ = apply_audio2headpose_lstm(params, paired, training=False)
    return gmm.sample_gmm(key, preds, cfg.ncenter, cfg.ndim, sigma_scale=sigma_scale)[0]


def apply_audio2headpose_lstm(
    params: Dict[str, Any], audio_feats: jnp.ndarray, training: bool = False
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """[B, T, 1024] -> [B, T, gmm_output_dim] one-shot (non-AR) variant."""
    cond, bn = _audio_downsample(params, audio_feats, training)
    y = cond
    for layer in params["lstm"]:
        y, _ = nn_core.lstm_layer(layer, y)
    B, T, _ = y.shape
    z = y.reshape(B * T, -1)
    z = nn_core.dense(params["fc1"], z)
    z, bn1 = nn_core.batchnorm(params["fc1_bn"], z, training)
    z = nn_core.leaky_relu(z)
    z = nn_core.dense(params["fc2"], z)
    z, bn2 = nn_core.batchnorm(params["fc2_bn"], z, training)
    z = nn_core.leaky_relu(z)
    z = nn_core.dense(params["fc3"], z)
    preds = z.reshape(B, T, -1)
    return preds, dict(params, down_bn=bn, fc1_bn=bn1, fc2_bn=bn2)

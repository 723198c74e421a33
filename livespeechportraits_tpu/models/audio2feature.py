"""Audio2Feature ("Audio2Mouth"): APC features -> mouth 3D-landmark deltas.

Capability parity with models/audio2feature.py:6-72 (LSTM decoder branch -
the reference's WaveNet branch is unrunnable: its `A2L_wavenet_*` options
are never defined, see SURVEY.md §2.3) and the whole-sequence inference API
of models/audio2feature_model.py:117-154.

Architecture (defaults from options/base_options_audio2feature.py):
    pair two 120 Hz APC frames -> [T, 1024]
    -> downsample MLP (1024 -> 512, BatchNorm1d + LeakyReLU, 512 -> 512)
    -> 3-layer LSTM(512 -> 256)
    -> fc MLP (256 -> 512 -> 512 -> 75) with BatchNorm1d + LeakyReLU
    => 75 outputs/frame = 25 mouth landmarks x 3 (delta from mean_pts3d).

Everything is one jit: the LSTM recurrences are lax.scans with their input
projections hoisted into full-sequence matmuls (models/nn_core.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from livespeechportraits_tpu.config import Audio2FeatureConfig, WaveNetConfig
from livespeechportraits_tpu.models import nn_core, wavenet


def head_dim(cfg: Audio2FeatureConfig) -> int:
    """Output width of the final projection: raw landmarks for L2, the
    packed [weights | means | -log sigma] GMM parameter block for the
    intended GMM mode (config.Audio2FeatureConfig.loss)."""
    if cfg.loss == "GMM":
        return (2 * cfg.output_dim + 1) * cfg.gmm_ncenter
    return cfg.output_dim


def init_audio2feature(key: jax.Array, cfg: Audio2FeatureConfig) -> Dict[str, Any]:
    H = cfg.apc_hidden_size
    ks = jax.random.split(key, 10)
    params: Dict[str, Any] = {
        "down1": nn_core.dense_init(ks[0], 2 * H, H),
        "down_bn": nn_core.batchnorm_init(H),
        "down2": nn_core.dense_init(ks[1], H, H),
        "lstm": [
            nn_core.lstm_layer_init(ks[2], H, cfg.lstm_hidden_size),
            nn_core.lstm_layer_init(ks[3], cfg.lstm_hidden_size, cfg.lstm_hidden_size),
            nn_core.lstm_layer_init(ks[4], cfg.lstm_hidden_size, cfg.lstm_hidden_size),
        ],
        "fc1": nn_core.dense_init(ks[5], cfg.lstm_hidden_size, 512),
        "fc1_bn": nn_core.batchnorm_init(512),
        "fc2": nn_core.dense_init(ks[6], 512, 512),
        "fc2_bn": nn_core.batchnorm_init(512),
        "fc3": nn_core.dense_init(ks[7], 512, head_dim(cfg)),
    }
    return params


def apply_audio2feature(
    params: Dict[str, Any],
    audio_feats: jnp.ndarray,
    training: bool = False,
    lstm_layer=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """[B, 2T, H] paired APC features -> [B, T, output_dim] predictions.

    Mirrors Audio2Feature.forward (audio2feature.py:55-72): reshape pairs
    of consecutive 120 Hz frames into one 1024-d vector per video frame,
    downsample, LSTM, project.  BatchNorm1d runs over the flattened
    [B*T, C] rows exactly like the reference's `.reshape(-1, ndim*2)`.

    lstm_layer overrides the recurrence implementation (identical math
    expected - e.g. the Pallas VMEM kernel for batch-1 inference).

    Returns (preds, params_with_updated_bn_stats).
    """
    if lstm_layer is None:
        lstm_layer = nn_core.lstm_layer
    B, T2, H = audio_feats.shape
    T = T2 // 2
    x = audio_feats.reshape(B * T, 2 * H)

    y = nn_core.dense(params["down1"], x)
    y, bn0 = nn_core.batchnorm(params["down_bn"], y, training)
    y = nn_core.leaky_relu(y)
    y = nn_core.dense(params["down2"], y)
    y = y.reshape(B, T, H)

    for layer in params["lstm"]:
        y, _ = lstm_layer(layer, y)

    z = y.reshape(B * T, -1)
    z = nn_core.dense(params["fc1"], z)
    z, bn1 = nn_core.batchnorm(params["fc1_bn"], z, training)
    z = nn_core.leaky_relu(z)
    z = nn_core.dense(params["fc2"], z)
    z, bn2 = nn_core.batchnorm(params["fc2_bn"], z, training)
    z = nn_core.leaky_relu(z)
    z = nn_core.dense(params["fc3"], z)
    preds = z.reshape(B, T, -1)

    new_params = dict(params, down_bn=bn0, fc1_bn=bn1, fc2_bn=bn2)
    return preds, new_params


# ---------------------------------------------------------------------------
# WaveNet decoder variant (audio2feature.py:17-31, 60-61).  The reference
# declares this branch but its A2L_wavenet_* options are never defined
# anywhere, so it cannot be constructed there (SURVEY.md §2.3); here it is a
# first-class runnable alternative: an unconditioned WaveNet consuming the
# APC features directly as its input stream.
# ---------------------------------------------------------------------------


def a2f_wavenet_config(cfg: Audio2FeatureConfig) -> WaveNetConfig:
    return WaveNetConfig(
        residual_layers=7, residual_blocks=2, dilation_channels=128,
        residual_channels=128, skip_channels=256, kernel_size=2,
        use_bias=True, cond=False, cond_channels=0,
        input_channels=cfg.apc_hidden_size,
    )


def init_audio2feature_wavenet(key: jax.Array, cfg: Audio2FeatureConfig) -> Dict[str, Any]:
    wn = a2f_wavenet_config(cfg)
    return {"wavenet": wavenet.init_wavenet(key, wn, cfg.output_dim)}


def apply_audio2feature_wavenet(
    params: Dict[str, Any],
    cfg: Audio2FeatureConfig,
    audio_feats: jnp.ndarray,
    output_length=None,
    dropout_rng=None,
) -> jnp.ndarray:
    """[B, T, H] APC features -> [B, T(or output_length), output_dim]."""
    wn = a2f_wavenet_config(cfg)
    return wavenet.forward(params["wavenet"], wn, audio_feats, None,
                           output_length=output_length, dropout_rng=dropout_rng)


@jax.jit
def _infer(params: Dict[str, Any], audio_feats: jnp.ndarray) -> jnp.ndarray:
    preds, _ = apply_audio2feature(params, audio_feats, training=False)
    return preds


def _infer_fast(params: Dict[str, Any], audio_feats: jnp.ndarray) -> jnp.ndarray:
    """Batch-1 inference with the LSTM recurrences on the Pallas VMEM
    kernel (ops/recurrent_pallas.py) - the SAME forward with only the
    recurrence implementation swapped, so the two paths cannot drift."""
    from livespeechportraits_tpu.ops import recurrent_pallas as rp

    preds, _ = apply_audio2feature(params, audio_feats, training=False,
                                   lstm_layer=rp.lstm_layer_pallas)
    return preds


def generate_sequence(
    params: Dict[str, Any],
    audio_feats: jnp.ndarray,
    frame_future: int = 18,
    cfg: Audio2FeatureConfig | None = None,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Whole-utterance inference (audio2feature_model.py:117-154 parity).

    Args:
        audio_feats: [2T, H] 120 Hz APC features for T video frames.
        frame_future: the model was trained to predict `frame_future`
            frames ahead; the tail is padded with the final feature and the
            first `frame_future` predictions dropped (audio2feature_model.py
            :133-135, 146-149).
        cfg: required for a GMM-trained head (cfg.loss == 'GMM'): the raw
            GMM parameter block is decoded to component means
            (ops/gmm.sample_gmm, sigma_scale=0; deterministic for
            gmm_ncenter == 1, `key` picks the component otherwise).
    Returns:
        [T, output_dim] mouth-delta predictions.
    """
    from livespeechportraits_tpu.ops import recurrent_pallas as rp

    T = audio_feats.shape[0] // 2
    feats = audio_feats[: 2 * T]
    if frame_future > 0:
        pad = jnp.broadcast_to(feats[-1], (2 * frame_future,) + feats.shape[1:])
        feats = jnp.concatenate([feats, pad], axis=0)
    infer = _infer_fast if rp.supports_pallas() else _infer
    preds = infer(params, feats[None])[0]
    if cfg is not None and cfg.loss == "GMM":
        from livespeechportraits_tpu.ops import gmm

        if key is None:
            key = jax.random.PRNGKey(0)
        preds = gmm.sample_gmm(key, preds, cfg.gmm_ncenter, cfg.output_dim,
                               sigma_scale=0.0)
    if frame_future > 0:
        preds = preds[frame_future:]
    return preds[:T]

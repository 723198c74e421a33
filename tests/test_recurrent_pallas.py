"""Pallas recurrence kernels: interpret-mode equivalence with the XLA
scans (compiled-mode equivalence + ~2x speedup measured on the real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.models import apc, nn_core
from livespeechportraits_tpu.config import APCConfig
from livespeechportraits_tpu.ops import recurrent_pallas as rp


def test_gru_kernel_matches_scan():
    p = nn_core.gru_layer_init(jax.random.PRNGKey(0), 80, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 37, 80))
    ref, h_ref = nn_core.gru_layer(p, x)
    ys, hT = rp.gru_layer_pallas(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)
    # state keeps nn_core's [B, H] rank (cross-backend carrying)
    assert np.asarray(hT).shape == np.asarray(h_ref).shape
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h_ref), atol=1e-5)


def test_gru_kernel_chunking_carries_state():
    """Sequences longer than CHUNK_T split across pallas calls with the
    hidden state carried - must equal the single scan."""
    old = rp.CHUNK_T
    rp.CHUNK_T = 16
    try:
        p = nn_core.gru_layer_init(jax.random.PRNGKey(2), 12, 24)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 50, 12))
        ref, _ = nn_core.gru_layer(p, x)
        ys, _ = rp.gru_layer_pallas(p, x, interpret=True)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)
    finally:
        rp.CHUNK_T = old


def test_lstm_kernel_matches_scan():
    p = nn_core.lstm_layer_init(jax.random.PRNGKey(0), 48, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 29, 48))
    ref, (h_ref, c_ref) = nn_core.lstm_layer(p, x)
    ys, (h, c) = rp.lstm_layer_pallas(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)
    assert np.asarray(h).shape == np.asarray(h_ref).shape
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-5)


def test_apc_encode_pallas_matches_encode():
    cfg = APCConfig(mel_dim=16, hidden_size=32, num_layers=2)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    mels = jax.random.normal(jax.random.PRNGKey(1), (25, 16))
    ref = apc.encode(params, mels[None])[0]
    ours = rp.apc_encode_pallas(params, mels, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_encode_fast_cpu_fallback():
    """Off-TPU, encode_fast must fall back to the scan path."""
    cfg = APCConfig(mel_dim=8, hidden_size=16, num_layers=1)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    mels = jax.random.normal(jax.random.PRNGKey(1), (10, 8))
    out = apc.encode_fast(params, mels)
    ref = apc.encode(params, mels[None])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

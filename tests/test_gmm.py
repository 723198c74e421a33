import math

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.ops import gmm


def _pack(logits, mu, neg_log_sigma):
    """[b,T,ncenter], [b,T,ncenter,ndim], [b,T,ncenter,ndim] -> packed."""
    b, T, nc, nd = mu.shape
    return np.concatenate(
        [logits.reshape(b, T, nc), mu.reshape(b, T, nc * nd), neg_log_sigma.reshape(b, T, nc * nd)],
        axis=-1,
    ).astype(np.float32)


def test_gmm_nll_closed_form_single_center():
    """For ncenter=1 the NLL per element is
    0.5 log(2 pi) + log(sigma) + 0.5 ((x - mu)/sigma)^2 (losses.py:38-44)."""
    b, T, nd = 2, 3, 4
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(b, T, 1, nd))
    sigma = rng.uniform(0.1, 2.0, size=(b, T, 1, nd))
    target = rng.normal(size=(b, T, nd))
    packed = _pack(np.zeros((b, T, 1)), mu, -np.log(sigma))
    loss = float(gmm.gmm_log_loss(jnp.asarray(packed), jnp.asarray(target), 1, nd))
    ref = (0.5 * math.log(2 * math.pi) + np.log(sigma[:, :, 0]) +
           0.5 * ((target - mu[:, :, 0]) / sigma[:, :, 0]) ** 2).mean()
    assert abs(loss - ref) < 1e-5


def test_gmm_nll_sigma_min_clamp():
    """Predicted sigma below sigma_min must be clamped to sigma_min."""
    b, T, nd = 1, 1, 2
    mu = np.zeros((b, T, 1, nd))
    target = np.zeros((b, T, nd))
    packed = _pack(np.zeros((b, T, 1)), mu, np.full((b, T, 1, nd), 50.0))  # sigma=e^-50
    loss = float(gmm.gmm_log_loss(jnp.asarray(packed), jnp.asarray(target), 1, nd, sigma_min=0.03))
    ref = 0.5 * math.log(2 * math.pi) + math.log(0.03)
    assert abs(loss - ref) < 1e-5


def test_sample_gmm_zero_sigma_scale_returns_means():
    b, T, nc, nd = 2, 5, 3, 4
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(b, T, nc, nd))
    # one dominant component per element
    logits = np.zeros((b, T, nc))
    logits[..., 1] = 50.0
    packed = _pack(logits, mu, np.zeros((b, T, nc, nd)))
    out = np.asarray(
        gmm.sample_gmm(jax.random.key(0), jnp.asarray(packed), nc, nd, sigma_scale=0.0)
    )
    np.testing.assert_allclose(out, mu[:, :, 1], atol=1e-6)


def test_sample_gmm_statistics():
    """Sampling with sigma_scale=1 should match mu/sigma moments."""
    n, nd = 4000, 2
    mu = np.tile(np.array([1.0, -2.0]), (1, n, 1, 1)).reshape(1, n, 1, nd)
    sigma = np.tile(np.array([0.5, 2.0]), (1, n, 1, 1)).reshape(1, n, 1, nd)
    packed = _pack(np.zeros((1, n, 1)), mu, -np.log(sigma))
    out = np.asarray(
        gmm.sample_gmm(jax.random.key(2), jnp.asarray(packed), 1, nd, sigma_scale=1.0)
    )[0]
    np.testing.assert_allclose(out.mean(axis=0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(out.std(axis=0), [0.5, 2.0], atol=0.15)


def test_sample_gmm_component_selection_weights():
    """Categorical pick should follow softmax weights."""
    n, nc, nd = 6000, 2, 1
    mu = np.zeros((1, n, nc, nd))
    mu[:, :, 0, 0] = 0.0
    mu[:, :, 1, 0] = 10.0
    logits = np.zeros((1, n, nc))
    logits[..., 1] = math.log(3.0)  # weights 1:3
    packed = _pack(logits, mu, np.zeros((1, n, nc, nd)))
    out = np.asarray(gmm.sample_gmm(jax.random.key(3), jnp.asarray(packed), nc, nd, sigma_scale=0.0))
    frac_high = (out[0, :, 0] > 5).mean()
    assert abs(frac_high - 0.75) < 0.03

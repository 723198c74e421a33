"""Diagonal-GMM negative log-likelihood and on-device sampling.

Capability parity with models/losses.py:8-112 (GMMLogLoss, Sample_GMM).
The reference's sampler copies logits to the CPU and loops over every
(batch x time) element in Python (losses.py:99-102) - inside the per-frame
autoregressive head-pose loop this is its main inference bottleneck.  Here
sampling is a fully vectorised jax.random program that runs on device and
composes with lax.scan (see models/audio2headpose.py).

Convention (identical to the reference): the network predicts, per mixture
center, [weight logits (ncenter), means (ncenter*ndim), *negative log
sigma* (ncenter*ndim)]; sigma_min clamps sigma from below during the loss.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@functools.partial(jax.jit, static_argnames=("ncenter", "ndim", "sigma_min"))
def gmm_log_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    ncenter: int,
    ndim: int,
    sigma_min: float = 0.03,
) -> jnp.ndarray:
    """Mean negative log-likelihood of a diagonal GMM (losses.py:23-65).

    Note: like the reference, for ncenter == 1 the weight logits do not
    enter the loss (single-component NLL, mean over b/T/center/dim).

    Args:
        output: [b, T, (2*ndim+1)*ncenter] raw network output.
        target: [b, T, ndim].
    """
    b, T, _ = target.shape
    mus = output[:, :, ncenter : ncenter + ncenter * ndim].reshape(b, T, ncenter, ndim)
    neg_log_sigma = output[:, :, ncenter + ncenter * ndim :].reshape(b, T, ncenter, ndim)
    # sigma >= sigma_min  <=>  -log sigma <= log(1/sigma_min)
    neg_log_sigma = jnp.minimum(neg_log_sigma, math.log(1.0 / sigma_min))
    inv_sigma = jnp.exp(neg_log_sigma)
    diff = target[:, :, None, :] - mus
    nll = _HALF_LOG_2PI - neg_log_sigma + 0.5 * (diff * inv_sigma) ** 2
    return nll.mean()


@functools.partial(jax.jit, static_argnames=("ncenter", "ndim"))
def sample_gmm(
    key: jax.Array,
    gmm_params: jnp.ndarray,
    ncenter: int,
    ndim: int,
    weight_smooth: float = 0.0,
    sigma_scale: float = 0.0,
) -> jnp.ndarray:
    """Draw one sample per (batch, time) element from predicted GMMs.

    Vectorised, on-device equivalent of losses.py:68-112: softmax the
    (smoothed) weight logits, pick a component categorically, then sample
    mu + sigma * sigma_scale * eps.  sigma_scale=0 returns component means
    (used for the smooth loss and deterministic decoding).

    Args:
        gmm_params: [..., (2*ndim+1)*ncenter] (any leading shape).
    Returns:
        [..., ndim] samples.
    """
    lead = gmm_params.shape[:-1]
    flat = gmm_params.reshape(-1, gmm_params.shape[-1])
    n = flat.shape[0]

    logits = flat[:, :ncenter] * (1.0 + weight_smooth)
    mu = flat[:, ncenter : ncenter + ncenter * ndim].reshape(n, ncenter, ndim)
    sigma = jnp.exp(-flat[:, ncenter + ncenter * ndim :]).reshape(n, ncenter, ndim)
    sigma = sigma * sigma_scale

    k_cat, k_norm = jax.random.split(key)
    comp = jax.random.categorical(k_cat, logits, axis=-1)  # [n]
    sel_mu = jnp.take_along_axis(mu, comp[:, None, None], axis=1)[:, 0]  # [n, ndim]
    sel_sigma = jnp.take_along_axis(sigma, comp[:, None, None], axis=1)[:, 0]
    eps = jax.random.normal(k_norm, (n, ndim), dtype=flat.dtype)
    sample = sel_mu + sel_sigma * eps
    return sample.reshape(*lead, ndim)

"""Microbatched VGG perceptual/style loss (losses.vgg_style_loss
microbatch=m): numerical equivalence to the unchunked form, gradient
equivalence, and memory-boundedness intent (the tower is rematerialised
per chunk, so peak activations scale with m, not B).

Reference for the loss being chunked: /root/reference/models/losses.py:
236-267 (VGG19 perceptual), assembled at feature2face_model.py:140-143.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livespeechportraits_tpu.models import losses


@pytest.fixture(scope="module")
def vgg():
    return losses.init_vgg19(0)


def _pair(b=8, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32))
    return x, y


@pytest.mark.parametrize("m", [1, 2, 4])
def test_microbatch_matches_unchunked(vgg, m):
    x, y = _pair()
    p0, s0 = losses.vgg_style_loss(vgg, x, y)
    p1, s1 = losses.vgg_style_loss(vgg, x, y, microbatch=m)
    np.testing.assert_allclose(float(p1), float(p0), rtol=2e-5)
    np.testing.assert_allclose(float(s1), float(s0), rtol=2e-4)


def test_microbatch_gradient_matches(vgg):
    x, y = _pair(b=4, hw=16)

    def full(x):
        p, s = losses.vgg_style_loss(vgg, x, y)
        return p + s

    def chunked(x):
        p, s = losses.vgg_style_loss(vgg, x, y, microbatch=2)
        return p + s

    g0 = jax.grad(full)(x)
    g1 = jax.grad(chunked)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=5e-4, atol=1e-6)


def test_microbatch_under_jit_and_style_off(vgg):
    x, y = _pair(b=4, hw=16, seed=3)
    p0, s0 = losses.vgg_style_loss(vgg, x, y, style=False)
    p1, s1 = jax.jit(
        lambda x, y: losses.vgg_style_loss(vgg, x, y, style=False,
                                           microbatch=2))(x, y)
    np.testing.assert_allclose(float(p1), float(p0), rtol=2e-5)
    assert float(s0) == float(s1) == 0.0


def test_microbatch_must_divide_batch(vgg):
    x, y = _pair(b=6, hw=16)
    with pytest.raises(ValueError, match="divide"):
        losses.vgg_style_loss(vgg, x, y, microbatch=4)


def test_f2f_step_with_vgg_microbatch_runs():
    """A full fused GAN step with the chunked VGG loss compiles and takes
    a finite step (the production-recipe configuration in miniature)."""
    import optax

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f
    from livespeechportraits_tpu.train import state as state_mod, steps

    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5,
                             load_size=32, num_D=2, n_layers_D=2)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = f2f.init_generator(kg, cfg)
    d = f2f.init_discriminator(kd, cfg)
    tx = optax.adam(2e-4)
    g_state = state_mod.create_state(g["net"], tx)
    d_state = state_mod.create_state(d, tx)
    vgg = losses.init_vgg19(0)
    gan_step = steps.make_f2f_fused_step(cfg, tx, tx, vgg_params=vgg,
                                         vgg_microbatch=2)
    rng = np.random.default_rng(0)
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)),
    }
    g_state, d_state, metrics = gan_step(g_state, d_state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["VGG"]) > 0.0

"""Analytic generator FLOPs (utils/flops.py) vs XLA's own cost model.

bench.py reports MFU from the analytic count (backend-independent - round
2's mfu:null came from trusting the live backend's cost_analysis inside a
bare except).  These tests pin the analytic walk to the compiler's number
for every generator size so the bench figure stays honest.
"""

import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import Feature2FaceConfig
from livespeechportraits_tpu.models import feature2face as f2f
from livespeechportraits_tpu.utils.flops import generator_flops, render_peak_flops


def _xla_flops(size: str, net, img: int, input_nc: int) -> float:
    def fwd(net, x):
        y, _ = f2f.apply_generator({"net": net, "size": size}, x, training=False)
        return y

    x = jnp.zeros((1, img, img, input_nc), jnp.float32)
    cost = jax.jit(fwd).lower(net, x).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


@pytest.mark.parametrize("size,n_down,img", [
    ("small", 6, 64),
    ("normal", 6, 64),
    ("large", 6, 64),
    ("large", 8, 256),
])
def test_analytic_matches_xla(size, n_down, img):
    cfg = Feature2FaceConfig(size=size, ngf=64, n_downsample=n_down,
                             load_size=img)
    params = f2f.init_generator(jax.random.PRNGKey(0), cfg)
    xla = _xla_flops(size, params["net"], img, cfg.input_nc)
    mine = generator_flops(params["net"], size, img)
    assert mine == pytest.approx(xla, rel=1e-4)


def test_batch_scales_linearly():
    cfg = Feature2FaceConfig(size="normal", ngf=32, n_downsample=6,
                             load_size=64)
    params = f2f.init_generator(jax.random.PRNGKey(0), cfg)
    one = generator_flops(params["net"], "normal", 64, batch=1)
    four = generator_flops(params["net"], "normal", 64, batch=4)
    assert four == pytest.approx(4 * one)


def test_flagship_number_is_the_verified_one():
    # The 512^2 'large' generator is 244.2 GFLOP/frame (independently
    # verified via XLA cost analysis in the round-2 review).
    cfg = Feature2FaceConfig(size="large", ngf=64, n_downsample=8,
                             load_size=512)
    params = f2f.init_generator(jax.random.PRNGKey(0), cfg)
    g = generator_flops(params["net"], "large", 512) / 1e9
    assert 243.0 < g < 246.0


def test_peak_lookup():
    peak, label = render_peak_flops("TPU v5 lite0")
    assert peak == 197e12 and label == "v5 lite"
    peak, label = render_peak_flops("cpu")
    assert peak is None and label is None

"""WaveNet: receptive field, torch-oracle parity, streaming equivalence."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import WaveNetConfig
from livespeechportraits_tpu.models import wavenet

TINY = WaveNetConfig(
    residual_layers=3, residual_blocks=2, dilation_channels=8,
    residual_channels=8, skip_channels=16, cond_channels=12,
    input_channels=4, use_bias=True, cond=True,
)


def test_receptive_field_formula():
    assert WaveNetConfig().receptive_field == 255  # A2H defaults (SURVEY §6)
    assert TINY.receptive_field == 1 + 2 * (2**3 - 1)
    assert TINY.dilations == (1, 2, 4, 1, 2, 4)


def test_forward_shapes_and_crop():
    key = jax.random.PRNGKey(0)
    params = wavenet.init_wavenet(key, TINY, output_channels=9)
    x = jax.random.normal(key, (2, 20, 4))
    cond = jax.random.normal(key, (2, 20, 12))
    out = wavenet.forward(params, TINY, x, cond)
    assert out.shape == (2, 20, 9)
    out5 = wavenet.forward(params, TINY, x, cond, output_length=5)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out[:, -5:]), atol=1e-6)


def test_causality():
    """Output at position t must not depend on inputs at positions > t."""
    key = jax.random.PRNGKey(1)
    params = wavenet.init_wavenet(key, TINY, output_channels=3)
    # The 0.02-gain init makes deep outputs vanishingly small; scale the
    # weights up so perturbation effects are measurable.
    params = jax.tree.map(lambda a: a * 5.0, params)
    x = jax.random.normal(key, (1, 16, 4))
    cond = jax.random.normal(key, (1, 16, 12))
    base = np.asarray(wavenet.forward(params, TINY, x, cond))
    x2 = x.at[0, 10:].set(99.0)
    cond2 = cond.at[0, 10:].set(99.0)
    pert = np.asarray(wavenet.forward(params, TINY, x2, cond2))
    np.testing.assert_allclose(base[0, :10], pert[0, :10], atol=1e-5)
    assert np.abs(base[0, 10:] - pert[0, 10:]).max() > 1e-3


def test_receptive_field_is_tight():
    """Perturbing input at t - (RF-1) changes output at t; at t - RF does not."""
    R = TINY.receptive_field
    T = R + 4
    key = jax.random.PRNGKey(2)
    params = wavenet.init_wavenet(key, TINY, output_channels=3)
    # The longest-range path multiplies one weight per layer; scale weights
    # so its contribution stays above float32 noise.
    params = jax.tree.map(lambda a: a * 20.0, params)
    x = jax.random.normal(key, (1, T, 4))
    cond = jnp.zeros((1, T, 12))
    base = np.asarray(wavenet.forward(params, TINY, x, cond))
    t = T - 1
    inside = np.asarray(wavenet.forward(params, TINY, x.at[0, t - (R - 1)].add(10.0), cond))
    outside = np.asarray(wavenet.forward(params, TINY, x.at[0, t - R].add(10.0), cond))
    assert np.abs(base[0, t] - inside[0, t]).max() > 1e-5
    np.testing.assert_allclose(base[0, t], outside[0, t], atol=1e-5)


def test_streaming_equals_full_forward():
    """stream_init + stream_step must reproduce the full conv's outputs."""
    key = jax.random.PRNGKey(3)
    params = wavenet.init_wavenet(key, TINY, output_channels=5)
    T_hist, T_steps = 10, 12
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (1, T_hist + T_steps, 4))
    cond = jax.random.normal(kc, (1, T_hist + T_steps, 12))

    full = np.asarray(wavenet.forward(params, TINY, x, cond))

    state = wavenet.stream_init(params, TINY, x[:, :T_hist], cond[:, :T_hist])
    outs = []
    for t in range(T_hist, T_hist + T_steps):
        state, y = wavenet.stream_step(params, TINY, state, x[:, t], cond[:, t])
        outs.append(np.asarray(y[0]))
    np.testing.assert_allclose(np.stack(outs), full[0, T_hist:], atol=1e-4)


def test_streaming_equals_sliding_window():
    """The reference decodes by re-running a full RF-length window per frame
    and reading the last position (audio2headpose_model.py:169-187 with
    test-time output_length=1).  The stream must match it exactly."""
    R = TINY.receptive_field
    key = jax.random.PRNGKey(4)
    params = wavenet.init_wavenet(key, TINY, output_channels=5)
    kx, kc = jax.random.split(key)
    T = R + 6
    x = jax.random.normal(kx, (1, T, 4))
    cond = jax.random.normal(kc, (1, T, 12))

    # Oracle: sliding 255-window, crop last frame.
    oracle = []
    for i in range(T - R + 1):
        win_o = wavenet.forward(
            params, TINY, x[:, i : i + R], cond[:, i : i + R], output_length=1
        )
        oracle.append(np.asarray(win_o[0, 0]))

    # Stream: prime on the first R-1 frames, then step.
    state = wavenet.stream_init(params, TINY, x[:, : R - 1], cond[:, : R - 1])
    stream = []
    for t in range(R - 1, T):
        state, y = wavenet.stream_step(params, TINY, state, x[:, t], cond[:, t])
        stream.append(np.asarray(y[0]))

    np.testing.assert_allclose(np.stack(stream), np.stack(oracle), atol=1e-4)


def test_forward_matches_reference_torch_module():
    """Oracle: the reference's own torch WaveNet (imported read-only from
    /root/reference) with weights converted via utils.torch_convert."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.networks import WaveNet as RefWaveNet  # type: ignore
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.pop(0)

    from livespeechportraits_tpu.utils import torch_convert

    torch.manual_seed(0)
    ref = RefWaveNet(
        residual_layers=TINY.residual_layers,
        residual_blocks=TINY.residual_blocks,
        dilation_channels=TINY.dilation_channels,
        residual_channels=TINY.residual_channels,
        skip_channels=TINY.skip_channels,
        kernel_size=2,
        output_length=6,
        use_bias=True,
        cond=True,
        input_channels=TINY.input_channels,
        ncenter=1,
        ndim=7,
        output_channels=9,
        cond_channels=TINY.cond_channels,
    )
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_convert.convert_wavenet(sd, TINY, prefix="")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20, TINY.input_channels)).astype(np.float32)
    cond = rng.normal(size=(2, 20, TINY.cond_channels)).astype(np.float32)

    ours = np.asarray(
        wavenet.forward(params, TINY, jnp.asarray(x), jnp.asarray(cond), output_length=6)
    )
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(cond.transpose(0, 2, 1))
        ).numpy()
    assert ours.shape == out_ref.shape
    np.testing.assert_allclose(ours, out_ref, atol=2e-5)

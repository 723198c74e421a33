"""Parity tests for the functional NN toolkit against torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from livespeechportraits_tpu.models import nn_core


def test_gru_layer_matches_torch():
    B, T, I, H = 2, 11, 8, 16
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, I)).astype(np.float32)

    t_gru = torch.nn.GRU(I, H, batch_first=True)
    params = {
        "w_ih": jnp.asarray(t_gru.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(t_gru.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(t_gru.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(t_gru.bias_hh_l0.detach().numpy()),
    }
    ours, hT = nn_core.gru_layer(params, jnp.asarray(x))
    with torch.no_grad():
        ref, ref_h = t_gru(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), ref_h[0].numpy(), atol=1e-5)


def test_lstm_layer_matches_torch():
    B, T, I, H = 3, 9, 10, 12
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, I)).astype(np.float32)

    t_lstm = torch.nn.LSTM(I, H, batch_first=True)
    params = {
        "w_ih": jnp.asarray(t_lstm.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(t_lstm.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(t_lstm.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(t_lstm.bias_hh_l0.detach().numpy()),
    }
    ours, (hT, cT) = nn_core.lstm_layer(params, jnp.asarray(x))
    with torch.no_grad():
        ref, (rh, rc) = t_lstm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), rh[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), rc[0].numpy(), atol=1e-5)


def test_conv1d_matches_torch_dilated():
    B, W, I, O, k, d = 2, 20, 4, 6, 2, 4
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, W, I)).astype(np.float32)
    t_conv = torch.nn.Conv1d(I, O, k, dilation=d)
    params = {
        "w": jnp.asarray(t_conv.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(t_conv.bias.detach().numpy()),
    }
    pad = (k - 1) * d
    ours = nn_core.conv1d(params, jnp.asarray(x), dilation=d, padding=[(pad, 0)])
    with torch.no_grad():
        xt = torch.nn.functional.pad(torch.from_numpy(x.transpose(0, 2, 1)), (pad, 0))
        ref = t_conv(xt).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_conv2d_matches_torch():
    B, H, W, I, O = 2, 12, 12, 3, 5
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, H, W, I)).astype(np.float32)
    t_conv = torch.nn.Conv2d(I, O, 3, stride=2, padding=1)
    params = {
        "w": jnp.asarray(t_conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(t_conv.bias.detach().numpy()),
    }
    ours = nn_core.conv2d(params, jnp.asarray(x), stride=2, padding=1)
    with torch.no_grad():
        ref = t_conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    B, H, W, I, O = 2, 8, 8, 4, 6
    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, H, W, I)).astype(np.float32)
    t_conv = torch.nn.ConvTranspose2d(I, O, 4, stride=2, padding=1)
    params = {
        "w": jnp.asarray(t_conv.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "b": jnp.asarray(t_conv.bias.detach().numpy()),
    }
    ours = nn_core.conv_transpose2d(params, jnp.asarray(x), stride=2, padding=1)
    with torch.no_grad():
        ref = t_conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (B, 2 * H, 2 * W, O)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_batchnorm_matches_torch_train_and_eval():
    B, C = 16, 7
    rng = np.random.default_rng(5)
    x = rng.normal(2.0, 3.0, size=(B, C)).astype(np.float32)
    t_bn = torch.nn.BatchNorm1d(C)
    params = nn_core.batchnorm_init(C)

    t_bn.train()
    ref = t_bn(torch.from_numpy(x)).detach().numpy()
    ours, new_params = nn_core.batchnorm(params, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["mean"]), t_bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["var"]), t_bn.running_var.numpy(), atol=1e-4)

    t_bn.eval()
    ref_eval = t_bn(torch.from_numpy(x)).detach().numpy()
    ours_eval, _ = nn_core.batchnorm(new_params, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, atol=1e-4)


def test_batchnorm_onepass_matches_default():
    """LSP_BN_ONEPASS training stats (single fused sum/sumsq pass +
    folded FMA normalise) match the two-pass default: outputs, running
    stats and input gradients, in f32 and bf16."""
    B, H, W, C = 4, 6, 5, 7
    rng = np.random.default_rng(11)
    x32 = rng.normal(1.5, 2.0, size=(B, H, W, C)).astype(np.float32)
    params = nn_core.batchnorm_init(C, jax.random.PRNGKey(3))

    # a non-degenerate loss: sum(y*y) has a catastrophically-cancelling
    # BN gradient (~1e-5 true value vs ~1e-1 bf16 rounding noise in BOTH
    # paths), so weight y by fixed random v instead
    v = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    def loss(p, x, flag):
        old = nn_core.BN_ONEPASS
        nn_core.BN_ONEPASS = flag
        try:
            y, newp = nn_core.batchnorm(p, x, training=True)
        finally:
            nn_core.BN_ONEPASS = old
        return jnp.sum(y.astype(jnp.float32) * v), (y, newp)

    grad = jax.value_and_grad(loss, argnums=1, has_aux=True)
    (_, (y_ref, _)), g_ref = grad(params, jnp.asarray(x32), False)
    g_ref = np.asarray(g_ref, np.float32)
    gscale = np.abs(g_ref).max()

    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 3e-2)):
        x = jnp.asarray(x32).astype(dtype)
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        (l0, (y0, n0)), g0 = grad(p, x, False)
        (l1, (y1, n1)), g1 = grad(p, x, True)
        assert y1.dtype == y0.dtype
        np.testing.assert_allclose(np.asarray(y1, np.float32),
                                   np.asarray(y0, np.float32), atol=tol, rtol=tol)
        for k in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(n1[k], np.float32),
                                       np.asarray(n0[k], np.float32),
                                       atol=tol, rtol=tol)
        # both paths must sit within dtype noise of the f32 reference grad
        for g in (g0, g1):
            assert np.abs(np.asarray(g, np.float32) - g_ref).max() <= tol * gscale


def test_avg_pool_matches_torch():
    B, H, W, C = 2, 9, 9, 3
    rng = np.random.default_rng(6)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    ours = nn_core.avg_pool(jnp.asarray(x), 3, 2, 1)
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1, count_include_pad=False
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_upsample_nearest():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    y = nn_core.upsample_nearest_2x(x)
    assert y.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]), np.full((2, 2), x[0, 0, 0, 0]))

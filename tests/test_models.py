"""Model-family tests: shapes, AR decode equivalence, torch-oracle parity
for Audio2Feature / Audio2Headpose via converted reference modules."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import (
    APCConfig,
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    WaveNetConfig,
)
from livespeechportraits_tpu.models import (
    apc,
    audio2feature,
    audio2headpose,
    create_model,
)

# cond_channels must equal apc_hidden_size (the downsample MLP's output),
# mirroring the reference defaults (cond 512 = APC hidden 512).
TINY_WN = WaveNetConfig(
    residual_layers=3, residual_blocks=2, dilation_channels=8,
    residual_channels=8, skip_channels=16, cond_channels=8,
    input_channels=12, use_bias=True, cond=True,
)
TINY_A2H = Audio2HeadposeConfig(apc_hidden_size=8, wavenet=TINY_WN, frame_future=2)
TINY_A2F = Audio2FeatureConfig(apc_hidden_size=16, lstm_hidden_size=8, output_dim=6)


def _ref_import():
    sys.path.insert(0, "/root/reference")
    try:
        import models.networks as ref_networks  # type: ignore
        return ref_networks
    finally:
        sys.path.pop(0)


def test_registry():
    md = create_model("audio2feature")
    assert callable(md.init) and callable(md.apply)
    with pytest.raises(KeyError):
        create_model("nope")


def test_apc_shapes_and_residual():
    cfg = APCConfig(mel_dim=6, hidden_size=8, num_layers=3)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    mels = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 6))
    out = apc.apply_apc(params, mels)
    assert out.shape == (2, 12, 8)
    out_res = apc.apply_apc(params, mels, residual=True)
    assert out_res.shape == (2, 12, 8)
    assert np.abs(np.asarray(out - out_res)).max() > 0  # residual changes hiddens


def test_apc_matches_reference_torch():
    torch = pytest.importorskip("torch")
    ref_networks = _ref_import()
    from livespeechportraits_tpu.utils import torch_convert

    cfg = APCConfig(mel_dim=80, hidden_size=32, num_layers=3, residual=False)
    torch.manual_seed(0)
    ref = ref_networks.APC_encoder(cfg.mel_dim, cfg.hidden_size, cfg.num_layers, cfg.residual)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_convert.convert_apc(sd, cfg)

    rng = np.random.default_rng(0)
    mels = rng.normal(size=(1, 25, 80)).astype(np.float32)
    ours = np.asarray(apc.encode(params, jnp.asarray(mels)))
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(mels), torch.tensor([25.0])).numpy()
    np.testing.assert_allclose(ours, out_ref, atol=1e-5)


def test_audio2feature_shapes_and_frame_future():
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), TINY_A2F)
    T = 20
    feats = jax.random.normal(jax.random.PRNGKey(1), (2 * T, TINY_A2F.apc_hidden_size))
    preds = audio2feature.generate_sequence(params, feats, frame_future=3)
    assert preds.shape == (T, TINY_A2F.output_dim)
    preds0 = audio2feature.generate_sequence(params, feats, frame_future=0)
    assert preds0.shape == (T, TINY_A2F.output_dim)


def test_audio2feature_matches_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.audio2feature import Audio2Feature as RefA2F  # type: ignore
    finally:
        sys.path.pop(0)
    from livespeechportraits_tpu.utils import torch_convert

    class Opt:
        loss = "L2"
        feature_decoder = "LSTM"
        APC_hidden_size = 16
        predict_length = 1
        A2L_GMM_ndim = 6
        A2L_GMM_ncenter = 1
        time_frame_length = 1

    torch.manual_seed(0)
    ref = RefA2F(Opt())
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = Audio2FeatureConfig(apc_hidden_size=16, output_dim=6)
    params = torch_convert.convert_audio2feature(sd, cfg)

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 24, 16)).astype(np.float32)
    ours, _ = audio2feature.apply_audio2feature(params, jnp.asarray(feats), training=False)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=1e-5)


def test_audio2headpose_forward_shapes():
    params = audio2headpose.init_audio2headpose(jax.random.PRNGKey(0), TINY_A2H)
    L = TINY_WN.receptive_field + 4
    hist = jax.random.normal(jax.random.PRNGKey(1), (2, L, 12))
    audio = jax.random.normal(jax.random.PRNGKey(2), (2, L, 16))
    preds, _ = audio2headpose.apply_audio2headpose(params, TINY_A2H, hist, audio, output_length=5)
    assert preds.shape == (2, 5, TINY_A2H.gmm_output_dim)


def test_ar_decode_matches_sliding_window_oracle():
    """The one-scan streaming decode must reproduce the reference-style
    per-frame sliding-window loop sample-for-sample."""
    params = audio2headpose.init_audio2headpose(jax.random.PRNGKey(0), TINY_A2H)
    T = TINY_A2H.frame_future + 10
    feats = jax.random.normal(jax.random.PRNGKey(1), (2 * T, 8))
    pre = jnp.zeros(12)
    key = jax.random.PRNGKey(42)

    fast = np.asarray(
        audio2headpose.generate_sequence(params, TINY_A2H, feats, pre, key, sigma_scale=0.3)
    )
    slow = np.asarray(
        audio2headpose.generate_sequence_sliding_window(
            params, TINY_A2H, feats, pre, key, sigma_scale=0.3
        )
    )
    assert fast.shape == slow.shape == (10, 12)
    np.testing.assert_allclose(fast, slow, atol=2e-4)


def test_ar_decode_deterministic_with_zero_sigma():
    params = audio2headpose.init_audio2headpose(jax.random.PRNGKey(0), TINY_A2H)
    T = TINY_A2H.frame_future + 6
    feats = jax.random.normal(jax.random.PRNGKey(1), (2 * T, 8))
    pre = jnp.zeros(12)
    a = np.asarray(audio2headpose.generate_sequence(
        params, TINY_A2H, feats, pre, jax.random.PRNGKey(0), sigma_scale=0.0))
    b = np.asarray(audio2headpose.generate_sequence(
        params, TINY_A2H, feats, pre, jax.random.PRNGKey(7), sigma_scale=0.0))
    np.testing.assert_allclose(a, b, atol=1e-6)  # sigma_scale=0 -> means only


def test_audio2headpose_lstm_variant():
    params = audio2headpose.init_audio2headpose_lstm(jax.random.PRNGKey(0), TINY_A2H)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    preds, _ = audio2headpose.apply_audio2headpose_lstm(params, audio)
    assert preds.shape == (2, 7, TINY_A2H.gmm_output_dim)


def test_audio2headpose_lstm_generate():
    params = audio2headpose.init_audio2headpose_lstm(jax.random.PRNGKey(0), TINY_A2H)
    feats = jax.random.normal(jax.random.PRNGKey(1), (20, 8))
    out = audio2headpose.generate_sequence_lstm(params, TINY_A2H, feats, jax.random.PRNGKey(2))
    assert out.shape == (10, TINY_A2H.ndim)
    out0 = audio2headpose.generate_sequence_lstm(params, TINY_A2H, feats,
                                                 jax.random.PRNGKey(3), sigma_scale=0.0)
    out1 = audio2headpose.generate_sequence_lstm(params, TINY_A2H, feats,
                                                 jax.random.PRNGKey(4), sigma_scale=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_multihost_helpers_single_process():
    from livespeechportraits_tpu.parallel import multihost

    multihost.initialize()  # no-op single process
    assert multihost.is_primary()
    assert multihost.local_batch_slice(16) == slice(0, 16)


def test_audio2headpose_full_module_matches_reference_torch():
    """Oracle: the reference's Audio2Headpose (audio_downsample MLP +
    conditional WaveNet) in eval mode, weights converted by name."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.audio2headpose import Audio2Headpose as RefA2H  # type: ignore
    finally:
        sys.path.pop(0)
    from livespeechportraits_tpu.utils import torch_convert

    class Opt:
        loss = "GMM"
        APC_hidden_size = 8
        A2H_GMM_ndim = 12
        A2H_GMM_ncenter = 1
        A2H_wavenet_residual_layers = 3
        A2H_wavenet_residual_blocks = 2
        # NOTE: the reference passes residual_channels into WaveNet's
        # dilation_channels slot and vice versa (audio2headpose.py:23-36);
        # with equal values (the shipped defaults are both 128) it cancels.
        A2H_wavenet_residual_channels = 8
        A2H_wavenet_dilation_channels = 8
        A2H_wavenet_skip_channels = 16
        A2H_wavenet_kernel_size = 2
        A2H_wavenet_use_bias = True
        A2H_wavenet_cond = True
        A2H_wavenet_cond_channels = 8
        A2H_wavenet_input_channels = 12
        time_frame_length = 4

    torch.manual_seed(0)
    ref = RefA2H(Opt())
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_convert.convert_audio2headpose(sd, TINY_A2H)

    rng = np.random.default_rng(0)
    L = TINY_WN.receptive_field + 4 - 1
    hist = rng.normal(size=(2, L, 12)).astype(np.float32)
    audio = rng.normal(size=(2, L, 16)).astype(np.float32)

    ours, _ = audio2headpose.apply_audio2headpose(
        params, TINY_A2H, jnp.asarray(hist), jnp.asarray(audio), output_length=4)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(hist), torch.from_numpy(audio)).numpy()
    assert np.asarray(ours).shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=2e-5)


def test_discriminator_matches_reference_torch():
    """Oracle: the reference's MultiscaleDiscriminator constructed with
    the *intended* keyword arguments (its live call site passes them
    positionally misaligned - feature2face_D.py:22, SURVEY §2.3)."""
    torch = pytest.importorskip("torch")
    ref_networks = _ref_import()
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face
    from livespeechportraits_tpu.utils.torch_convert import _conv2d, _batchnorm

    cfg = Feature2FaceConfig(size="normal", ngf=8, ndf=8, n_layers_D=3, num_D=2,
                             n_downsample=5, load_size=32)
    input_nc = cfg.input_nc + 3
    torch.manual_seed(0)
    ref = ref_networks.MultiscaleDiscriminator(
        input_nc, ndf=cfg.ndf, n_layers=cfg.n_layers_D, num_D=cfg.num_D,
        getIntermFeat=True)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # convert by the reference's scale{i}_layer{j} naming; its forward
    # applies the LAST-constructed D to the full-res input
    params = feature2face.init_discriminator(jax.random.PRNGKey(0), cfg)
    n_l = cfg.n_layers_D
    new_scales = []
    for si in range(cfg.num_D):
        ref_scale = cfg.num_D - 1 - si  # reference ordering (networks.py:807)
        layers = []
        for li in range(n_l + 2):
            name = f"scale{ref_scale}_layer{li}.0"
            layer = {"conv": _conv2d(sd, name)}
            if f"{name.rsplit('.', 1)[0]}.1.running_mean" in sd:
                layer["bn"] = _batchnorm(sd, f"scale{ref_scale}_layer{li}.1")
            layers.append(layer)
        new_scales.append({"layers": layers})
    params = dict(params, scales=new_scales)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, input_nc)).astype(np.float32)
    ours, _ = feature2face.apply_discriminator(params, jnp.asarray(x), training=False)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(ours) == len(out_ref) == cfg.num_D
    for si in range(cfg.num_D):
        assert len(ours[si]) == len(out_ref[si])
        for li in range(len(ours[si])):
            np.testing.assert_allclose(
                np.asarray(ours[si][li]),
                out_ref[si][li].numpy().transpose(0, 2, 3, 1), atol=3e-5)


def test_apc_residual_serving_paths_match_training_forward():
    """A residual-trained APC must be SERVED with the residual adds:
    encode/encode_fast and the streaming chunk stack all reproduce
    apply_apc(residual=True)."""
    from livespeechportraits_tpu.config import APCConfig
    from livespeechportraits_tpu.models import apc as apc_mod
    from livespeechportraits_tpu.pipeline.streaming import _gru_chunk_masked

    cfg = APCConfig(mel_dim=8, hidden_size=16, num_layers=3, residual=True)
    params = apc_mod.init_apc(jax.random.PRNGKey(0), cfg)
    mels = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 8))

    ref = apc_mod.apply_apc(params, mels, residual=True)
    np.testing.assert_allclose(
        np.asarray(apc_mod.encode(params, mels, residual=True)),
        np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(apc_mod.encode_fast(params, mels[0], residual=True)),
        np.asarray(ref[0]), atol=1e-6)
    # and it actually differs from the non-residual forward
    assert np.abs(np.asarray(ref)
                  - np.asarray(apc_mod.apply_apc(params, mels))).max() > 1e-3

    h0 = [jnp.zeros((16,)) for _ in range(3)]
    valid = jnp.ones((12,), bool)
    feats, _ = _gru_chunk_masked(params["layers"], mels[0], h0, valid,
                                 residual=True)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref[0]),
                               atol=1e-5)

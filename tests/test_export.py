"""Two-way checkpoint conversion: export -> (reference torch module) ->
convert must be the identity, and exported dicts must load cleanly into
the reference's own modules (strict key matching)."""

import sys

import numpy as np
import jax
import pytest

from livespeechportraits_tpu.config import (
    APCConfig,
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    WaveNetConfig,
)
from livespeechportraits_tpu.models import apc, audio2feature, audio2headpose, feature2face
from livespeechportraits_tpu.utils import torch_convert as tc


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_apc_roundtrip_and_torch_load():
    torch = pytest.importorskip("torch")
    cfg = APCConfig(mel_dim=80, hidden_size=16, num_layers=2)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    sd = tc.export_apc(params)
    _trees_equal(params, tc.convert_apc(sd, cfg))

    sys.path.insert(0, "/root/reference")
    try:
        from models.networks import APC_encoder  # type: ignore
    finally:
        sys.path.pop(0)
    ref = APC_encoder(80, 16, 2, False)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected


def test_audio2feature_roundtrip_and_torch_load():
    torch = pytest.importorskip("torch")
    cfg = Audio2FeatureConfig(apc_hidden_size=16, output_dim=6)
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), cfg)
    sd = tc.export_audio2feature(params)
    _trees_equal(params, tc.convert_audio2feature(sd, cfg))

    sys.path.insert(0, "/root/reference")
    try:
        from models.audio2feature import Audio2Feature as RefA2F  # type: ignore
    finally:
        sys.path.pop(0)

    class Opt:
        loss = "L2"; feature_decoder = "LSTM"; APC_hidden_size = 16
        predict_length = 1; A2L_GMM_ndim = 6; A2L_GMM_ncenter = 1
        time_frame_length = 1

    ref = RefA2F(Opt())
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                        strict=True)


def test_audio2headpose_roundtrip():
    cfg = Audio2HeadposeConfig(
        apc_hidden_size=8,
        wavenet=WaveNetConfig(residual_layers=2, residual_blocks=1,
                              dilation_channels=8, residual_channels=8,
                              skip_channels=16, cond_channels=8),
    )
    params = audio2headpose.init_audio2headpose(jax.random.PRNGKey(0), cfg)
    sd = tc.export_audio2headpose(params)
    _trees_equal(params, tc.convert_audio2headpose(sd, cfg))


@pytest.mark.parametrize("size", ["small", "normal", "large"])
def test_generator_roundtrip_and_torch_load(size):
    torch = pytest.importorskip("torch")
    cfg = Feature2FaceConfig(size=size, ngf=8, n_downsample=6, load_size=64)
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    sd = tc.export_feature2face_g(params, num_downs=6)
    back = tc.convert_feature2face_g(sd, size, num_downs=6)
    _trees_equal(params["net"], back["net"])

    sys.path.insert(0, "/root/reference")
    try:
        import models.networks as ref_networks  # type: ignore
    finally:
        sys.path.pop(0)
    make = {"small": ref_networks.Feature2FaceGenerator_Unet,
            "normal": ref_networks.Feature2FaceGenerator_normal,
            "large": ref_networks.Feature2FaceGenerator_large}[size]
    ref = make(input_nc=cfg.input_nc, output_nc=3, num_downs=6, ngf=8)
    # exported keys are 'netG.model...'; the bare generator expects 'model...'
    stripped = {k[len("netG."):]: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    ref.load_state_dict(stripped, strict=True)


def test_save_state_dict_torch(tmp_path):
    pytest.importorskip("torch")
    cfg = APCConfig(mel_dim=80, hidden_size=8, num_layers=1)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "apc.pkl")
    tc.save_state_dict_torch(tc.export_apc(params), p)
    sd = tc.load_state_dict_numpy(p)
    _trees_equal(params, tc.convert_apc(sd, cfg))

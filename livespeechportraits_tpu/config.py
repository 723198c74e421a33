"""Typed configuration tree.

Replaces the reference's three parallel argparse stacks
(``options/base_options_audio2feature.py``, ``base_options_audio2headpose.py``,
``base_options_feature2face.py``) and the per-person YAML overlay consumed by
``demo.py:116-137``.  One dataclass tree, pure data, no side effects; the
per-person YAML keeps the exact knob surface of the reference configs
(``config/May.yaml`` etc.) so users of the reference can bring their YAMLs.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, List, Tuple

try:  # PyYAML ships with the image; gate anyway.
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

# ---------------------------------------------------------------------------
# Global pipeline constants (reference demo.py:73: h, w, sr, FPS)
# ---------------------------------------------------------------------------

SAMPLE_RATE = 16000
FPS = 60
MEL_RATE = 120  # 2 mel frames per video frame (funcs/utils.py:61-69)
IMAGE_SIZE = 512
NUM_LANDMARKS = 73
# mouth-region landmark indices consumed by the mouth stage (demo.py:74)
MOUTH_INDICES: Tuple[int, ...] = tuple(range(4, 11)) + tuple(range(46, 64))
EYE_BROW_INDICES: Tuple[int, ...] = (
    27, 65, 28, 68, 29, 67, 30, 66, 31, 72, 32, 69, 33, 70, 34, 71,
)  # demo.py:75


@dataclass(frozen=True)
class APCConfig:
    """APC (Autoregressive Predictive Coding) GRU encoder.

    Reference: models/networks.py:20-69 and config/*.yaml `model_params.APC`.
    """

    mel_dim: int = 80
    hidden_size: int = 512
    num_layers: int = 3
    residual: bool = False
    ckpt_path: str = ""
    # Self-supervised pretraining: predict the mel frame `time_shift`
    # steps ahead with an L1 loss (the objective the reference's frozen
    # encoder was pretrained with upstream; the reference itself ships
    # only the resulting weights, demo.py:145-160).
    time_shift: int = 3
    # LLE manifold-projection knobs (demo.py:116-118)
    use_LLE: bool = True
    Knear: int = 10
    LLE_percent: float = 1.0


@dataclass(frozen=True)
class Audio2FeatureConfig:
    """Audio2Feature ("Audio2Mouth") decoder head.

    Reference: models/audio2feature.py:6-72 with defaults from
    options/base_options_audio2feature.py (LSTM branch; the reference's
    WaveNet branch is not runnable - its options are never defined).
    """

    decoder: str = "lstm"  # 'lstm' | 'wavenet'
    apc_hidden_size: int = 512
    lstm_hidden_size: int = 256
    lstm_layers: int = 3
    output_dim: int = 75  # A2L_GMM_ndim=25*3 x predict_length=1
    frame_future: int = 18  # base_options_audio2feature.py:57
    # 'L2' | 'GMM'.  The reference declares a GMM option but it is broken
    # as shipped (audio2feature_model.py:85 constructs GMMLogLoss with
    # undefined A2L_GMM_* options); here the intended mode is runnable:
    # the head widens to (2*output_dim+1)*gmm_ncenter and trains with the
    # diagonal-GMM NLL (ops/gmm.py), decoding component means at inference.
    loss: str = "L2"
    gmm_ncenter: int = 1
    gmm_sigma_min: float = 0.03
    ckpt_path: str = ""
    # post-processing knobs (config/*.yaml Audio2Mouth)
    smooth_sigma: float = 1.5
    amp_method: str = "XYZ"
    amp_params: Tuple[float, ...] = (2.0, 2.0, 2.0)


@dataclass(frozen=True)
class WaveNetConfig:
    """Conditional WaveNet core (reference models/networks.py:74-326) with
    Audio2Headpose defaults (options/base_options_audio2headpose.py:68-84)."""

    residual_layers: int = 7
    residual_blocks: int = 2
    dilation_channels: int = 128
    residual_channels: int = 128
    skip_channels: int = 256
    kernel_size: int = 2
    use_bias: bool = True
    cond: bool = True
    cond_channels: int = 512
    input_channels: int = 12  # pose(6) + velocity(6)
    activation: str = "leakyrelu"  # LeakyReLU(0.2) (networks.py:145)

    @property
    def receptive_field(self) -> int:
        """1 + blocks * (2**layers - 1) for kernel_size=2 (networks.py:150-166)."""
        rf = 1
        scope = self.kernel_size - 1
        for _ in range(self.residual_blocks):
            s = scope
            for _ in range(self.residual_layers):
                rf += s
                s *= 2
        return rf

    @property
    def dilations(self) -> Tuple[int, ...]:
        out: List[int] = []
        for _ in range(self.residual_blocks):
            d = 1
            for _ in range(self.residual_layers):
                out.append(d)
                d *= 2
        return tuple(out)


@dataclass(frozen=True)
class Audio2HeadposeConfig:
    """Audio2Headpose conditional WaveNet + GMM head.

    Reference: models/audio2headpose.py:7-52, defaults from
    options/base_options_audio2headpose.py.
    """

    decoder: str = "wavenet"  # 'wavenet' | 'lstm'
    apc_hidden_size: int = 512
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)
    ndim: int = 12  # A2H_GMM_ndim: 6-DoF pose + velocities
    ncenter: int = 1  # A2H_GMM_ncenter
    sigma_min: float = 0.03
    frame_future: int = 15  # base_options_audio2headpose.py:55
    loss: str = "GMM"
    ckpt_path: str = ""
    # per-person knobs (config/*.yaml Headpose)
    sample_sigma_scale: float = 0.3  # demo.py:212 sigma_scale
    smooth_sigmas: Tuple[float, float] = (5.0, 10.0)  # rot, trans
    rot_amp: float = 1.0
    trans_amp: float = 0.5
    shoulder_amp: float = 0.5

    @property
    def gmm_output_dim(self) -> int:
        return (2 * self.ndim + 1) * self.ncenter


@dataclass(frozen=True)
class Feature2FaceConfig:
    """Feature2Face renderer (pix2pixHD-flavoured U-Net).

    Reference: models/feature2face_G.py:8-34, networks.py:458-769, defaults
    from options/base_options_feature2face.py.
    """

    size: str = "normal"  # 'small' | 'normal' | 'large'
    ngf: int = 64
    n_downsample: int = 8
    output_nc: int = 3
    load_size: int = IMAGE_SIZE
    # discriminator (networks.py:773-867)
    ndf: int = 64
    n_layers_D: int = 3
    num_D: int = 2
    # loss weights (train_feature2face_options + feature2face_model.py:129-156)
    lambda_L1: float = 100.0
    lambda_feat: float = 10.0
    gan_mode: str = "ls"
    ckpt_path: str = ""
    save_input: bool = False
    precision: str = "bfloat16"  # TPU-native mixed precision (fp16+GradScaler on CUDA)

    @property
    def input_nc(self) -> int:
        """1-ch edge map + 4 candidate RGB images = 13 ('small' variant: 23)."""
        return 23 if self.size == "small" else 13


@dataclass(frozen=True)
class PersonConfig:
    """Per-subject asset + knob pack: the product surface of config/*.yaml."""

    name: str = "Synthetic"
    data_root: str = ""
    fit_data_path: str = ""
    pts3d_path: str = ""
    apc: APCConfig = field(default_factory=APCConfig)
    audio2feature: Audio2FeatureConfig = field(default_factory=Audio2FeatureConfig)
    audio2headpose: Audio2HeadposeConfig = field(default_factory=Audio2HeadposeConfig)
    feature2face: Feature2FaceConfig = field(default_factory=Feature2FaceConfig)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit / shard_map.

    The reference's only parallelism is single-process nn.DataParallel
    (networks.py:400); here the equivalent is a ('data',) mesh axis, with a
    'model' axis available for sharding the renderer at scale.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    person: PersonConfig = field(default_factory=PersonConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    sample_rate: int = SAMPLE_RATE
    fps: int = FPS
    image_size: int = IMAGE_SIZE
    render_batch: int = 8  # frames rendered per jit call (MXU utilisation)
    seed: int = 0


# ---------------------------------------------------------------------------
# YAML overlay (reference config/*.yaml layout, demo.py:116-137)
# ---------------------------------------------------------------------------


def person_config_from_dict(cfg: dict, name: str = "") -> PersonConfig:
    """Build a :class:`PersonConfig` from a reference-format YAML dict."""
    mp = cfg.get("model_params", {})
    dp = cfg.get("dataset_params", {})

    apc_d = mp.get("APC", {})
    apc = APCConfig(
        mel_dim=int(apc_d.get("mel_dim", 80)),
        hidden_size=int(apc_d.get("hidden_size", 512)),
        num_layers=int(apc_d.get("num_layers", 3)),
        residual=bool(apc_d.get("residual", False)),
        ckpt_path=str(apc_d.get("ckp_path", "")),
        use_LLE=bool(apc_d.get("use_LLE", True)),
        Knear=int(apc_d.get("Knear", 10)),
        LLE_percent=float(apc_d.get("LLE_percent", 1.0)),
    )

    a2m = mp.get("Audio2Mouth", {})
    amp = list(a2m.get("AMP", ["XYZ", 2, 2, 2]))
    a2f = Audio2FeatureConfig(
        apc_hidden_size=apc.hidden_size,
        ckpt_path=str(a2m.get("ckp_path", "")),
        smooth_sigma=float(a2m.get("smooth", 1.5)),
        amp_method=str(amp[0]),
        amp_params=tuple(float(x) for x in amp[1:]),
    )

    hp = mp.get("Headpose", {})
    smooth = hp.get("smooth", [5, 10])
    hp_amp = hp.get("AMP", [1, 0.5])
    a2h = Audio2HeadposeConfig(
        apc_hidden_size=apc.hidden_size,
        ckpt_path=str(hp.get("ckp_path", "")),
        sample_sigma_scale=float(hp.get("sigma", 0.3)),
        smooth_sigmas=(float(smooth[0]), float(smooth[1])),
        rot_amp=float(hp_amp[0]),
        trans_amp=float(hp_amp[1]),
        shoulder_amp=float(hp.get("shoulder_AMP", 0.5)),
    )

    i2i = mp.get("Image2Image", {})
    f2f = Feature2FaceConfig(
        size=str(i2i.get("size", "normal")),
        ckpt_path=str(i2i.get("ckp_path", "")),
        save_input=bool(i2i.get("save_input", False)),
    )

    return PersonConfig(
        name=name or str(cfg.get("name", "")),
        data_root=str(dp.get("root", "")),
        fit_data_path=str(dp.get("fit_data_path", "")),
        pts3d_path=str(dp.get("pts3d_path", "")),
        apc=apc,
        audio2feature=a2f,
        audio2headpose=a2h,
        feature2face=f2f,
    )


def load_person_config(path: str, name: str = "") -> PersonConfig:
    """Load a per-person YAML (reference config/<id>.yaml format)."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("PyYAML unavailable; cannot load YAML person config")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not name:
        name = os.path.splitext(os.path.basename(path))[0]
    return person_config_from_dict(cfg, name=name)


def replace(cfg, **kwargs):
    """Functional update helper for frozen config dataclasses."""
    return dataclasses.replace(cfg, **kwargs)

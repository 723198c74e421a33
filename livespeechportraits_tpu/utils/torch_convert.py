"""Reference-checkpoint ingestion: torch state_dicts -> our param pytrees.

The reference ships per-subject ``.pkl`` checkpoints saved as raw
state_dicts (base_model.py:161-176, ``{epoch}_{name}.pkl``), usually with
DataParallel ``module.`` prefixes.  These converters map them onto our
pytrees so released subjects run on TPU unchanged and so tests can use the
reference's torch modules as numerical oracles.

Tensor layout conventions:
    torch Linear  [out, in]        -> ours [in, out]       (transpose)
    torch Conv1d  [out, in, k]     -> ours [k, in, out]    (2,1,0)
    torch Conv2d  [out, in, kh,kw] -> ours [kh, kw, in, out] (2,3,1,0)
    torch ConvT2d [in, out, kh,kw] -> ours [kh, kw, in, out] (2,3,0,1)
    torch GRU/LSTM weight_[ih|hh]_l0 [G*H, I] -> ours [I, G*H] (transpose)

All functions accept numpy-valued state dicts ({name: np.ndarray}); use
`load_state_dict_numpy` to read a .pkl with torch on CPU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

try:
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jnp = None

from livespeechportraits_tpu.config import (
    APCConfig,
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    WaveNetConfig,
)

Array = np.ndarray
StateDict = Dict[str, Array]


def load_state_dict_numpy(path: str) -> StateDict:
    """Read a torch .pkl/.model checkpoint into {name: np.ndarray},
    stripping DataParallel 'module.' prefixes (base_model.py:213-215)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out: StateDict = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _j(x: Array):
    return jnp.asarray(x) if jnp is not None else x


def _linear(sd: StateDict, name: str) -> Dict[str, Any]:
    p = {"w": _j(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _conv1d(sd: StateDict, name: str) -> Dict[str, Any]:
    p = {"w": _j(sd[f"{name}.weight"].transpose(2, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _conv2d(sd: StateDict, name: str, transposed: bool = False) -> Dict[str, Any]:
    w = sd[f"{name}.weight"]
    w = w.transpose(2, 3, 0, 1) if transposed else w.transpose(2, 3, 1, 0)
    p = {"w": _j(w)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"])
    return p


def _batchnorm(sd: StateDict, name: str) -> Dict[str, Any]:
    return {
        "scale": _j(sd[f"{name}.weight"]),
        "bias": _j(sd[f"{name}.bias"]),
        "mean": _j(sd[f"{name}.running_mean"]),
        "var": _j(sd[f"{name}.running_var"]),
    }


def _rnn_layer(sd: StateDict, prefix: str, layer: int = 0) -> Dict[str, Any]:
    return {
        "w_ih": _j(sd[f"{prefix}.weight_ih_l{layer}"].T),
        "w_hh": _j(sd[f"{prefix}.weight_hh_l{layer}"].T),
        "b_ih": _j(sd[f"{prefix}.bias_ih_l{layer}"]),
        "b_hh": _j(sd[f"{prefix}.bias_hh_l{layer}"]),
    }


# ---------------------------------------------------------------------------
# APC encoder (networks.py:20-69; checkpoint data/APC_epoch_160.model)
# ---------------------------------------------------------------------------


def convert_apc(sd: StateDict, cfg: APCConfig) -> Dict[str, Any]:
    layers = []
    for i in range(cfg.num_layers):
        layers.append(_rnn_layer(sd, f"rnns.{i}"))
    return {"layers": layers}


# ---------------------------------------------------------------------------
# WaveNet core (networks.py:93-178 module naming)
# ---------------------------------------------------------------------------


def convert_wavenet(sd: StateDict, cfg: WaveNetConfig, prefix: str = "WaveNet") -> Dict[str, Any]:
    pre = f"{prefix}." if prefix else ""
    n_layers = cfg.residual_blocks * cfg.residual_layers
    blocks = []
    for i in range(n_layers):
        b = f"{pre}residual_blocks.{i}"
        blk = {
            "filter": _conv1d(sd, f"{b}.filter_conv"),
            "gate": _conv1d(sd, f"{b}.gate_conv"),
            "res": _conv1d(sd, f"{b}.residual_conv"),
            "skip": _conv1d(sd, f"{b}.skip_conv"),
        }
        if cfg.cond:
            blk["cond_filter"] = _conv1d(sd, f"{b}.cond_filter_conv")
            blk["cond_gate"] = _conv1d(sd, f"{b}.cond_gate_conv")
        blocks.append(blk)
    return {
        "start1": _conv1d(sd, f"{pre}start_conv1"),
        "start2": _conv1d(sd, f"{pre}start_conv2"),
        "end1": _conv1d(sd, f"{pre}end_conv_1"),
        "end2": _conv1d(sd, f"{pre}end_conv_2"),
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# Audio2Feature LSTM decoder (audio2feature.py:32-52 module naming)
# ---------------------------------------------------------------------------


def convert_audio2feature(sd: StateDict, cfg: Audio2FeatureConfig) -> Dict[str, Any]:
    return {
        "down1": _linear(sd, "downsample.0"),
        "down_bn": _batchnorm(sd, "downsample.1"),
        "down2": _linear(sd, "downsample.3"),
        "lstm": [_rnn_layer(sd, "LSTM", i) for i in range(cfg.lstm_layers)],
        "fc1": _linear(sd, "fc.0"),
        "fc1_bn": _batchnorm(sd, "fc.1"),
        "fc2": _linear(sd, "fc.3"),
        "fc2_bn": _batchnorm(sd, "fc.4"),
        "fc3": _linear(sd, "fc.6"),
    }


# ---------------------------------------------------------------------------
# Audio2Headpose (audio2headpose.py:16-37 module naming)
# ---------------------------------------------------------------------------


def convert_audio2headpose(sd: StateDict, cfg: Audio2HeadposeConfig) -> Dict[str, Any]:
    return {
        "down1": _linear(sd, "audio_downsample.0"),
        "down_bn": _batchnorm(sd, "audio_downsample.1"),
        "down2": _linear(sd, "audio_downsample.3"),
        "wavenet": convert_wavenet(sd, cfg.wavenet, prefix="WaveNet"),
    }


def convert_audio2headpose_lstm(sd: StateDict, cfg: Audio2HeadposeConfig) -> Dict[str, Any]:
    return {
        "down1": _linear(sd, "audio_downsample.0"),
        "down_bn": _batchnorm(sd, "audio_downsample.1"),
        "down2": _linear(sd, "audio_downsample.3"),
        "lstm": [_rnn_layer(sd, "LSTM", i) for i in range(3)],
        "fc1": _linear(sd, "fc.0"),
        "fc1_bn": _batchnorm(sd, "fc.1"),
        "fc2": _linear(sd, "fc.3"),
        "fc2_bn": _batchnorm(sd, "fc.4"),
        "fc3": _linear(sd, "fc.6"),
    }


# ---------------------------------------------------------------------------
# Feature2Face generator (networks.py:458-769 nested Sequential naming)
# ---------------------------------------------------------------------------


def convert_feature2face_g(sd: StateDict, size: str, num_downs: int = 8,
                           n_res: Optional[int] = None) -> Dict[str, Any]:
    """Convert a Feature2Face_G checkpoint ('netG.model...' nesting).

    The torch module is a recursive Sequential; each nesting level's child
    indices depend on the stage kind.  We walk it top-down (outermost
    first), emitting our stage dicts.
    """
    if n_res is None:
        n_res = {"small": 0, "normal": 1, "large": 2}[size]

    def resblock(name: str) -> Dict[str, Any]:
        return {
            "conv1": _conv2d(sd, f"{name}.block.0"),
            "bn1": _batchnorm(sd, f"{name}.block.1"),
            "conv2": _conv2d(sd, f"{name}.block.3"),
            "bn2": _batchnorm(sd, f"{name}.block.4"),
        }

    def res_stage(block: str, depth: int) -> Dict[str, Any]:
        # Each ResUnetSkipConnectionBlock holds its Sequential as `.model`;
        # child layout (networks.py:513-544):
        # outermost: [down(0), relu, res x n, sub, upsample, upconv]
        # innermost: [down(0), relu, res x n, upsample, upconv, bn, relu, res x n]
        # middle:    [down(0), bn(1), relu, res x n, sub, upsample, upconv, bn, relu, res x n]
        outermost = depth == 0
        innermost = depth == num_downs - 1
        seq = f"{block}.model"
        p: Dict[str, Any] = {}
        idx = 0
        p["down"] = _conv2d(sd, f"{seq}.{idx}"); idx += 1
        if not outermost and not innermost:
            p["down_bn"] = _batchnorm(sd, f"{seq}.{idx}"); idx += 1
        idx += 1  # ReLU
        p["res_down"] = []
        for _ in range(n_res):
            p["res_down"].append(resblock(f"{seq}.{idx}")); idx += 1
        sub_idx = None
        if not innermost:
            sub_idx = idx; idx += 1  # submodule slot
        idx += 1  # Upsample (no params)
        p["up"] = _conv2d(sd, f"{seq}.{idx}"); idx += 1
        if not outermost:
            p["up_bn"] = _batchnorm(sd, f"{seq}.{idx}"); idx += 1
            idx += 1  # ReLU
            p["res_up"] = []
            for _ in range(n_res):
                p["res_up"].append(resblock(f"{seq}.{idx}")); idx += 1
        if sub_idx is not None:
            p["sub"] = res_stage(f"{seq}.{sub_idx}", depth + 1)
        return p

    def unet_stage(block: str, depth: int) -> Dict[str, Any]:
        # (networks.py:737-763):
        # outermost: [down(0), sub(1), relu, upconvT(3), tanh]
        # innermost: [relu(0), down(1), relu, upconvT(3), bn(4)]
        # middle:    [relu(0), down(1), bn(2), sub(3), relu, upconvT(5), bn(6)]
        outermost = depth == 0
        innermost = depth == num_downs - 1
        seq = f"{block}.model"
        p: Dict[str, Any] = {}
        if outermost:
            p["down"] = _conv2d(sd, f"{seq}.0")
            p["sub"] = unet_stage(f"{seq}.1", depth + 1)
            p["up"] = _conv2d(sd, f"{seq}.3", transposed=True)
        elif innermost:
            p["down"] = _conv2d(sd, f"{seq}.1")
            p["up"] = _conv2d(sd, f"{seq}.3", transposed=True)
            p["up_bn"] = _batchnorm(sd, f"{seq}.4")
        else:
            p["down"] = _conv2d(sd, f"{seq}.1")
            p["down_bn"] = _batchnorm(sd, f"{seq}.2")
            p["sub"] = unet_stage(f"{seq}.3", depth + 1)
            p["up"] = _conv2d(sd, f"{seq}.5", transposed=True)
            p["up_bn"] = _batchnorm(sd, f"{seq}.6")
        return p

    root = "netG.model"
    if size == "small":
        net = unet_stage(root, 0)
    else:
        net = res_stage(root, 0)
    return {"net": net, "size": size}


# ---------------------------------------------------------------------------
# Reverse conversion: our pytrees -> reference-format state dicts
# ---------------------------------------------------------------------------
#
# Completes the migration story in both directions: models trained in this
# framework can be exported as torch state_dicts with the reference's
# module naming, loadable by the original PyTorch code.


def _inv_linear(p, out, name):
    out[f"{name}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _inv_conv1d(p, out, name):
    out[f"{name}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0)
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _inv_conv2d(p, out, name, transposed=False):
    w = np.asarray(p["w"])
    out[f"{name}.weight"] = w.transpose(2, 3, 0, 1) if transposed else w.transpose(3, 2, 0, 1)
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _inv_batchnorm(p, out, name):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])
    out[f"{name}.running_mean"] = np.asarray(p["mean"])
    out[f"{name}.running_var"] = np.asarray(p["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def _inv_rnn(p, out, prefix, layer=0):
    out[f"{prefix}.weight_ih_l{layer}"] = np.asarray(p["w_ih"]).T
    out[f"{prefix}.weight_hh_l{layer}"] = np.asarray(p["w_hh"]).T
    out[f"{prefix}.bias_ih_l{layer}"] = np.asarray(p["b_ih"])
    out[f"{prefix}.bias_hh_l{layer}"] = np.asarray(p["b_hh"])


def export_apc(params) -> StateDict:
    out: StateDict = {}
    for i, layer in enumerate(params["layers"]):
        _inv_rnn(layer, out, f"rnns.{i}")
    return out


def export_wavenet(params, prefix: str = "WaveNet") -> StateDict:
    pre = f"{prefix}." if prefix else ""
    out: StateDict = {}
    _inv_conv1d(params["start1"], out, f"{pre}start_conv1")
    _inv_conv1d(params["start2"], out, f"{pre}start_conv2")
    _inv_conv1d(params["end1"], out, f"{pre}end_conv_1")
    _inv_conv1d(params["end2"], out, f"{pre}end_conv_2")
    for i, blk in enumerate(params["blocks"]):
        b = f"{pre}residual_blocks.{i}"
        _inv_conv1d(blk["filter"], out, f"{b}.filter_conv")
        _inv_conv1d(blk["gate"], out, f"{b}.gate_conv")
        _inv_conv1d(blk["res"], out, f"{b}.residual_conv")
        _inv_conv1d(blk["skip"], out, f"{b}.skip_conv")
        if "cond_filter" in blk:
            _inv_conv1d(blk["cond_filter"], out, f"{b}.cond_filter_conv")
            _inv_conv1d(blk["cond_gate"], out, f"{b}.cond_gate_conv")
    return out


def export_audio2feature(params) -> StateDict:
    out: StateDict = {}
    _inv_linear(params["down1"], out, "downsample.0")
    _inv_batchnorm(params["down_bn"], out, "downsample.1")
    _inv_linear(params["down2"], out, "downsample.3")
    for i, layer in enumerate(params["lstm"]):
        _inv_rnn(layer, out, "LSTM", i)
    _inv_linear(params["fc1"], out, "fc.0")
    _inv_batchnorm(params["fc1_bn"], out, "fc.1")
    _inv_linear(params["fc2"], out, "fc.3")
    _inv_batchnorm(params["fc2_bn"], out, "fc.4")
    _inv_linear(params["fc3"], out, "fc.6")
    return out


def export_audio2headpose(params) -> StateDict:
    out: StateDict = {}
    _inv_linear(params["down1"], out, "audio_downsample.0")
    _inv_batchnorm(params["down_bn"], out, "audio_downsample.1")
    _inv_linear(params["down2"], out, "audio_downsample.3")
    out.update(export_wavenet(params["wavenet"], prefix="WaveNet"))
    return out


def export_feature2face_g(params, num_downs: int = 8,
                          n_res: Optional[int] = None) -> StateDict:
    """Inverse of convert_feature2face_g: emits 'netG.model...' keys.

    num_downs/n_res are accepted for signature symmetry with the import
    direction but unused: the export walks the actual pytree structure,
    which already encodes the depth and residual counts."""
    size = params["size"]
    del num_downs, n_res
    out: StateDict = {}

    def inv_resblock(p, name):
        _inv_conv2d(p["conv1"], out, f"{name}.block.0")
        _inv_batchnorm(p["bn1"], out, f"{name}.block.1")
        _inv_conv2d(p["conv2"], out, f"{name}.block.3")
        _inv_batchnorm(p["bn2"], out, f"{name}.block.4")

    def res_stage(p, block, depth):
        outermost = depth == 0
        innermost = "sub" not in p
        seq = f"{block}.model"
        idx = 0
        _inv_conv2d(p["down"], out, f"{seq}.{idx}"); idx += 1
        if "down_bn" in p:
            _inv_batchnorm(p["down_bn"], out, f"{seq}.{idx}"); idx += 1
        idx += 1  # ReLU
        for rp in p["res_down"]:
            inv_resblock(rp, f"{seq}.{idx}"); idx += 1
        sub_idx = None
        if not innermost:
            sub_idx = idx; idx += 1
        idx += 1  # Upsample
        _inv_conv2d(p["up"], out, f"{seq}.{idx}"); idx += 1
        if not outermost:
            _inv_batchnorm(p["up_bn"], out, f"{seq}.{idx}"); idx += 1
            idx += 1  # ReLU
            for rp in p.get("res_up", []):
                inv_resblock(rp, f"{seq}.{idx}"); idx += 1
        if sub_idx is not None:
            res_stage(p["sub"], f"{seq}.{sub_idx}", depth + 1)

    def unet_stage(p, block, depth):
        outermost = depth == 0
        innermost = "sub" not in p
        seq = f"{block}.model"
        if outermost:
            _inv_conv2d(p["down"], out, f"{seq}.0")
            unet_stage(p["sub"], f"{seq}.1", depth + 1)
            _inv_conv2d(p["up"], out, f"{seq}.3", transposed=True)
        elif innermost:
            _inv_conv2d(p["down"], out, f"{seq}.1")
            _inv_conv2d(p["up"], out, f"{seq}.3", transposed=True)
            _inv_batchnorm(p["up_bn"], out, f"{seq}.4")
        else:
            _inv_conv2d(p["down"], out, f"{seq}.1")
            _inv_batchnorm(p["down_bn"], out, f"{seq}.2")
            unet_stage(p["sub"], f"{seq}.3", depth + 1)
            _inv_conv2d(p["up"], out, f"{seq}.5", transposed=True)
            _inv_batchnorm(p["up_bn"], out, f"{seq}.6")

    if size == "small":
        unet_stage(params["net"], "netG.model", 0)
    else:
        res_stage(params["net"], "netG.model", 0)
    return out


def save_state_dict_torch(sd: StateDict, path: str) -> None:
    """Write a reference-format .pkl (torch.save of a tensor state dict).

    bf16 leaves (e.g. a tree restored from a bf16 serving artifact) are
    widened to f32 first: numpy's ml_dtypes bfloat16 has no torch
    conversion, and the reference checkpoints are f32 anyway."""
    import torch

    def _t(v):
        arr = np.asarray(v)
        if arr.dtype.kind not in "fiub":  # ml_dtypes (bfloat16 etc.)
            arr = arr.astype(np.float32)
        return torch.from_numpy(arr)

    torch.save({k: _t(v) for k, v in sd.items()}, path)

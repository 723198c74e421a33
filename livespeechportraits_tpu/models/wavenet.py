"""Conditional dilated-causal WaveNet.

Capability parity with models/networks.py:74-326 (WaveNet +
residual_block): start 1x1 convs, B blocks x L layers of gated dilated
convolutions with 1x1 conditional projections, residual + skip sums, two
end 1x1 convs, output crop.  Receptive field = 1 + blocks*(2^layers - 1)
for kernel 2 (networks.py:150-166; A2H defaults give RF = 255).

Two execution paths, both pure functions over one params pytree:

* `forward` - whole-window convolution (training and batch scoring).
  Layout is NWC; every conv is a lax.conv_general_dilated that XLA maps to
  the MXU.
* `stream_init` / `stream_step` - **exact incremental decoding**.  The
  reference's autoregressive head-pose loop re-runs the full 255-frame
  window per output frame (audio2headpose_model.py:169-187): O(RF) work
  per frame.  Here each layer keeps a ring buffer of its last `dilation`
  inputs, so a step does O(1) work per layer - a provable ~RF x compute
  reduction with bit-identical semantics (verified in
  tests/test_wavenet.py::test_streaming_equals_sliding_window; the
  zero-padded window activations that feed the reference's last output
  position are exactly the padding-free ones the stream maintains).

Dropout2d on the input (networks.py:146,195: channel dropout p=0.5 at
train time) is exposed via the `dropout_rng` argument.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from livespeechportraits_tpu.config import WaveNetConfig
from livespeechportraits_tpu.models import nn_core


def init_wavenet(key: jax.Array, cfg: WaveNetConfig, output_channels: int) -> Dict[str, Any]:
    """Build the WaveNet params pytree (init: normal(0, 0.02) like
    networks.init_weights on every conv)."""
    n_layers = cfg.residual_blocks * cfg.residual_layers
    keys = iter(jax.random.split(key, 4 + 6 * n_layers))
    p: Dict[str, Any] = {
        "start1": nn_core.conv1d_init(next(keys), cfg.input_channels, cfg.residual_channels, 1),
        "start2": nn_core.conv1d_init(next(keys), cfg.residual_channels, cfg.residual_channels, 1),
        "end1": nn_core.conv1d_init(next(keys), cfg.skip_channels, output_channels, 1),
        "end2": nn_core.conv1d_init(next(keys), output_channels, output_channels, 1),
        "blocks": [],
    }
    for _ in range(n_layers):
        blk = {
            "filter": nn_core.conv1d_init(
                next(keys), cfg.residual_channels, cfg.dilation_channels,
                cfg.kernel_size, bias=cfg.use_bias),
            "gate": nn_core.conv1d_init(
                next(keys), cfg.residual_channels, cfg.dilation_channels,
                cfg.kernel_size, bias=cfg.use_bias),
            "res": nn_core.conv1d_init(
                next(keys), cfg.dilation_channels, cfg.residual_channels, 1,
                bias=cfg.use_bias),
            "skip": nn_core.conv1d_init(
                next(keys), cfg.dilation_channels, cfg.skip_channels, 1,
                bias=cfg.use_bias),
        }
        if cfg.cond:
            blk["cond_filter"] = nn_core.conv1d_init(
                next(keys), cfg.cond_channels, cfg.dilation_channels, 1)
            blk["cond_gate"] = nn_core.conv1d_init(
                next(keys), cfg.cond_channels, cfg.dilation_channels, 1)
        p["blocks"].append(blk)
    return p


def _activation(cfg: WaveNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.activation == "relu":
        return jax.nn.relu(x)
    return nn_core.leaky_relu(x, 0.2)


def forward(
    params: Dict[str, Any],
    cfg: WaveNetConfig,
    x: jnp.ndarray,
    cond: Optional[jnp.ndarray] = None,
    output_length: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
    return_layer_inputs: bool = False,
):
    """Whole-window forward pass.

    Args:
        x: [B, T, input_channels] input sequence (e.g. pose+velocity
           history).  NOTE: the reference uses channel-first [B, C, T]
           (networks.py:186-214); NWC here.
        cond: [B, T, cond_channels] conditioning (APC audio features).
        output_length: keep only the trailing `output_length` frames
            (networks.py:211; training uses time_frame_length, inference 1).
        dropout_rng: when given, apply channel Dropout2d(p=0.5) on the raw
            input (networks.py:195) - training only.
        return_layer_inputs: also return each gated layer's input stream
            (the residual trunk), used by `stream_init`.
    Returns:
        [B, T_out, output_channels] (and layer inputs if requested).
    """
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.5, (x.shape[0], 1, x.shape[2]))
        x = jnp.where(keep, x / 0.5, 0.0)

    if cond is None and cfg.cond:
        # the reference's residual_block raises here (networks.py:300-302);
        # silently training audio-independent poses would be far worse
        raise ValueError("cfg.cond=True but no conditioning was passed")

    h = _activation(cfg, nn_core.conv1d(params["start1"], x))
    h = _activation(cfg, nn_core.conv1d(params["start2"], h))

    skip = 0.0
    layer_inputs: List[jnp.ndarray] = []
    for blk, dilation in zip(params["blocks"], cfg.dilations):
        if return_layer_inputs:
            layer_inputs.append(h)
        pad = (cfg.kernel_size - 1) * dilation
        f = nn_core.conv1d(blk["filter"], h, dilation=dilation, padding=[(pad, 0)])
        g = nn_core.conv1d(blk["gate"], h, dilation=dilation, padding=[(pad, 0)])
        if cond is not None and "cond_filter" in blk:
            f = f + nn_core.conv1d(blk["cond_filter"], cond)
            g = g + nn_core.conv1d(blk["cond_gate"], cond)
        z = jnp.tanh(f) * jax.nn.sigmoid(g)
        h = nn_core.conv1d(blk["res"], z) + h
        skip = skip + nn_core.conv1d(blk["skip"], z)

    out = nn_core.conv1d(params["end1"], _activation(cfg, skip))
    out = nn_core.conv1d(params["end2"], _activation(cfg, out))
    if output_length is not None:
        out = out[:, -output_length:, :]
    if return_layer_inputs:
        return out, layer_inputs
    return out


# ---------------------------------------------------------------------------
# Exact streaming decode
# ---------------------------------------------------------------------------

StreamState = Tuple[jnp.ndarray, ...]  # per-layer ring buffers [B, d_l, C]


def stream_init(
    params: Dict[str, Any],
    cfg: WaveNetConfig,
    x_hist: jnp.ndarray,
    cond_hist: Optional[jnp.ndarray] = None,
) -> StreamState:
    """Prime per-layer ring buffers from a history window.

    Args:
        x_hist: [B, L, input_channels] with L >= 1 (typically RF-1 warmup
            frames: the reference fills the history with `pre_headpose`
            repeats, audio2headpose_model.py:159-161).
    Returns:
        Tuple of [B, d_l, residual_channels] buffers (layer trunk tails).
    """
    _, layer_inputs = forward(params, cfg, x_hist, cond_hist, return_layer_inputs=True)
    B, L, _ = x_hist.shape
    buffers = []
    for trunk, dilation in zip(layer_inputs, cfg.dilations):
        d = dilation * (cfg.kernel_size - 1)
        if L >= d:
            buf = trunk[:, L - d :, :]
        else:  # left-pad with zeros (matches the conv's zero padding)
            buf = jnp.concatenate(
                [jnp.zeros((B, d - L, trunk.shape[2]), trunk.dtype), trunk], axis=1
            )
        buffers.append(buf)
    return tuple(buffers)


def stream_step(
    params: Dict[str, Any],
    cfg: WaveNetConfig,
    state: StreamState,
    x_t: jnp.ndarray,
    cond_t: Optional[jnp.ndarray] = None,
    cond_proj_t: Optional[Sequence[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
) -> Tuple[StreamState, jnp.ndarray]:
    """One causal step: consume x_t, emit y_t (depends on x_{t-RF+1..t}).

    Every conv collapses to a couple of [B, C] x [C, C'] matmuls (kernel
    tap 0 reads the ring buffer head, tap 1 reads the current trunk value).
    Conditioning may be given raw (cond_t: [B, cond_channels]) or as
    precomputed per-layer projections (cond_proj_t: [(f_add, g_add), ...]),
    which lets an autoregressive sampler hoist all audio projections out of
    its lax.scan as one big batched matmul.

    Returns (new_state, [B, output_channels]).
    """
    if cfg.kernel_size != 2:
        raise NotImplementedError("streaming decode supports kernel_size=2 (the only configuration the reference ships)")
    h = _activation(cfg, x_t @ params["start1"]["w"][0] + params["start1"]["b"])
    h = _activation(cfg, h @ params["start2"]["w"][0] + params["start2"]["b"])

    skip = 0.0
    new_buffers = []
    for li, (blk, dilation, buf) in enumerate(zip(params["blocks"], cfg.dilations, state)):
        x_old = buf[:, 0, :]  # trunk value at t - dilation
        f = x_old @ blk["filter"]["w"][0] + h @ blk["filter"]["w"][1]
        g = x_old @ blk["gate"]["w"][0] + h @ blk["gate"]["w"][1]
        if "b" in blk["filter"]:
            f = f + blk["filter"]["b"]
            g = g + blk["gate"]["b"]
        if cond_proj_t is not None and cond_proj_t[li] is not None:
            f = f + cond_proj_t[li][0]
            g = g + cond_proj_t[li][1]
        elif cond_t is not None and "cond_filter" in blk:
            f = f + cond_t @ blk["cond_filter"]["w"][0] + blk["cond_filter"]["b"]
            g = g + cond_t @ blk["cond_gate"]["w"][0] + blk["cond_gate"]["b"]
        z = jnp.tanh(f) * jax.nn.sigmoid(g)
        res = z @ blk["res"]["w"][0]
        if "b" in blk["res"]:
            res = res + blk["res"]["b"]
        s = z @ blk["skip"]["w"][0]
        if "b" in blk["skip"]:
            s = s + blk["skip"]["b"]
        skip = skip + s
        new_buffers.append(jnp.concatenate([buf[:, 1:, :], h[:, None, :]], axis=1))
        h = res + h

    out = _activation(cfg, skip) @ params["end1"]["w"][0] + params["end1"]["b"]
    out = _activation(cfg, out) @ params["end2"]["w"][0] + params["end2"]["b"]
    return tuple(new_buffers), out


def precompute_cond_projections(
    params: Dict[str, Any], cond: jnp.ndarray
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Hoist all layers' 1x1 conditional projections over a whole cond
    sequence: [B, T, cond_ch] -> per-layer ([B, T, dil_ch], [B, T, dil_ch]).

    Inside an AR lax.scan these are then just per-step gathers.
    """
    out = []
    for blk in params["blocks"]:
        if "cond_filter" not in blk:
            out.append(None)
            continue
        f = cond @ blk["cond_filter"]["w"][0] + blk["cond_filter"]["b"]
        g = cond @ blk["cond_gate"]["w"][0] + blk["cond_gate"]["b"]
        out.append((f, g))
    return out

"""Minimal functional NN toolkit: params are plain pytrees (nested dicts),
every layer is an (init, apply) pair of pure functions.

Design notes (vs the reference's torch.nn modules, models/networks.py):

* No module objects, no reflection, no importlib registries - a model is a
  params pytree plus pure apply functions, which is what pjit/grad/scan
  want to see.
* Convolutions run in NHWC (TPU-native layout); recurrent cells split
  their input projections (one big batched matmul outside lax.scan) from
  the recurrent matmul (inside the scan) so the MXU sees large GEMMs.
* Initialisers reproduce the reference's init_weights semantics
  (networks.py:347-378: normal(0, 0.02) for conv/linear, N(1, 0.02) for
  batch-norm scale) plus torch's default uniform fan-in init for RNN cells.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialisers (networks.py:347-378 semantics)
# ---------------------------------------------------------------------------


def normal_init(key, shape, gain: float = 0.02, dtype=jnp.float32):
    return gain * jax.random.normal(key, shape, dtype)


def xavier_normal_init(key, shape, gain: float = 0.02, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_init(key, shape, gain: float = 0.02, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def orthogonal_init(key, shape, gain: float = 0.02, dtype=jnp.float32):
    rows, cols = int(np.prod(shape[:-1])), shape[-1]
    # QR needs the tall orientation; transpose back for widening layers
    # (rows < cols), like torch.nn.init.orthogonal_
    a = jax.random.normal(key, (max(rows, cols), min(rows, cols)), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if rows < cols:
        q = q.T
    return gain * q.reshape(shape)


def uniform_fan_init(key, shape, fan: int, dtype=jnp.float32):
    """torch RNN default: U(-1/sqrt(hidden), 1/sqrt(hidden))."""
    bound = 1.0 / math.sqrt(fan)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


INITIALIZERS = {
    "normal": normal_init,
    "xavier": xavier_normal_init,
    "kaiming": kaiming_normal_init,
    "orthogonal": orthogonal_init,
}


def _fans(shape) -> Tuple[int, int]:
    """(fan_in, fan_out) for dense [I, O] or conv [Kh, Kw, I, O] kernels."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int, init: str = "normal", gain: float = 0.02,
               bias: bool = True) -> Params:
    kw, _ = jax.random.split(key)
    p: Params = {"w": INITIALIZERS[init](kw, (in_dim, out_dim), gain)}
    if bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# Conv1d (NWC layout) - used by WaveNet
# ---------------------------------------------------------------------------


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int = 1, init: str = "normal",
                gain: float = 0.02, bias: bool = True) -> Params:
    kw, _ = jax.random.split(key)
    p: Params = {"w": INITIALIZERS[init](kw, (kernel, in_ch, out_ch), gain)}
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def conv1d(params: Params, x: jnp.ndarray, dilation: int = 1,
           padding: str | Sequence[Tuple[int, int]] = "VALID") -> jnp.ndarray:
    """x: [N, W, C] -> [N, W', C']."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1,),
        padding=padding if isinstance(padding, str) else list(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# Conv2d / ConvTranspose2d (NHWC)
# ---------------------------------------------------------------------------


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int = 3, init: str = "normal",
                gain: float = 0.02, bias: bool = True) -> Params:
    kw, _ = jax.random.split(key)
    p: Params = {"w": INITIALIZERS[init](kw, (kernel, kernel, in_ch, out_ch), gain)}
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def conv2d(params: Params, x: jnp.ndarray, stride: int = 1,
           padding: int = 0) -> jnp.ndarray:
    """x: [N, H, W, C] -> [N, H', W', C']; integer symmetric padding.

    Dispatches on the param format: a quantized layer (`quantize_conv`)
    runs s8xs8->s32 on the MXU's int8 path (2x bf16 peak on v5e); a
    QAT-tagged layer (`fake_quant_conv`) emulates that arithmetic in
    float with a straight-through estimator so the weights stay
    trainable."""
    if "w_q" in params:
        return _conv2d_q8(params, x, stride, padding)
    if "fq8" in params:
        return _conv2d_fakequant_int8(params, x, stride, padding)
    if "fq" in params:
        return _conv2d_fakequant(params, x, stride, padding)
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


def quantize_weight_int8(w: jnp.ndarray, axes=(0, 1, 2)):
    """Shared per-channel symmetric int8 weight quantizer: returns
    (w_q int8 in [-127, 127], scale) with scale = amax/127 floored at
    1e-12.  Every int8 form (deployed conv, QAT custom-VJP, subpixel /
    dilated rewrites) MUST quantize through this one expression - the
    bit-identity guarantees between them depend on it."""
    w = jnp.asarray(w, jnp.float32)
    s_k = jnp.maximum(jnp.max(jnp.abs(w), axis=axes, keepdims=True),
                      1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / s_k), -127, 127).astype(jnp.int8)
    return w_q, jnp.squeeze(s_k, axis=axes)


def quantize_conv(params: Params) -> Params:
    """Per-output-channel symmetric int8 weight quantization of a conv2d
    layer: w = w_q * w_scale[c], w_q in [-127, 127]."""
    w_q, s = quantize_weight_int8(params["w"])
    q: Params = {"w_q": w_q, "w_scale": s}
    if "b" in params:
        q["b"] = params["b"]
    if "x_scale" in params:
        # calibrated static activation scale (e.g. baked during QAT
        # fine-tuning) rides through to the deployed int8 layer
        q["x_scale"] = params["x_scale"]
    return q


# Trace-time activation-amax collector for static-scale calibration
# (feature2face.calibrate_generator).  When active, every quantized conv
# appends its input's |x| max (a tracer under jit) in call order; the
# caller returns them as jit outputs and bakes x_scale into the params.
_CALIB_AMAX: Optional[list] = None


def begin_calibration() -> None:
    global _CALIB_AMAX
    _CALIB_AMAX = []


def end_calibration() -> list:
    global _CALIB_AMAX
    out, _CALIB_AMAX = _CALIB_AMAX, None
    return out if out is not None else []


def _quantize_activation(params: Params, x: jnp.ndarray):
    """Shared per-tensor activation quantization for every int8 conv form.

    Returns (x_q int8, s_x f32 scalar, dt).  The scale s_x is the layer's
    calibrated `x_scale` when present (static quantization: no reduction
    over x, and XLA fuses the quantize into the producing op); otherwise
    amax(|x|)/127, one full read of x per conv.  During calibration
    (begin_calibration active) the observed amax is recorded and used, so
    recording order == consumption order for every conv variant."""
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if _CALIB_AMAX is not None:
        amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        _CALIB_AMAX.append(amax)
        s_x = jnp.maximum(amax, 1e-12) / 127.0
    elif "x_scale" in params:
        s_x = params["x_scale"].astype(jnp.float32)
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x * (1.0 / s_x).astype(dt)), -127, 127
                   ).astype(jnp.int8)
    return x_q, s_x, dt


def _conv2d_q8(params: Params, x: jnp.ndarray, stride: int,
               padding: int) -> jnp.ndarray:
    """int8 convolution with per-tensor activation quantization.

    y = conv_s8(round(x/s_x), w_q) * (s_x * w_scale[c]) + b, accumulated
    in int32 on the MXU.  The quantize/rescale arithmetic runs in the
    activation dtype (bf16 in the inference path; integers <= 127 are
    exact in bf16, and the mul/round rounding is the same order as the
    int8 quantization noise itself)."""
    x_q, s_x, dt = _quantize_activation(params, x)
    y = jax.lax.conv_general_dilated(
        x_q, params["w_q"], window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(dt) * (params["w_scale"].astype(jnp.float32) * s_x).astype(dt)
    if "b" in params:
        y = y + params["b"]
    return y


def fake_quant_conv(params: Params, int8_forward: bool = False) -> Params:
    """Tag a float conv2d layer for quantization-aware training.

    The tagged layer's forward (`_conv2d_fakequant`) runs the SAME
    arithmetic the deployed int8 layer runs - per-output-channel weight
    scales, per-tensor activation scale, values rounded to the int8 grid
    - but in f32 with a straight-through estimator, so the float weights
    keep receiving gradients and learn to sit well on the grid.  The tag
    is a unit array leaf (jit-safe pytrees carry only arrays); its value
    is unused.  The reference has no QAT (fp16 autocast is its only
    reduced precision, feature2face_model.py:59-60).

    With `int8_forward=True` the tag is `fq8` and the forward pass runs
    the REAL deployed kernel - s8 x s8 -> s32 on the MXU's int8 path
    (`_conv2d_fakequant_int8`), bit-identical to `_conv2d_q8` - while the
    backward pass keeps the same straight-through-estimator gradients.
    Training then sees exactly what deployment computes (no f32-vs-int32
    accumulation gap) and the forward convs run at int8 speed."""
    if "w_q" in params:
        raise ValueError("fake_quant_conv expects a float conv (got int8)")
    if "fq" in params or "fq8" in params:
        raise ValueError(
            "conv already carries a QAT tag; strip it first (a double tag "
            "would make the dispatch and qat_tag_mode disagree)")
    tag = "fq8" if int8_forward else "fq"
    return dict(params, **{tag: jnp.ones((), jnp.float32)})


def _round_ste(v: jnp.ndarray) -> jnp.ndarray:
    """round() that is the identity to the gradient (straight-through)."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def _conv2d_fakequant(params: Params, x: jnp.ndarray, stride: int,
                      padding: int) -> jnp.ndarray:
    """QAT forward: f32 emulation of `_conv2d_q8` with STE gradients.

    y = conv(fq(x), fq(w)) + b where fq snaps values to the int8 grid at
    the deployment scales (weights: per-out-channel amax/127, exactly
    `quantize_conv`; activations: calibrated `x_scale` when present,
    else dynamic amax/127, exactly `_quantize_activation`).  Scales are
    stop-gradiented so learning happens only through the STE identity -
    the fine-tuned tree round-trips through `quantize_generator` to the
    very arithmetic trained against (up to f32-vs-int32 accumulation
    rounding).  Calibration recording works here too, so static scales
    can be baked before or after fine-tuning."""
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    w = params["w"].astype(jnp.float32)
    s_w = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0)
    w_fq = jnp.clip(_round_ste(w / s_w), -127, 127) * s_w
    xf = x.astype(jnp.float32)
    if _CALIB_AMAX is not None:
        amax = jax.lax.stop_gradient(jnp.max(jnp.abs(xf)))
        _CALIB_AMAX.append(amax)
        s_x = jnp.maximum(amax, 1e-12) / 127.0
    elif "x_scale" in params:
        s_x = jax.lax.stop_gradient(params["x_scale"].astype(jnp.float32))
    else:
        s_x = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0)
    x_fq = jnp.clip(_round_ste(xf / s_x), -127, 127) * s_x
    y = jax.lax.conv_general_dilated(
        x_fq, w_fq, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(dt)


def _q8_ste_primal(stride: int, padding: int, x, w, s_x):
    """Deployed int8 conv arithmetic, shared by primal and fwd rules.

    Mirrors `_conv2d_q8` expression-for-expression IN x's dtype dt
    (including quantizing x with a dt multiply by 1/s_x, not a divide,
    and rescaling in dt) so an fq8-tagged layer's forward is
    bit-identical to the layer it deploys as under both the f32 training
    path and the bf16 production compute dtype."""
    dt = x.dtype
    w_q, s_w = quantize_weight_int8(w)
    u = jnp.round(x * (1.0 / s_x).astype(dt))
    x_q = jnp.clip(u, -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # s_w.astype(dt).astype(f32) emulates the deployed tree's w_scale leaf
    # being cast to the compute dtype (feature2face._cast_net) and upcast
    # again inside _conv2d_q8; a no-op when dt is f32
    y = y.astype(dt) * (s_w.astype(dt).astype(jnp.float32) * s_x).astype(dt)
    return y, (x_q, w_q, s_x, s_w, u)


def _q8_ste(stride: int, padding: int, x, w, s_x):
    return _q8_ste_primal(stride, padding, x, w, s_x)[0]


_q8_ste = jax.custom_vjp(_q8_ste, nondiff_argnums=(0, 1))


def _q8_ste_fwd(stride: int, padding: int, x, w, s_x):
    y, (x_q, w_q, s_x, s_w, u) = _q8_ste_primal(stride, padding, x, w, s_x)
    # STE clip mask: the fake-quant emulation's clip(round(x/s_x)) passes
    # gradient exactly where the rounded value is inside [-127, 127].
    # Saved residuals are int8 + one bool per element - lighter than the
    # f32 activations autodiff would save through the float emulation.
    mask = jnp.abs(u) <= 127.0
    return y, (x_q, w_q, s_x, s_w, mask, jnp.zeros((), x.dtype))


def _q8_ste_bwd(stride: int, padding: int, res, g):
    """STE backward: gradients of conv(x_fq, w_fq) at the snapped values
    (exactly what `_conv2d_fakequant` differentiates to), with the clip
    mask applied to dx and zero cotangent for the stop-gradient scale.

    One deliberate divergence from the float emulation: the per-channel
    max-|w| weight sits EXACTLY on the +-127 grid edge, where the
    emulation's jnp.clip (min/max tie at equal args) leaks only half the
    cotangent through.  That 0.5 is a tie-splitting artifact, not STE
    semantics - an unclipped value's straight-through gradient is 1, and
    this rule passes it in full (weights never exceed the grid by
    construction of s_w, so the weight mask is identically 1)."""
    x_q, w_q, s_x, s_w, mask, dt_probe = res
    x_fq = x_q.astype(jnp.float32) * s_x.astype(jnp.float32)
    w_fq = w_q.astype(jnp.float32) * s_w.astype(jnp.float32)

    def f(xf, wf):
        return jax.lax.conv_general_dilated(
            xf, wf, window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(f, x_fq, w_fq)
    gx, gw = vjp(g.astype(jnp.float32))
    return (gx * mask).astype(dt_probe.dtype), gw, jnp.zeros_like(s_x)


_q8_ste.defvjp(_q8_ste_fwd, _q8_ste_bwd)


def _conv2d_fakequant_int8(params: Params, x: jnp.ndarray, stride: int,
                           padding: int) -> jnp.ndarray:
    """QAT forward on the REAL int8 kernel (`fake_quant_conv(int8_forward=
    True)` tag 'fq8'): s8 x s8 -> s32 on the MXU, bit-identical to the
    deployed `_conv2d_q8`, with `_conv2d_fakequant`'s straight-through
    gradients supplied by a custom VJP.  Closes the fake-quant path's
    residual f32-vs-int32 accumulation gap AND runs the forward convs at
    int8 speed (the v5e int8 MXU path is 2x bf16 peak).

    During calibration the float emulation handles the layer (identical
    amax recording order; calibration is a one-off where speed is moot
    and leaking tracers out of a custom_vjp body is not allowed)."""
    if _CALIB_AMAX is not None:
        return _conv2d_fakequant(params, x, stride, padding)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    dt = x.dtype
    # scale selection mirrors _quantize_activation leaf for leaf (amax in
    # x's dtype, then f32; a calibrated x_scale passes through the
    # deployed tree's compute-dtype cast first) so the quantized values -
    # and hence the whole layer output - are bit-identical to the
    # deployed _conv2d_q8 under f32 AND bf16 compute
    if "x_scale" in params:
        s_x = jax.lax.stop_gradient(
            params["x_scale"].astype(dt).astype(jnp.float32))
    else:
        s_x = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12)
            / 127.0)
    y = _q8_ste(stride, padding, x, jnp.asarray(params["w"], jnp.float32), s_x)
    if "b" in params:
        y = y + params["b"].astype(dt)  # deployed b leaf is compute-dtype
    return y


def conv_transpose2d(params: Params, x: jnp.ndarray, stride: int = 2,
                     padding: int = 1) -> jnp.ndarray:
    """torch ConvTranspose2d(k, stride, padding) parity via input dilation.

    out = conv(dilate(x, stride), flip(kernel)) with padding k-1-p, giving
    H_out = H*stride for the (k=4, s=2, p=1) U-Net upsampler.
    """
    k = params["w"].shape[0]
    pad = k - 1 - padding
    # Stored kernel is [kh, kw, C_in, C_out]; conv-transpose == conv over the
    # stride-dilated input with the spatially flipped kernel.
    w = jnp.flip(params["w"], axis=(0, 1))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# Subpixel up-convolution (inference transform of nearest-2x + 3x3 conv)
# ---------------------------------------------------------------------------


def subpixel_from_conv3x3(params: Params) -> Params:
    """Rewrite a [3,3,Ci,Co] conv that consumes a nearest-2x-upsampled map
    into its exact 4-phase 2x2 subpixel form evaluated at COARSE
    resolution.

    Output pixel (2i+a, 2j+b) of conv(up2x(x)) reads fine rows
    2i+a-1..2i+a+1, which collapse onto TWO coarse rows (duplicated rows
    share a tap, so their weights sum): a=0 -> coarse [i-1, i] with taps
    (w0, w1+w2); a=1 -> coarse [i, i+1] with taps (w0+w1, w2); same per
    column.  Each phase is a 2x2 conv over the coarse map - 4/9 the
    multiply-adds of the fine-resolution 3x3 conv, with 4x the output
    channels to fill the MXU's 128-wide output tiling (the per-phase
    kernels are dense, unlike the zero-padded single-conv formulation).

    Accepts a float ('w') or int8-quantized ('w_q'/'w_scale') layer; a
    quantized layer is dequantized, rewritten and requantized with
    per-(phase, out-channel) scales, keeping any calibrated 'x_scale'
    (the conv input is the same coarse tensor, so its activation scale is
    unchanged)."""
    if "w_q" in params:
        w = params["w_q"].astype(jnp.float32) * params["w_scale"]
    else:
        w = jnp.asarray(params["w"], jnp.float32)
    rows = [jnp.stack([w[0], w[1] + w[2]]),        # a=0: coarse [i-1, i]
            jnp.stack([w[0] + w[1], w[2]])]        # a=1: coarse [i, i+1]
    phases = []
    for a in range(2):
        r = rows[a]  # [2, 3, Ci, Co]
        phases.append(jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1))  # b=0
        phases.append(jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1))  # b=1
    w_ph = jnp.stack(phases)  # [4 (a*2+b), 2, 2, Ci, Co]
    q: Params = {}
    if "w_q" in params:
        q["w_ph_q"], s = quantize_weight_int8(w_ph, axes=(1, 2, 3))
        q["w_ph_scale"] = s  # [4, Co]
        if "x_scale" in params:
            q["x_scale"] = params["x_scale"]
    else:
        q["w_ph"] = w_ph
    if "b" in params:
        q["b"] = params["b"]
    return q


def upconv_subpixel(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, h, w, Ci] -> [B, 2h, 2w, Co]; bit-for-bit the same map as
    conv2d(w3x3, upsample_nearest_2x(x), padding=1) up to float summation
    order (see subpixel_from_conv3x3)."""
    quant = "w_ph_q" in params
    if quant:
        x_in, s_x, dt = _quantize_activation(params, x)
    else:
        x_in = x
    outs = []
    for p, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        w = params["w_ph_q"][p] if quant else params["w_ph"][p]
        y = jax.lax.conv_general_dilated(
            x_in, w, window_strides=(1, 1),
            padding=[(1 - a, a), (1 - b, b)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            **({"preferred_element_type": jnp.int32} if quant else {}),
        )
        if quant:
            y = y.astype(dt) * (
                params["w_ph_scale"][p].astype(jnp.float32) * s_x).astype(dt)
        outs.append(y)
    y = jnp.stack(outs, axis=3)  # [B, h, w, 4, Co], phase index = a*2+b
    B, h, w_, _, Co = y.shape
    y = y.reshape(B, h, w_, 2, 2, Co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, 2 * h, 2 * w_, Co)
    if "b" in params:
        y = y + params["b"]
    return y


def subpixel1_from_conv3x3(params: Params) -> Params:
    """Single-conv variant of subpixel_from_conv3x3: ONE 3x3 conv at
    coarse resolution with 4x the output channels (phase-major), the
    uncovered taps structurally zero.

    Same multiply-adds as the fine-resolution conv (the zeros are not
    skipped), but the output-channel dim grows 4x - decisive when Co is
    far below the MXU's 128-wide tiling (the outermost to-RGB conv has
    Co=3) - and the 2x-upsampled input is never materialised.  Unlike the
    4-conv form it stays ONE convolution, so XLA keeps a single epilogue
    fusion.  Phase (a) covers coarse rows {i-1, i} (a=0) or {i, i+1}
    (a=1); the 3-tap kernel zeroes the uncovered row."""
    if "w_q" in params:
        w = params["w_q"].astype(jnp.float32) * params["w_scale"]
    else:
        w = jnp.asarray(params["w"], jnp.float32)
    z = jnp.zeros_like(w[0])
    rows = [jnp.stack([w[0], w[1] + w[2], z]),       # a=0: taps {-1, 0}
            jnp.stack([z, w[0] + w[1], w[2]])]       # a=1: taps {0, +1}
    phases = []
    for a in range(2):
        r = rows[a]  # [3, 3, Ci, Co]
        zc = jnp.zeros_like(r[:, 0])
        phases.append(jnp.stack([r[:, 0], r[:, 1] + r[:, 2], zc], axis=1))
        phases.append(jnp.stack([zc, r[:, 0] + r[:, 1], r[:, 2]], axis=1))
    w4 = jnp.stack(phases, axis=-1)  # [3, 3, Ci, Co, 4(a*2+b)]
    kh, kw, ci, co, _ = w4.shape
    w4 = w4.transpose(0, 1, 2, 4, 3).reshape(kh, kw, ci, 4 * co)
    q: Params = {}
    if "w_q" in params:
        q["w_sp1_q"], s = quantize_weight_int8(w4)
        q["w_sp1_scale"] = s  # [4*Co]
        if "x_scale" in params:
            q["x_scale"] = params["x_scale"]
    else:
        q["w_sp1"] = w4
    if "b" in params:
        q["b"] = params["b"]
    return q


def upconv_subpixel1(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a subpixel1_from_conv3x3 layer: [B, h, w, Ci] -> [B, 2h, 2w,
    Co], the same map as conv2d(w3x3, upsample_nearest_2x(x), padding=1)."""
    quant = "w_sp1_q" in params
    if quant:
        x_in, s_x, dt = _quantize_activation(params, x)
        w = params["w_sp1_q"]
    else:
        x_in = x
        w = params["w_sp1"]
    y = jax.lax.conv_general_dilated(
        x_in, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **({"preferred_element_type": jnp.int32} if quant else {}),
    )
    if quant:
        y = y.astype(dt) * (params["w_sp1_scale"].astype(jnp.float32) * s_x
                            ).astype(dt)
    B, h, w_, c4 = y.shape
    co = c4 // 4
    # channel layout is (phase a*2+b major over co): [..., 4, co]
    y = y.reshape(B, h, w_, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, 2 * h, 2 * w_, co)
    if "b" in params:
        y = y + params["b"]
    return y


def dilated_from_conv3x3(params: Params) -> Params:
    """Third subpixel form: pack the 4 phase kernels into ONE 4x4 kernel
    applied with lhs_dilation=2 (a true transposed convolution).

    Placing x[j] at dilated position 2j and choosing padding (2, 2),
    output row p = 2i+a reads dilated positions p-2..p+1; the non-zero
    ones are exactly the two coarse taps of phase a: even kernel rows u
    serve phase a=0 (taps w0 then w1+w2 on coarse rows {i-1, i}), odd
    rows serve a=1 (w0+w1 then w2 on {i, i+1}).  Same map as
    conv2d(upsample_nearest_2x(x)), computed in one conv with no
    materialised upsample and no phase interleave.  Same multiply-add
    count as the 4-conv form (the dilated zeros are structural)."""
    if "w_q" in params:
        w = params["w_q"].astype(jnp.float32) * params["w_scale"]
    else:
        w = jnp.asarray(params["w"], jnp.float32)
    # per-dim 2-tap kernels per output phase
    k0 = [w[0], w[1] + w[2]]            # a=0: coarse rows {i-1, i}
    k1 = [w[0] + w[1], w[2]]            # a=1: coarse rows {i, i+1}

    def tap(u):  # kernel position u -> [3, Ci, Co] row slice
        return k0[u // 2] if u % 2 == 0 else k1[(u - 1) // 2]

    rows = []
    for u in range(4):
        r = tap(u)  # [3, Ci, Co] (kernel columns still unexpanded)
        c0 = [r[0], r[1] + r[2]]
        c1 = [r[0] + r[1], r[2]]
        cols = [c0[v // 2] if v % 2 == 0 else c1[(v - 1) // 2]
                for v in range(4)]
        rows.append(jnp.stack(cols))
    w4 = jnp.stack(rows)  # [4, 4, Ci, Co]
    q: Params = {}
    if "w_q" in params:
        q["w_dl_q"], s = quantize_weight_int8(w4)
        q["w_dl_scale"] = s
        if "x_scale" in params:
            q["x_scale"] = params["x_scale"]
    else:
        q["w_dl"] = w4
    if "b" in params:
        q["b"] = params["b"]
    return q


def upconv_dilated(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a dilated_from_conv3x3 layer: [B, h, w, Ci] -> [B, 2h, 2w,
    Co], same map as conv2d(w3x3, upsample_nearest_2x(x), padding=1)."""
    quant = "w_dl_q" in params
    if quant:
        x_in, s_x, dt = _quantize_activation(params, x)
        w = params["w_dl_q"]
    else:
        x_in = x
        w = params["w_dl"]
    y = jax.lax.conv_general_dilated(
        x_in, w, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **({"preferred_element_type": jnp.int32} if quant else {}),
    )
    if quant:
        y = y.astype(dt) * (params["w_dl_scale"].astype(jnp.float32) * s_x
                            ).astype(dt)
    if "b" in params:
        y = y + params["b"]
    return y


def split_from_concat_conv(params: Params, n_a: int) -> Params:
    """Rewrite a conv whose input is cat(a, b) (a = first n_a channels)
    into the concat-free pair form consumed by upconv_split.

    Pure kernel slicing - conv(cat(a, b), w) = conv(a, w[:n_a]) +
    conv(b, w[n_a:]) by linearity, so float is exact up to summation
    order and int8 (same w_scale per out channel, shared x_scale, int32
    partials summed before the rescale) is bit-identical wherever the
    backend's int8 conv is integer-exact (the TPU MXU path; XLA:CPU
    emulates through float accumulation, leaving ~1e-8 noise)."""
    q: Params = {}
    if "w_q" in params:
        q["w_a_q"] = params["w_q"][:, :, :n_a, :]
        q["w_b_q"] = params["w_q"][:, :, n_a:, :]
        q["w_scale"] = params["w_scale"]
        if "x_scale" in params:
            q["x_scale"] = params["x_scale"]
    else:
        q["w_a"] = params["w"][:, :, :n_a, :]
        q["w_b"] = params["w"][:, :, n_a:, :]
    if "b" in params:
        q["b"] = params["b"]
    return q


def upconv_split(params: Params, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Concat-free up conv over the U-Net (skip, submodule) pair: each
    half is upsampled 2x and convolved with its kernel slice, partials
    summed - the same map as conv2d(w, upsample_nearest_2x(cat(a, b)),
    padding=1) without ever materialising the concat.

    int8 path: ONE shared activation scale across both halves (amax over
    both, or the carried calibrated x_scale), quantized at COARSE
    resolution (nearest upsample commutes with the elementwise quantize),
    int32 partials summed before the rescale - bit-identical to the
    unsplit quantized conv on integer-exact backends.  During calibration a single joint amax is
    recorded, matching the one record the unsplit conv makes."""
    quant = "w_a_q" in params
    if quant:
        dt = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.float32
        if _CALIB_AMAX is not None:
            amax = jnp.maximum(jnp.max(jnp.abs(a)),
                               jnp.max(jnp.abs(b))).astype(jnp.float32)
            _CALIB_AMAX.append(amax)
            s_x = jnp.maximum(amax, 1e-12) / 127.0
        elif "x_scale" in params:
            s_x = params["x_scale"].astype(jnp.float32)
        else:
            s_x = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(a)),
                            jnp.max(jnp.abs(b))).astype(jnp.float32),
                1e-12) / 127.0
        inv = (1.0 / s_x).astype(dt)
        a_in = jnp.clip(jnp.round(a * inv), -127, 127).astype(jnp.int8)
        b_in = jnp.clip(jnp.round(b * inv), -127, 127).astype(jnp.int8)
        wa, wb = params["w_a_q"], params["w_b_q"]
    else:
        a_in, b_in, wa, wb = a, b, params["w_a"], params["w_b"]
    extra = {"preferred_element_type": jnp.int32} if quant else {}
    y = None
    for x_in, w in ((a_in, wa), (b_in, wb)):
        part = jax.lax.conv_general_dilated(
            upsample_nearest_2x(x_in), w, window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **extra)
        y = part if y is None else y + part
    if quant:
        y = y.astype(dt) * (params["w_scale"].astype(jnp.float32) * s_x
                            ).astype(dt)
    if "b" in params:
        y = y + params["b"]
    return y


def s2d_from_conv3x3s2(params: Params) -> Params:
    """Rewrite a [3,3,Ci,Co] stride-2 conv into an equivalent 2x2 stride-1
    conv over the space-to-depth(2) packed input ([B,H,W,Ci] ->
    [B,H/2,W/2,4Ci], phase-major channels).

    Output (i,j) of the stride-2 conv reads fine rows {2i-1, 2i, 2i+1},
    which live in coarse rows {i-1 (phase 1), i (phases 0 and 1)} - a
    2-tap coarse window where each tap sees only one row-phase: tap 0 ->
    (phase 1 -> w0); tap 1 -> (phase 0 -> w1, phase 1 -> w2); same per
    column.  The packed kernel is [2,2,4Ci,Co] with the uncovered
    phase slots zero (16/9 the nominal MACs, but 4x the input channels:
    a Ci=13 conv runs at ~1-2% of MXU peak from channel-padding waste,
    the packed form tiles properly).  Float layers only (the outermost
    down conv stays unquantized by design)."""
    w = jnp.asarray(params["w"], jnp.float32)  # [3, 3, Ci, Co]
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4, ci, co), w.dtype)
    # row_map[(s, a)] = fine kernel row u covered by coarse tap s, phase a
    row_map = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (s, a), u in row_map.items():
        for (t, b), v in row_map.items():
            w2 = w2.at[s, t, a * 2 + b].set(w[u, v])
    q: Params = {"w_s2d": w2.reshape(2, 2, 4 * ci, co)}
    if "b" in params:
        q["b"] = params["b"]
    return q


def conv_s2d_down(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply an s2d_from_conv3x3s2 layer: [B, H, W, C] -> [B, H/2, W/2, Co],
    the same map as conv2d(w3x3, x, stride=2, padding=1)."""
    B, H, W, C = x.shape
    xp = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(B, H // 2, W // 2, 4 * C)  # phase-major channels
    y = jax.lax.conv_general_dilated(
        xp, params["w_s2d"], window_strides=(1, 1),
        padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------


def batchnorm_init(num_features: int, init_scale_noise: Optional[jax.Array] = None,
                   gain: float = 0.02) -> Params:
    """BatchNorm params + running stats.

    The reference's init_weights draws BatchNorm2d scale from N(1, 0.02)
    (networks.py:373-375); pass a PRNG key as init_scale_noise to match.
    """
    scale = jnp.ones((num_features,))
    if init_scale_noise is not None:
        scale = 1.0 + 0.02 / gain * normal_init(init_scale_noise, (num_features,), gain)
    return {
        "scale": scale,
        "bias": jnp.zeros((num_features,)),
        "mean": jnp.zeros((num_features,)),
        "var": jnp.ones((num_features,)),
    }


# One-pass training-mode BN statistics (opt-in, LSP_BN_ONEPASS=1).
#
# The default training path computes x.mean then x.var: two reduction
# passes over the activation that XLA cannot sibling-fuse (var's input
# depends on mean's output), plus a third read for the normalise.  The
# round-5 per-op trace (docs/TRAIN_512.md) attributes 33% of the fused
# 512^2 GAN step to exactly these BN-training reductions.  The one-pass
# form reduces sum and sum-of-squares together - XLA multi-output
# fusion emits ONE pass over x for both - and folds the normalise into
# a single FMA y = x*a + b with a,b precomputed per channel in f32
# (E[x^2]-mean^2 cancellation is benign here: post-conv activations are
# zero-centred and the accumulation is f32 even under bf16 compute).
# Same torch-style running-stat update (biased mean / unbiased var).
# Default ON: measured 238.3 -> 225.5 ms/step (-5.4%) on the B=16 512^2
# fused GAN step, same window, reproducible at 3 and 5 iters
# (tools/trace_train.py; the standalone *_reduce_fusions drop 79 -> 32
# ms/step as XLA folds the stat pass into the conv fusions).  Opt out
# with LSP_BN_ONEPASS=0.
BN_ONEPASS = os.environ.get("LSP_BN_ONEPASS", "1") == "1"


def _bn_train_onepass(params: Params, x: jnp.ndarray, axes,
                      momentum: float, eps: float):
    f32 = jnp.float32
    # shift by the RUNNING mean (a per-channel constant - fuses into the
    # same pass for free; a data gather was measured to break the fusion,
    # +27 ms/step at 512^2 B=16): E[(x-c)^2] - E[x-c]^2 with c near the
    # batch mean keeps the uncentered-sumsq cancellation factor
    # (1 + m^2/var) at O(1) once training is warm.  At init c=0 (plain
    # uncentered sums), whose extra reduction-order noise is ~1e-3
    # relative on the var - irrelevant next to batch-sampling noise, but
    # visible to cross-program bitwise-ish comparisons (see the tolerance
    # notes in test_parallel.py / test_train.py).
    c = jax.lax.stop_gradient(params["mean"]).astype(f32)
    xf = x.astype(f32) - c
    s1 = xf.sum(axis=axes)
    s2 = (xf * xf).sum(axis=axes)
    n = x.size / x.shape[-1]
    m = s1 / n
    var = jnp.maximum(s2 / n - m * m, 0.0)
    mean = c + m
    unbiased = var * n / max(n - 1, 1)
    new_params = dict(params)
    new_params["mean"] = ((1 - momentum) * params["mean"].astype(f32)
                          + momentum * mean).astype(params["mean"].dtype)
    new_params["var"] = ((1 - momentum) * params["var"].astype(f32)
                         + momentum * unbiased).astype(params["var"].dtype)
    a = jax.lax.rsqrt(var + eps) * params["scale"].astype(f32)
    b = params["bias"].astype(f32) - mean * a
    y = x * a.astype(x.dtype) + b.astype(x.dtype)
    return y, new_params


def batchnorm(params: Params, x: jnp.ndarray, training: bool = False,
              momentum: float = 0.1, eps: float = 1e-5):
    """Normalise over all axes but the last (channel) axis.

    Returns (y, updated_params): in training mode the running stats are
    updated torch-style (running <- (1-m)*running + m*batch, unbiased var);
    in eval mode running stats are used and params returned unchanged.
    """
    axes = tuple(range(x.ndim - 1))
    if training:
        if BN_ONEPASS:
            return _bn_train_onepass(params, x, axes, momentum, eps)
        mean = x.mean(axis=axes)
        var = x.var(axis=axes)
        n = x.size / x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_params = dict(params)
        # torch tracks running_mean with the biased batch mean and
        # running_var with the unbiased batch var.
        new_params["mean"] = (1 - momentum) * params["mean"] + momentum * mean
        new_params["var"] = (1 - momentum) * params["var"] + momentum * unbiased
    else:
        mean, var = params["mean"], params["var"]
        new_params = params
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_params


# ---------------------------------------------------------------------------
# Activations / resampling
# ---------------------------------------------------------------------------


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, 2H, 2W, C] nearest-neighbour."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def avg_pool(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """AvgPool2d(window, stride, padding, count_include_pad=False) parity
    (the multiscale-D downsampler, networks.py:790)."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return sums / counts


# ---------------------------------------------------------------------------
# Recurrent cells (torch gate layout for checkpoint-convertibility)
# ---------------------------------------------------------------------------


def gru_layer_init(key, in_dim: int, hidden: int) -> Params:
    """One GRU layer; torch gate order (r, z, n), fan-in uniform init."""
    k = jax.random.split(key, 4)
    return {
        "w_ih": uniform_fan_init(k[0], (in_dim, 3 * hidden), hidden),
        "w_hh": uniform_fan_init(k[1], (hidden, 3 * hidden), hidden),
        "b_ih": uniform_fan_init(k[2], (3 * hidden,), hidden),
        "b_hh": uniform_fan_init(k[3], (3 * hidden,), hidden),
    }


def gru_layer(params: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None):
    """Run a GRU over [B, T, I] -> ([B, T, H], h_T).

    The input projection x @ w_ih is one large batched matmul outside the
    scan; only the [H, 3H] recurrent matmul runs per step.
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    x_proj = x @ params["w_ih"] + params["b_ih"]  # [B, T, 3H]

    def step(h, xp):
        hp = h @ params["w_hh"] + params["b_hh"]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    hT, ys = jax.lax.scan(step, h0, x_proj.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), hT


def lstm_layer_init(key, in_dim: int, hidden: int) -> Params:
    """One LSTM layer; torch gate order (i, f, g, o)."""
    k = jax.random.split(key, 4)
    return {
        "w_ih": uniform_fan_init(k[0], (in_dim, 4 * hidden), hidden),
        "w_hh": uniform_fan_init(k[1], (hidden, 4 * hidden), hidden),
        "b_ih": uniform_fan_init(k[2], (4 * hidden,), hidden),
        "b_hh": uniform_fan_init(k[3], (4 * hidden,), hidden),
    }


def lstm_layer(params: Params, x: jnp.ndarray,
               state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
    """Run an LSTM over [B, T, I] -> ([B, T, H], (h_T, c_T))."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    if state is None:
        state = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    x_proj = x @ params["w_ih"] + params["b_ih"]  # [B, T, 4H]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ params["w_hh"] + params["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    final, ys = jax.lax.scan(step, state, x_proj.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), final

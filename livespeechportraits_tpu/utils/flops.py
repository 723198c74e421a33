"""Analytic FLOP count for the Feature2Face generators.

bench.py needs render FLOPs to report MFU, and computing them through the
live backend proved fragile (round 2 shipped ``mfu: null`` because
``lowered.cost_analysis()`` threw on the axon backend inside a bare
``except``).  The architecture is static, so the count is a pure function
of the params tree and the image size - no tracing, no backend, no compile.

Conventions (matched to XLA's HloCostAnalysis, asserted against the
compiler's own ``cost_analysis()['flops']`` for all three generator sizes
in tests/test_flops.py):

- convolution: 2 FLOPs per multiply-accumulate, counting ONLY taps that
  land on real input (positions where the kernel overlaps zero-padding or
  lhs-dilation holes are excluded - XLA does the same, which matters at
  the 1x1/2x2 innermost U-Net stages and for stride-2 transposed convs,
  where 3/4 of the dilated input is holes);
- batchnorm inference: 4 FLOPs/element + 1/channel;
- relu/residual add: 1/element; leaky-relu: 3/element;
- tanh: excluded (XLA books it under transcendentals, not flops).

Reference for the architectures being counted: /root/reference/models/
networks.py:458-769 (ResUNet 489-647, pix2pix U-Net 680-769).
"""

from __future__ import annotations

from typing import Any, Dict

Params = Dict[str, Any]


def _taps_1d(in_size: int, k: int, stride: int, pad: int, out_size: int,
             lhs_dilation: int = 1) -> int:
    """Number of (output position, kernel offset) pairs along one spatial
    dim whose tap lands on a real input element."""
    dil_size = (in_size - 1) * lhs_dilation + 1
    total = 0
    for o in range(out_size):
        base = o * stride - pad
        for u in range(k):
            d = base + u
            if 0 <= d < dil_size and d % lhs_dilation == 0:
                total += 1
    return total


def _conv_flops(w_shape, in_res: int, out_res: int, stride: int, pad: int,
                bias: bool, lhs_dilation: int = 1) -> float:
    kh, kw, cin, cout = (int(s) for s in w_shape)
    taps = _taps_1d(in_res, kh, stride, pad, out_res, lhs_dilation)
    f = 2.0 * taps * taps * cin * cout
    if bias:
        f += float(cout) * out_res * out_res
    return f


def _bn_flops(res: int, ch: int) -> float:
    return 4.0 * res * res * ch + ch


def _resblock_flops(p: Params, res: int) -> float:
    ch = int(p["conv1"]["w"].shape[-1])
    f = 0.0
    for c in ("conv1", "conv2"):
        f += _conv_flops(p[c]["w"].shape, res, res, 1, 1, "b" in p[c])
        f += _bn_flops(res, ch)
    f += 1.0 * res * res * ch            # inner relu
    f += 1.0 * res * res * ch            # residual add
    f += 1.0 * res * res * ch            # outer relu
    return f


def _resunet_stage_flops(p: Params, res: int) -> float:
    """One ResUNet stage whose input sits at ``res``^2 (feature2face.py
    _resunet_stage): stride-2 down conv -> res blocks at res/2 ->
    submodule at res/2 -> nearest-2x upsample + conv at res -> res blocks
    at res (non-outermost)."""
    outermost = "up_bn" not in p
    half = res // 2
    dw = p["down"]["w"].shape
    f = _conv_flops(dw, res, half, 2, 1, "b" in p["down"])
    inner = int(dw[-1])
    if "down_bn" in p:
        f += _bn_flops(half, inner)
    f += 1.0 * half * half * inner       # relu
    for rp in p["res_down"]:
        f += _resblock_flops(rp, half)
    if "sub" in p:
        f += _resunet_stage_flops(p["sub"], half)
    uw = p["up"]["w"].shape
    f += _conv_flops(uw, res, res, 1, 1, "b" in p["up"])
    outer = int(uw[-1])
    if not outermost:
        f += _bn_flops(res, outer)
        f += 1.0 * res * res * outer     # relu
        for rp in p["res_up"]:
            f += _resblock_flops(rp, res)
    return f


def _unet_stage_flops(p: Params, res: int) -> float:
    """Plain pix2pix U-Net stage (feature2face.py _unet_stage): leaky-relu
    + stride-2 4x4 down conv -> submodule -> relu + 4x4 stride-2
    transposed conv back to ``res`` (counted as the lhs-dilated conv XLA
    lowers it to: only taps on real input elements)."""
    outermost = "up_bn" not in p
    half = res // 2
    dw = p["down"]["w"].shape
    f = 0.0
    if not outermost:
        f += 3.0 * res * res * int(dw[2])     # leaky relu
    f += _conv_flops(dw, res, half, 2, 1, "b" in p["down"])
    inner = int(dw[-1])
    if "down_bn" in p:
        f += _bn_flops(half, inner)
    if "sub" in p:
        f += _unet_stage_flops(p["sub"], half)
    uw = p["up"]["w"].shape
    f += 1.0 * half * half * int(uw[2])       # relu
    # conv_transpose k=4 s=2 p=1 == conv over lhs-dilated input with
    # stride 1, effective pad k-1-p = 2
    f += _conv_flops(uw, half, res, 1, 2, "b" in p["up"], lhs_dilation=2)
    if not outermost:
        f += _bn_flops(res, int(uw[-1]))
    return f


def generator_flops(net: Params, size: str, image_size: int,
                    batch: int = 1) -> float:
    """Total forward FLOPs of one generator apply at ``image_size``^2
    (tanh output activation excluded - XLA books transcendentals apart).

    ``net`` is the FLOAT params tree (``models.feature2face['net']``);
    the int8/QAT/subpixel transforms do the same math, so the float count
    is "the work one frame represents" for effective-MFU reporting.
    """
    if size == "small":
        f = _unet_stage_flops(net, image_size)
    else:
        f = _resunet_stage_flops(net, image_size)
    return f * batch


def render_peak_flops(device_kind: str):
    """(peak_flops, label) for the device kind, or (None, None) if
    unknown.  bf16 MXU peaks from the public TPU specs."""
    kind = device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6e": 918e12, "trillium": 918e12}
    for k, v in peaks.items():
        if k in kind:
            return v, k
    return None, None

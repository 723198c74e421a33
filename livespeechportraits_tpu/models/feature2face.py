"""Feature2Face: pix2pixHD-style conditional U-Net renderer + multiscale
PatchGAN discriminator.

Capability parity with models/feature2face_G.py, models/feature2face_D.py
and networks.py:458-867.  Three generator variants selected by config
`size` (feature2face_G.py:16-21):

* 'small'  - classic pix2pix U-Net (k=4 s=2 convs, ConvTranspose ups,
             input_nc=23),
* 'normal' - ResUNet, 1 residual block per stage (input_nc=13),
* 'large'  - ResUNet, 2 residual blocks per stage (input_nc=13),

all with 8 downsamplings, ngf=64, tanh output.  Layout is NHWC and the
forward is bf16-friendly (params stay f32; activations can be cast by the
caller) - the reference used fp16 autocast + GradScaler on CUDA
(feature2face_model.py:59-60); on TPU bf16 needs no loss scaling.

Intended-behaviour divergences from reference bugs (documented per
SURVEY.md §2.3):

* The reference instantiates its discriminator with positionally
  misaligned arguments (feature2face_D.py:22 passes num_D into the
  norm_layer slot), silently degenerating to a single-scale PatchGAN
  without intermediate-feature taps, and declares input_nc = 23+3 although
  the training pair is 13+3 channels for 'normal'/'large'.  We build the
  *intended* model: num_D scales, intermediate features for the FM loss,
  input_nc = G-input + 3.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from livespeechportraits_tpu.config import Feature2FaceConfig
from livespeechportraits_tpu.models import nn_core

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Residual block (networks.py:650-676): conv-BN-ReLU-conv-BN + skip, ReLU
# ---------------------------------------------------------------------------


def _resblock_init(key, ch: int) -> Params:
    # BN scales draw N(1, 0.02) like the reference's init_weights
    # (networks.py:373-375); keys fold off the conv keys so the conv
    # init streams stay unchanged
    k1, k2 = jax.random.split(key)
    return {
        "conv1": nn_core.conv2d_init(k1, ch, ch, 3, bias=False),
        "bn1": nn_core.batchnorm_init(ch, jax.random.fold_in(k1, 1)),
        "conv2": nn_core.conv2d_init(k2, ch, ch, 3, bias=False),
        "bn2": nn_core.batchnorm_init(ch, jax.random.fold_in(k2, 1)),
    }


def _resblock(p: Params, x, training: bool):
    y = nn_core.conv2d(p["conv1"], x, padding=1)
    y, bn1 = nn_core.batchnorm(p["bn1"], y, training)
    y = jax.nn.relu(y)
    y = nn_core.conv2d(p["conv2"], y, padding=1)
    y, bn2 = nn_core.batchnorm(p["bn2"], y, training)
    out = jax.nn.relu(x + y)
    return out, dict(p, bn1=bn1, bn2=bn2)


# ---------------------------------------------------------------------------
# ResUNet ('normal' = 1 res block / stage, 'large' = 2) - networks.py:489-647
# ---------------------------------------------------------------------------


def _resunet_stage_init(key, outer_nc: int, inner_nc: int, input_nc: Optional[int],
                        n_res: int, outermost: bool, innermost: bool) -> Params:
    """One U-Net stage: downconv (+BN), res blocks, submodule slot,
    upsample+conv (+BN), res blocks."""
    if input_nc is None:
        input_nc = outer_nc
    ks = jax.random.split(key, 2 + 2 * n_res)
    p: Params = {
        "down": nn_core.conv2d_init(ks[0], input_nc, inner_nc, 3, bias=False),
        "res_down": [_resblock_init(ks[2 + i], inner_nc) for i in range(n_res)],
    }
    if not outermost and not innermost:
        p["down_bn"] = nn_core.batchnorm_init(
            inner_nc, jax.random.fold_in(ks[0], 1))
    up_in = inner_nc if innermost else inner_nc * 2
    p["up"] = nn_core.conv2d_init(ks[1], up_in, outer_nc, 3, bias=False)
    if not outermost:
        p["up_bn"] = nn_core.batchnorm_init(
            outer_nc, jax.random.fold_in(ks[1], 1))
        p["res_up"] = [_resblock_init(ks[2 + n_res + i], outer_nc) for i in range(n_res)]
    return p


def _resunet_stage(p: Params, sub_apply, x, training: bool, y_down=None,
                   depth: int = 0):
    """Returns ((x, out) skip/up pair - or out alone if outermost,
    updated params).  The consuming stage concatenates the pair (or
    consumes it concat-free via a split up conv, split_skip_generator).

    Stage kind is implicit in the param structure: the outermost stage has
    no up_bn; the innermost has no submodule.  y_down overrides the down
    conv's output (the split-candidate inference path).

    Stage-boundary activations are tagged with jax.ad_checkpoint
    checkpoint_name ("down{depth}"/"up{depth}", depth 0 = outermost, a
    no-op outside a jax.checkpoint policy) so training can rematerialise
    ONLY the outer high-resolution stages - the memory hogs at 512^2 -
    while keeping the deep stages' cheap small activations saved
    (steps.remat_policy).
    """
    outermost = "up_bn" not in p
    new_p = dict(p)
    if y_down is not None:
        y = y_down
    elif "w_s2d" in p["down"]:
        # inference transform: stride-2 conv over the space-to-depth
        # packed input (s2d_input_generator)
        y = nn_core.conv_s2d_down(p["down"], x)
    else:
        y = nn_core.conv2d(p["down"], x, stride=2, padding=1)
    if "down_bn" in p:
        y, new_p["down_bn"] = nn_core.batchnorm(p["down_bn"], y, training)
    y = jax.nn.relu(y)
    new_res_down = []
    for rp in p["res_down"]:
        y, nrp = _resblock(rp, y, training)
        new_res_down.append(nrp)
    new_p["res_down"] = new_res_down
    y = checkpoint_name(y, f"down{depth}")

    if sub_apply is not None:
        # non-innermost: the submodule hands back its (skip, up-out) PAIR;
        # the concat - when the up conv needs one - happens here at the
        # consume site, so the split form never materialises it.
        sub_out, new_p["sub"] = sub_apply(y)
    else:
        sub_out = y

    if "w_a" in p["up"] or "w_a_q" in p["up"]:
        # inference transform: concat-free split up conv over the skip /
        # submodule pair (split_skip_generator); same map as upsample +
        # conv on the concat
        y = nn_core.upconv_split(p["up"], sub_out[0], sub_out[1])
    else:
        y = (jnp.concatenate(sub_out, axis=-1)
             if isinstance(sub_out, tuple) else sub_out)
        if "w_ph" in p["up"] or "w_ph_q" in p["up"]:
            # inference transform: 4-phase subpixel conv at coarse
            # resolution (subpixel_generator), same map as upsample + conv
            y = nn_core.upconv_subpixel(p["up"], y)
        elif "w_sp1" in p["up"] or "w_sp1_q" in p["up"]:
            # single-conv subpixel form (subpixel_generator mode='single')
            y = nn_core.upconv_subpixel1(p["up"], y)
        elif "w_dl" in p["up"] or "w_dl_q" in p["up"]:
            # transposed-conv form (subpixel_generator mode='dilated')
            y = nn_core.upconv_dilated(p["up"], y)
        else:
            y = nn_core.upsample_nearest_2x(y)
            y = nn_core.conv2d(p["up"], y, padding=1)
    if not outermost:
        y, new_p["up_bn"] = nn_core.batchnorm(p["up_bn"], y, training)
        y = jax.nn.relu(y)
        new_res_up = []
        for rp in p["res_up"]:
            y, nrp = _resblock(rp, y, training)
            new_res_up.append(nrp)
        new_p["res_up"] = new_res_up
        return (x, checkpoint_name(y, f"up{depth}")), new_p
    return y, new_p


def _build_resunet_init(key, input_nc: int, output_nc: int, num_downs: int,
                        ngf: int, n_res: int) -> Params:
    """Innermost-out construction mirroring networks.py:458-475."""
    ks = iter(jax.random.split(key, num_downs + 1))
    stage = _resunet_stage_init(next(ks), ngf * 8, ngf * 8, None, n_res, False, True)
    stages = [stage]
    for _ in range(num_downs - 5):
        stages.append(_resunet_stage_init(next(ks), ngf * 8, ngf * 8, None, n_res, False, False))
    stages.append(_resunet_stage_init(next(ks), ngf * 4, ngf * 8, None, n_res, False, False))
    stages.append(_resunet_stage_init(next(ks), ngf * 2, ngf * 4, None, n_res, False, False))
    stages.append(_resunet_stage_init(next(ks), ngf, ngf * 2, None, n_res, False, False))
    stages.append(_resunet_stage_init(next(ks), output_nc, ngf, input_nc, n_res, True, False))

    # nest: outermost at top
    def nest(i) -> Params:
        p = stages[len(stages) - 1 - i]
        if len(stages) - 1 - i > 0:
            p = dict(p, sub=nest(i + 1))
        return p

    return nest(0)


def _resunet_apply(p: Params, x, training: bool, depth: int = 0):
    if "sub" in p:
        sub = lambda y: _resunet_apply(p["sub"], y, training, depth + 1)  # noqa: E731
    else:
        sub = None
    return _resunet_stage(p, sub, x, training, depth=depth)


# ---------------------------------------------------------------------------
# Plain pix2pix U-Net ('small') - networks.py:680-769
# ---------------------------------------------------------------------------


def _unet_stage_init(key, outer_nc: int, inner_nc: int, input_nc: Optional[int],
                     outermost: bool, innermost: bool) -> Params:
    if input_nc is None:
        input_nc = outer_nc
    k1, k2 = jax.random.split(key)
    p: Params = {
        # torch: downconv bias = (norm is InstanceNorm) = False; the
        # outermost ConvTranspose keeps torch's default bias=True
        # (networks.py:730-740).
        "down": nn_core.conv2d_init(k1, input_nc, inner_nc, 4, bias=False),
    }
    up_in = inner_nc if innermost else inner_nc * 2
    p["up"] = nn_core.conv2d_init(k2, up_in, outer_nc, 4, bias=outermost)
    if not outermost and not innermost:
        p["down_bn"] = nn_core.batchnorm_init(
            inner_nc, jax.random.fold_in(k1, 1))
    if not outermost:
        p["up_bn"] = nn_core.batchnorm_init(
            outer_nc, jax.random.fold_in(k2, 1))
    return p


def _unet_stage(p: Params, sub_apply, x, training: bool, y_down=None):
    outermost = "up_bn" not in p
    new_p = dict(p)
    if y_down is not None:
        y = y_down
    else:
        y = x
        if not outermost:
            y = nn_core.leaky_relu(y, 0.2)
        y = nn_core.conv2d(p["down"], y, stride=2, padding=1)
    if "down_bn" in p:
        y, new_p["down_bn"] = nn_core.batchnorm(p["down_bn"], y, training)

    if sub_apply is not None:
        y, new_p["sub"] = sub_apply(y)

    y = jax.nn.relu(y)
    y = nn_core.conv_transpose2d(p["up"], y, stride=2, padding=1)
    if not outermost:
        y, new_p["up_bn"] = nn_core.batchnorm(p["up_bn"], y, training)
        return jnp.concatenate([x, y], axis=-1), new_p
    return y, new_p


def _build_unet_init(key, input_nc: int, output_nc: int, num_downs: int, ngf: int) -> Params:
    ks = iter(jax.random.split(key, num_downs + 1))
    stages = [_unet_stage_init(next(ks), ngf * 8, ngf * 8, None, False, True)]
    for _ in range(num_downs - 5):
        stages.append(_unet_stage_init(next(ks), ngf * 8, ngf * 8, None, False, False))
    stages.append(_unet_stage_init(next(ks), ngf * 4, ngf * 8, None, False, False))
    stages.append(_unet_stage_init(next(ks), ngf * 2, ngf * 4, None, False, False))
    stages.append(_unet_stage_init(next(ks), ngf, ngf * 2, None, False, False))
    stages.append(_unet_stage_init(next(ks), output_nc, ngf, input_nc, True, False))

    def nest(i) -> Params:
        p = stages[len(stages) - 1 - i]
        if len(stages) - 1 - i > 0:
            p = dict(p, sub=nest(i + 1))
        return p

    return nest(0)


def _unet_apply(p: Params, x, training: bool):
    if "sub" in p:
        sub = lambda y: _unet_apply(p["sub"], y, training)  # noqa: E731
    else:
        sub = None
    return _unet_stage(p, sub, x, training)


# ---------------------------------------------------------------------------
# Public generator API
# ---------------------------------------------------------------------------


def init_generator(key: jax.Array, cfg: Feature2FaceConfig) -> Params:
    if cfg.size == "small":
        net = _build_unet_init(key, cfg.input_nc, cfg.output_nc, cfg.n_downsample, cfg.ngf)
    elif cfg.size == "normal":
        net = _build_resunet_init(key, cfg.input_nc, cfg.output_nc, cfg.n_downsample, cfg.ngf, 1)
    elif cfg.size == "large":
        net = _build_resunet_init(key, cfg.input_nc, cfg.output_nc, cfg.n_downsample, cfg.ngf, 2)
    else:
        raise ValueError(f"unknown generator size {cfg.size!r}")
    return {"net": net, "size": cfg.size}


def apply_generator(params: Params, x: jnp.ndarray, training: bool = False,
                    compute_dtype=None) -> Tuple[jnp.ndarray, Params]:
    """[B, H, W, input_nc] -> ([B, H, W, 3] in [-1, 1], updated params).

    compute_dtype=jnp.bfloat16 runs the conv stack in bf16 (weights cast
    on the fly; output restored to f32) - the TPU analogue of the
    reference's fp16 autocast path.
    """
    size = params["size"]
    net = params["net"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        net = _cast_net(net, compute_dtype)
    if size == "small":
        y, new_net = _unet_apply(net, x, training)
    else:
        y, new_net = _resunet_apply(net, x, training)
    y = jnp.tanh(y.astype(jnp.float32))
    if compute_dtype is not None:
        new_net = params["net"] if not training else jax.tree.map(
            lambda a, b: b.astype(a.dtype) if isinstance(a, jnp.ndarray) else b,
            params["net"], new_net,
        )
    return y, dict(params, net=new_net)


def quantize_generator(params: Params) -> Params:
    """int8 post-training quantization of a ResUNet generator for
    inference (TPU-native: v5e's int8 MXU path is 2x bf16 peak).

    Every interior conv (stage down/up convs and all residual-block
    convs) becomes a per-output-channel int8 layer with dynamic
    per-tensor activation quantization (nn_core.quantize_conv /
    conv2d dispatch).  The outermost stage's first conv (reading the
    1+12-channel edge/candidate input) and final to-RGB conv stay full
    precision - the quality-critical ends of the network, and keeping
    the first conv intact preserves the split-candidate fast path
    (precompute_cand_down).  Inference-only: BN uses running stats and
    the quantized tree is not trainable.

    The reference has no quantized path (fp16 autocast is its only
    reduced precision, feature2face_model.py:59-60); this is a
    TPU-capability extension, guarded by tests for fidelity vs the
    float forward."""
    size = params["size"]
    if size == "small":
        raise NotImplementedError(
            "int8 quantization targets the ResUNet variants ('normal'/"
            "'large'); the legacy pix2pix 'small' U-Net upsamples with "
            "ConvTranspose layers that keep the float path")

    def _q_res(r: Params) -> Params:
        return dict(r, conv1=nn_core.quantize_conv(r["conv1"]),
                    conv2=nn_core.quantize_conv(r["conv2"]))

    def _q_stage(p: Params, outermost: bool) -> Params:
        q = dict(p)
        if not outermost:
            q["down"] = nn_core.quantize_conv(p["down"])
            q["up"] = nn_core.quantize_conv(p["up"])
        q["res_down"] = [_q_res(r) for r in p["res_down"]]
        if "res_up" in p:
            q["res_up"] = [_q_res(r) for r in p["res_up"]]
        if "sub" in p:
            q["sub"] = _q_stage(p["sub"], outermost=False)
        return q

    return dict(params, net=_q_stage(params["net"], outermost=True))


def qat_generator(params: Params, int8_forward: bool = False) -> Params:
    """Tag a float ResUNet generator for quantization-aware fine-tuning.

    Tags exactly the conv subset `quantize_generator` quantizes (all
    interior stage down/up convs and residual convs; the outermost
    input/to-RGB convs stay float), so training sees the deployed int8
    arithmetic through `nn_core._conv2d_fakequant`'s straight-through
    estimator.  The tree stays float and trainable: the usual train
    steps, checkpoints and BN batch-stat updates all apply unchanged,
    and the fine-tuned weights deploy via the standard
    `quantize_generator` -> `fold_bn_generator` -> `calibrate_generator`
    stack.  Post-training quantization is the parity path; this is the
    capability extension that recovers the int8 fidelity gap when PTQ is
    not enough (the reference has no reduced-precision training at all,
    feature2face_model.py:59-60).

    `int8_forward=True` tags with 'fq8' instead: the QAT forward runs
    the real s8 x s8 -> s32 MXU kernel (bit-identical to deployment)
    with the same STE gradients - see nn_core._conv2d_fakequant_int8."""
    size = params["size"]
    if size == "small":
        raise NotImplementedError(
            "QAT targets the ResUNet variants ('normal'/'large'), "
            "matching quantize_generator")

    def _t(c: Params) -> Params:
        return nn_core.fake_quant_conv(c, int8_forward=int8_forward)

    def _t_res(r: Params) -> Params:
        return dict(r, conv1=_t(r["conv1"]), conv2=_t(r["conv2"]))

    def _t_stage(p: Params, outermost: bool) -> Params:
        q = dict(p)
        if not outermost:
            q["down"] = _t(p["down"])
            q["up"] = _t(p["up"])
        q["res_down"] = [_t_res(r) for r in p["res_down"]]
        if "res_up" in p:
            q["res_up"] = [_t_res(r) for r in p["res_up"]]
        if "sub" in p:
            q["sub"] = _t_stage(p["sub"], outermost=False)
        return q

    return dict(params, net=_t_stage(params["net"], outermost=True))


_QAT_TAGS = ("fq", "fq8")


def is_qat_generator(params: Params) -> bool:
    """True iff any conv in the tree carries a QAT tag (either mode)."""
    return qat_tag_mode(params) is not None


def qat_tag_mode(params: Params) -> Optional[str]:
    """The QAT tag present in the tree ('fq', 'fq8') or None."""
    def _walk(p) -> Optional[str]:
        if isinstance(p, dict):
            for t in _QAT_TAGS:
                if t in p:
                    return t
            for v in p.values():
                m = _walk(v)
                if m is not None:
                    return m
        elif isinstance(p, list):
            for v in p:
                m = _walk(v)
                if m is not None:
                    return m
        return None

    return _walk(params["net"])


def strip_qat_generator(params: Params) -> Params:
    """Remove QAT tags (both modes), returning a plain float tree
    (calibrated `x_scale` leaves, if any, stay: `quantize_conv` carries
    them into the deployed int8 layer)."""
    def _walk(p):
        if isinstance(p, dict):
            return {k: _walk(v) for k, v in p.items() if k not in _QAT_TAGS}
        if isinstance(p, list):
            return [_walk(v) for v in p]
        return p

    return dict(params, net=_walk(params["net"]))


def qat_discriminator(params: Params, int8_forward: bool = True) -> Params:
    """Tag the multiscale PatchGAN's interior convs for quantized
    training (default: the real int8 MXU kernel, STE gradients).

    The discriminator is train-only - it never deploys - so this is
    purely a training-FLOPs lever: with `int8_forward=True` the tagged
    forward convs run s8 x s8 -> s32 at the MXU's int8 rate while every
    gradient (including the one flowing through D into the generator)
    stays float via the straight-through custom VJP.  Each scale's first
    conv (reading the image pair) and final 1-channel logits conv stay
    float, mirroring `quantize_generator`'s keep-the-ends policy.

    Unlike the generator's QAT tags this transform is applied INSIDE the
    train step (steps.make_f2f_steps / make_f2f_fused_step `qat_d`), so
    checkpoints and optimizer state never see the tags and no resume
    handling is needed.  The reference has no reduced-precision D at all
    (fp16 autocast covers only the renderer, feature2face_model.py:59-60)."""
    def _t(c: Params) -> Params:
        return nn_core.fake_quant_conv(c, int8_forward=int8_forward)

    scales = []
    for s in params["scales"]:
        layers = s["layers"]
        mid = [dict(l, conv=_t(l["conv"])) for l in layers[1:-1]]
        scales.append(dict(s, layers=[layers[0], *mid, layers[-1]]))
    return dict(params, scales=scales)


def calibrate_generator(params: Params, inputs, compute_dtype=None,
                        margin: float = 1.0) -> Params:
    """Bake static per-conv activation scales into an int8-quantized
    ResUNet (activation-static quantization).

    Runs the forward on representative `inputs` (one [B, H, W, input_nc]
    batch or a sequence of them), records every quantized conv's input
    amax in call order, and stores `x_scale = max-over-batches(amax) *
    margin / 127` on each quantized conv.  Inference then skips the
    per-conv dynamic amax reduction (a full HBM read of every activation
    tensor, ~77 of them in the 'large' net) and XLA fuses the quantize
    into the producing op.

    On the calibration inputs themselves, static and dynamic
    quantization see the same scales, so (at margin=1, compute_dtype
    None) the forwards agree to the last f32 bit of the inter-conv float
    chains (the two programs fuse differently; observed <= 2e-9) - the
    conv-ordering guarantee is tested, not assumed (a misordered scale
    flips whole int8 grid steps).  The reference has no quantized path
    at all (fp16 autocast only, feature2face_model.py:59-60)."""
    if params["size"] == "small":
        raise NotImplementedError(
            "int8 calibration targets the ResUNet variants; quantize the "
            "generator first (quantize_generator)")

    net, size = params["net"], params["size"]

    batches = inputs if isinstance(inputs, (list, tuple)) else [inputs]

    def _amaxes_checked(net_in, x):
        nn_core.begin_calibration()
        try:
            apply_generator({"net": net_in, "size": size}, x,
                            training=False, compute_dtype=compute_dtype)
            rec = nn_core.end_calibration()
        finally:
            nn_core.end_calibration()
        if not rec:
            raise ValueError(
                "calibration recorded no activations: the tree has no "
                "quantized or QAT-tagged convs - run quantize_generator "
                "or qat_generator first")
        return jnp.stack(rec)

    fn = jax.jit(_amaxes_checked)
    amax = None
    for b in batches:
        a = fn(net, b)
        amax = a if amax is None else jnp.maximum(amax, a)
    import numpy as _np
    amax = _np.asarray(jax.device_get(amax), _np.float32)
    scales = iter(_np.maximum(amax * margin, 1e-12) / 127.0)

    # Assignment walk in the exact order _resunet_stage consumes convs:
    # down, res_down (conv1, conv2 each), submodule, up, res_up.
    def _assign_conv(c: Params) -> Params:
        # a split up conv (split_skip_generator) records ONE joint amax,
        # exactly like the unsplit conv it replaces; a QAT-tagged float
        # conv ('fq') records identically, so scales can be baked into
        # the training tree and ride through quantize_conv to deployment
        if "w_q" in c or "w_a_q" in c or "fq" in c or "fq8" in c:
            try:
                s = next(scales)
            except StopIteration:
                raise RuntimeError(
                    "parameter walk visited more quantized convs than the "
                    "forward recorded - forward/walk order mismatch") from None
            return dict(c, x_scale=jnp.asarray(s, jnp.float32))
        return c

    def _assign_res(r: Params) -> Params:
        return dict(r, conv1=_assign_conv(r["conv1"]),
                    conv2=_assign_conv(r["conv2"]))

    def _assign_stage(p: Params) -> Params:
        q = dict(p)
        q["down"] = _assign_conv(p["down"])
        q["res_down"] = [_assign_res(r) for r in p["res_down"]]
        if "sub" in p:
            q["sub"] = _assign_stage(p["sub"])
        q["up"] = _assign_conv(p["up"])
        if "res_up" in p:
            q["res_up"] = [_assign_res(r) for r in p["res_up"]]
        return q

    new_net = _assign_stage(net)
    leftovers = sum(1 for _ in scales)
    if leftovers:
        raise RuntimeError(
            f"calibration recorded {leftovers} more conv activations than "
            "the parameter walk visited - forward/walk order mismatch")
    return dict(params, net=new_net)


def fold_bn_generator(params: Params, eps: float = 1e-5) -> Params:
    """Inference-only transform: fold every conv->BN pair's running stats
    into the conv itself (classic deployment folding; the reference has
    no inference-optimised path at all).

    For k = scale/sqrt(var+eps): w' = w*k (per out channel), b' = bias -
    mean*k, and the BN params become an exact algebraic identity
    (scale=1, bias=0, mean=0, var=1-eps so rsqrt(var+eps)=1), which XLA
    constant-folds away.  Works on float and int8-quantized trees (for a
    quantized conv the fold lands on w_scale instead of the int8 weights,
    so the stored quantization is untouched).  Eval mode only - training
    normalises with batch stats.
    """
    def _fold_pair(conv: Params, bn: Params):
        k = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
        b = bn["bias"] - bn["mean"] * k
        new_conv = dict(conv)
        if "w_q" in conv:
            new_conv["w_scale"] = conv["w_scale"] * k
        else:
            new_conv["w"] = conv["w"] * k
        new_conv["b"] = conv.get("b", 0.0) * k + b
        ident = {"scale": jnp.ones_like(k), "bias": jnp.zeros_like(b),
                 "mean": jnp.zeros_like(b),
                 "var": jnp.full_like(k, 1.0 - eps)}
        return new_conv, ident

    def _fold_res(r: Params) -> Params:
        q = dict(r)
        q["conv1"], q["bn1"] = _fold_pair(r["conv1"], r["bn1"])
        q["conv2"], q["bn2"] = _fold_pair(r["conv2"], r["bn2"])
        return q

    def _fold_stage(p: Params) -> Params:
        q = dict(p)
        if "down_bn" in p:
            q["down"], q["down_bn"] = _fold_pair(p["down"], p["down_bn"])
        if "up_bn" in p:
            q["up"], q["up_bn"] = _fold_pair(p["up"], p["up_bn"])
        if "res_down" in p:
            q["res_down"] = [_fold_res(r) for r in p["res_down"]]
        if "res_up" in p:
            q["res_up"] = [_fold_res(r) for r in p["res_up"]]
        if "sub" in p:
            q["sub"] = _fold_stage(p["sub"])
        return q

    if params["size"] == "small":
        raise NotImplementedError(
            "BN folding targets the ResUNet variants; the 'small' U-Net "
            "applies BN after ConvTranspose upsampling, left unfolded")
    return dict(params, net=_fold_stage(params["net"]))


def subpixel_generator(params: Params, mode: str = "four",
                       outermost_only: bool = False) -> Params:
    """Inference-only transform: rewrite nearest-2x-upsample + 3x3 up
    convs into an exact subpixel conv evaluated at coarse resolution.

    mode='four': 4 separate 2x2 convs (nn_core.subpixel_from_conv3x3),
    4/9 the multiply-adds.  mode='single': ONE 3x3 conv with 4x output
    channels and zero-structured taps (nn_core.subpixel1_from_conv3x3),
    same multiply-adds but full-width MXU output tiling and no
    materialised upsample - decisive where Co is tiny (the outermost
    to-RGB conv, Co=3).  outermost_only limits the rewrite to that conv.

    Measured on v5e (BENCH_HISTORY round 2): mode='four' on all ups
    LOSES in-net (the relayouts beat the saved FLOPs); kept for other
    hardware.  Float and int8 trees both supported; apply AFTER
    quantize/fold/calibrate (the calibration walk expects 3x3 'up'
    convs).  The reference always pays the fine-resolution conv
    (networks.py:609-615 Upsample+Conv2d)."""
    if params["size"] == "small":
        raise NotImplementedError(
            "the 'small' pix2pix U-Net upsamples with ConvTranspose, not "
            "nearest+conv; subpixel rewrite targets the ResUNet variants")
    rewrite = {"four": nn_core.subpixel_from_conv3x3,
               "single": nn_core.subpixel1_from_conv3x3,
               "dilated": nn_core.dilated_from_conv3x3}[mode]

    def _walk(p: Params, outermost: bool) -> Params:
        q = dict(p)
        if outermost or not outermost_only:
            q["up"] = rewrite(p["up"])
        if "sub" in p:
            q["sub"] = _walk(p["sub"], False)
        return q

    return dict(params, net=_walk(params["net"], True))


def s2d_input_generator(params: Params) -> Params:
    """Inference-only transform: rewrite the OUTERMOST down conv (the
    [3,3,13,64] stride-2 conv reading the edge+candidate input) into a
    2x2 stride-1 conv over the space-to-depth packed input
    (nn_core.s2d_from_conv3x3s2).  A 13-channel conv wastes ~99% of the
    MXU's input-channel tiling; packing trades 16/9 the nominal MACs for
    4x the channels.  Interior stages are untouched (their skip tensors
    would all need repacking).  Incompatible with the split-candidate
    fast path (precompute_cand_down needs the 3x3 'w'), which loses
    in-pipeline anyway (docs/BENCH_HISTORY.md)."""
    if params["size"] == "small":
        raise NotImplementedError("s2d input rewrite targets the ResUNet "
                                  "variants")
    net = params["net"]
    return dict(params, net=dict(
        net, down=nn_core.s2d_from_conv3x3s2(net["down"])))


def split_skip_generator(params: Params) -> Params:
    """Inference-only transform: rewrite every skip-consuming up conv
    (all stages but the innermost) into the concat-free split form
    (nn_core.split_from_concat_conv), so no stage ever materialises its
    cat(skip, submodule-out) tensor - the device trace shows those
    concat copies at ~2.4 ms of a 31.5 ms int8 render batch.

    Exact: float up to summation order; int8 bit-identical on
    integer-exact conv backends (shared x_scale, int32 partials summed
    before the rescale - the TPU MXU path; XLA:CPU's float emulation
    leaves ~1e-8 reassociation noise).  Apply AFTER
    quantize/fold/calibrate and INSTEAD of the subpixel rewrites (both
    target the same 'up' convs).  The reference always materialises the
    concat (networks.py:609-615 torch.cat in UnetSkipConnectionBlock)."""
    if params["size"] == "small":
        raise NotImplementedError("split-skip rewrite targets the ResUNet "
                                  "variants ('small' uses ConvTranspose ups)")

    def _walk(p: Params) -> Params:
        q = dict(p)
        if "sub" in p:  # innermost up conv reads a single tensor: skip it
            for k in ("w", "w_q"):
                if k in p["up"]:
                    n_a = p["up"][k].shape[2] // 2
                    q["up"] = nn_core.split_from_concat_conv(p["up"], n_a)
                    break
            else:
                raise ValueError(
                    "split_skip_generator needs plain 3x3 'up' convs; this "
                    "tree already carries a subpixel/dilated rewrite "
                    f"({sorted(p['up'])})")
            q["sub"] = _walk(p["sub"])
        return q

    return dict(params, net=_walk(params["net"]))


def _cast_net(net: Params, compute_dtype):
    """Cast float leaves to the compute dtype - EXCEPT inside QAT-tagged
    convs, whose master weights must stay f32: deployment quantizes the
    f32 checkpoint (quantize_conv), so the fq/fq8 forward must quantize
    f32 weights too to see the deployed arithmetic.  The conv itself
    emulates the deployed tree's leaf casts (w_scale/b to compute dtype)
    from x's dtype - see nn_core._conv2d_fakequant_int8."""
    def _cast(a):
        if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(compute_dtype)
        return a

    def _walk(p):
        if isinstance(p, dict):
            if any(t in p for t in _QAT_TAGS):
                return p
            return {k: _walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [_walk(v) for v in p]
        return jax.tree.map(_cast, p)

    return _walk(net)


def precompute_cand_down(params: Params, cand_stack: jnp.ndarray,
                         compute_dtype=None) -> jnp.ndarray:
    """Per-subject constant contribution of the candidate channels to the
    outermost down conv.

    12 of the 13 generator input channels are the subject's candidate
    images, identical for every rendered frame (the reference concatenates
    them per forward, feature2face_G.py:8-34).  The outermost down conv is
    linear and bias-free, so conv(concat(edge, cand)) splits exactly into
    conv_edge(edge) + conv_cand(cand); this computes the candidate half
    once per subject.  cand_stack: [H, W, 12] -> [1, H/2, W/2, inner_nc].
    """
    net = params["net"]
    if "w" not in net["down"]:
        # s2d_input_generator replaced the input conv with a packed
        # 'w_s2d' kernel over channel-interleaved phases; the edge/cand
        # channel split no longer exists, so split_cand cannot apply.
        raise ValueError(
            "split_cand requires the plain outermost down conv; this "
            "generator's input conv was rewritten (s2d_input_generator) "
            f"and has keys {sorted(net['down'])}. Disable one of "
            "split_cand / s2d_input.")
    if compute_dtype is not None:
        net = _cast_net(net, compute_dtype)
        cand_stack = cand_stack.astype(compute_dtype)
    w_cand = net["down"]["w"][:, :, 1:, :]
    return jax.lax.conv_general_dilated(
        cand_stack[None], w_cand, window_strides=(2, 2),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def apply_generator_edge(params: Params, edge: jnp.ndarray,
                         cand_down: jnp.ndarray, training: bool = False,
                         compute_dtype=None) -> jnp.ndarray:
    """Inference forward on the edge channel only ([B, H, W, 1]), with the
    candidate half of the outermost down conv precomputed per subject
    (precompute_cand_down).  Mathematically the same program as
    apply_generator on concat(edge, cand) up to float summation order;
    skips re-reading + re-convolving 12 static channels per frame."""
    size = params["size"]
    net = params["net"]
    if compute_dtype is not None:
        edge = edge.astype(compute_dtype)
        cand_down = cand_down.astype(compute_dtype)
        net = _cast_net(net, compute_dtype)
    w_edge = net["down"]["w"][:, :, :1, :]
    y_down = jax.lax.conv_general_dilated(
        edge, w_edge, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + cand_down
    if size == "small":
        sub = (lambda y: _unet_apply(net["sub"], y, training)) if "sub" in net else None
        y, _ = _unet_stage(net, sub, edge, training, y_down=y_down)
    else:
        sub = (lambda y: _resunet_apply(net["sub"], y, training)) if "sub" in net else None
        y, _ = _resunet_stage(net, sub, edge, training, y_down=y_down)
    return jnp.tanh(y.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Multiscale PatchGAN discriminator (networks.py:773-867, intended config)
# ---------------------------------------------------------------------------


def init_discriminator(key: jax.Array, cfg: Feature2FaceConfig) -> Params:
    """num_D PatchGANs at successive half resolutions, intermediate
    features exposed for the FM loss."""
    input_nc = cfg.input_nc + 3
    scales = []
    for key_d in jax.random.split(key, cfg.num_D):
        ks = iter(jax.random.split(key_d, cfg.n_layers_D + 2))
        layers: List[Params] = []
        nf = cfg.ndf
        layers.append({"conv": nn_core.conv2d_init(next(ks), input_nc, nf, 4)})
        for n in range(1, cfg.n_layers_D):
            nf_prev, nf = nf, min(nf * 2, 512)
            kc = next(ks)
            layers.append({
                "conv": nn_core.conv2d_init(kc, nf_prev, nf, 4),
                "bn": nn_core.batchnorm_init(nf, jax.random.fold_in(kc, 1)),
            })
        nf_prev, nf = nf, min(nf * 2, 512)
        kc = next(ks)
        layers.append({
            "conv": nn_core.conv2d_init(kc, nf_prev, nf, 4),
            "bn": nn_core.batchnorm_init(nf, jax.random.fold_in(kc, 1)),
        })
        layers.append({"conv": nn_core.conv2d_init(next(ks), nf, 1, 4)})
        scales.append({"layers": layers})
    return {"scales": scales}


def apply_discriminator(params: Params, x: jnp.ndarray, training: bool = False):
    """Returns (list over scales of lists of intermediate features
    [... , final logits], updated params).  Finest scale first, matching
    MultiscaleDiscriminator.forward's result ordering (networks.py:801-813
    walks from the coarsest stored index down)."""
    results = []
    new_scales = []
    inp = x
    # n_layers is implicit: layers = [first conv] + (n_layers-1) strided +
    # 1 stride-1 BN conv + final logits conv.
    n_layers = len(params["scales"][0]["layers"]) - 2
    for si, scale in enumerate(params["scales"]):
        feats = []
        y = inp
        new_layers = []
        for li, layer in enumerate(scale["layers"]):
            stride = 2 if li < n_layers else 1
            y = nn_core.conv2d(layer["conv"], y, stride=stride, padding=2)
            new_layer = dict(layer)
            if "bn" in layer:
                y, new_layer["bn"] = nn_core.batchnorm(layer["bn"], y, training)
            if li < len(scale["layers"]) - 1:
                y = nn_core.leaky_relu(y, 0.2)
            feats.append(y)
            new_layers.append(new_layer)
        results.append(feats)
        new_scales.append({"layers": new_layers})
        if si != len(params["scales"]) - 1:
            inp = nn_core.avg_pool(inp, 3, 2, 1)
    return results, dict(params, scales=new_scales)

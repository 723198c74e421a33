"""GAN / perceptual / feature-matching losses for the renderer.

Capability parity with models/losses.py:116-267 (GANLoss, VGGLoss,
StyleLoss, MaskedL1Loss, Vgg19) and the loss assembly of
feature2face_model.py:129-178, plus the hinge mode the reference's
`--gan_mode` flag advertises but never implements.

VGG19: torchvision's pretrained model is not available in this image, so
`init_vgg19` builds the exact conv topology (16 conv layers; relu slices
after conv1_1, conv2_1, conv3_1, conv4_1, conv5_1 - matching the
reference's feature taps at losses.py:246-255) with ImageNet-normalised
inputs and accepts a weights .npz produced offline from
torchvision.models.vgg19 (see `load_vgg19_npz`).  Without weights it
falls back to a fixed-seed random VGG - still a usable perceptual metric
(random-VGG perceptual losses are a known-good fallback) and keeps the
training graph complete.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.models import nn_core

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# GAN loss (losses.py:116-159 + hinge)
# ---------------------------------------------------------------------------


def _flatten_final(preds) -> List[jnp.ndarray]:
    """Accept raw logits, a per-scale list, or a list of feature lists and
    return the final logits per scale."""
    if isinstance(preds, (list, tuple)):
        if preds and isinstance(preds[0], (list, tuple)):
            return [p[-1] for p in preds]
        return list(preds)
    return [preds]


def gan_loss(preds, target_is_real: bool, mode: str = "ls",
             for_discriminator: bool = True) -> jnp.ndarray:
    """LSGAN (MSE), vanilla (BCE-with-logits) or hinge GAN loss, summed over
    discriminator scales like GANLoss.__call__ (losses.py:149-159)."""
    total = 0.0
    for logits in _flatten_final(preds):
        if mode == "ls":
            target = 1.0 if target_is_real else 0.0
            total = total + jnp.mean((logits - target) ** 2)
        elif mode == "original":
            target = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
            total = total + jnp.mean(
                jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
        elif mode == "hinge":
            if for_discriminator:
                if target_is_real:
                    total = total + jnp.mean(jax.nn.relu(1.0 - logits))
                else:
                    total = total + jnp.mean(jax.nn.relu(1.0 + logits))
            else:
                total = total - jnp.mean(logits)
        else:
            raise ValueError(f"unknown gan mode {mode!r}")
    return total


def feature_matching_loss(pred_fake, pred_real, num_D: int, n_layers_D: int,
                          lambda_feat: float = 10.0) -> jnp.ndarray:
    """pix2pixHD FM loss (feature2face_model.py:181-190): L1 between D
    features of fake and (stop-gradient) real, weighted 4/(n_layers+1) per
    feature and 1/num_D per scale."""
    feat_w = 4.0 / (n_layers_D + 1)
    d_w = 1.0 / num_D
    loss = 0.0
    for i in range(min(len(pred_fake), num_D)):
        for j in range(len(pred_fake[i])):
            loss = loss + d_w * feat_w * jnp.mean(
                jnp.abs(pred_fake[i][j] - jax.lax.stop_gradient(pred_real[i][j]))
            ) * lambda_feat
    return loss


def masked_l1_loss(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """L1 restricted to a (broadcast) mask (losses.py:224-232)."""
    return jnp.mean(jnp.abs(x * mask - y * mask))


# ---------------------------------------------------------------------------
# VGG19 perceptual + style loss
# ---------------------------------------------------------------------------

# torchvision vgg19.features conv channel plan (conv index -> out channels)
_VGG19_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# feature-tap boundaries measured in *feature-layer indices* of
# torchvision's Sequential (conv+relu+pool flattened), matching
# losses.py:246-255: slices end after relu at indices 2, 7, 12, 21, 30.
_SLICE_ENDS = [1, 3, 5, 9, 13]  # in units of conv count (conv1_1 ... conv5_1)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_vgg19(seed: int = 0) -> Params:
    """Random-init VGG19 feature extractor (weights replaceable via
    `load_vgg19_npz`)."""
    key = jax.random.PRNGKey(seed)
    convs = []
    in_ch = 3
    for spec in _VGG19_PLAN:
        if spec == "M":
            convs.append("M")
            continue
        key, k = jax.random.split(key)
        convs.append(nn_core.conv2d_init(k, in_ch, int(spec), 3, init="kaiming", gain=1.0))
        in_ch = int(spec)
    return {"convs": convs}


def load_vgg19_npz(path: str) -> Params:
    """Load conv weights exported from torchvision:
        np.savez(path, **{f"conv{i}_w": w (OIHW), f"conv{i}_b": b})
    Kernels are transposed to HWIO."""
    data = np.load(path)
    params = init_vgg19()
    ci = 0
    convs = []
    for spec in _VGG19_PLAN:
        if spec == "M":
            convs.append("M")
            continue
        w = data[f"conv{ci}_w"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
        b = data[f"conv{ci}_b"]
        convs.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        ci += 1
    params["convs"] = convs
    return params


def vgg19_features(params: Params, x: jnp.ndarray,
                   from_tanh_range: bool = True) -> List[jnp.ndarray]:
    """[B, H, W, 3] -> 5 feature maps (relu_1..relu_5 taps).

    from_tanh_range: inputs in [-1, 1] (generator output) are mapped to
    ImageNet-normalised RGB first.
    """
    if from_tanh_range:
        x = (x + 1.0) * 0.5
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    feats = []
    conv_count = 0
    slice_ends = set(_SLICE_ENDS)
    h = x
    for spec in params["convs"]:
        if spec == "M":
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        h = jax.nn.relu(nn_core.conv2d(spec, h, padding=1))
        conv_count += 1
        if conv_count in slice_ends:
            feats.append(h)
        if len(feats) == len(_SLICE_ENDS) and conv_count >= max(_SLICE_ENDS):
            break
    return feats


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Batch-mean per-sample Gram matrix, [C, C].

    Intended-behaviour divergence from the reference (losses.py:202-210),
    per this repo's documented-bugs policy: the reference flattens NCHW to
    [b*c, h*w] and grams THAT, so for batch > 1 the matrix carries
    cross-batch blocks - an artifact of lifting the b=1 neural-style
    tutorial code to batches, not a style statistic (sample A's channels
    correlated with sample B's carry no information about either image's
    style).  This [C, C] form equals (1/b) * sum_b gram_b / (c*h*w): the
    per-sample statistic the b=1 reference computes, averaged over the
    batch, and identical to the reference at b=1."""
    b, h, w, c = feat.shape
    f = feat.reshape(b * h * w, c)
    g = jnp.einsum("nc,nd->cd", f, f)
    return g / (b * c * h * w)


def vgg_style_loss(
    vgg_params: Params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
    style_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
    style: bool = True,
    microbatch: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perceptual (per-slice L1) + style (gram MSE x 3e7) losses
    (losses.py:164-220); y is treated as the detached target.

    microbatch=m bounds the VGG tower's activation memory to one m-sample
    chunk: the batch is scanned in chunks with the tower REMATERIALISED
    per chunk (jax.checkpoint inside lax.scan).  The tower carries no
    trainable params, so its activations are pure backward-pass ballast -
    this is what lets the 512^2 production recipe (B=16/chip) afford a
    perceptual loss at all (B=16 with the unchunked tower OOMs at 17.97G
    vs 15.75G HBM).  Losses are numerically equivalent to the unchunked
    form: per-slice L1 means and batch-mean grams both decompose into
    equal-chunk means (tests/test_losses_vgg.py)."""
    if microbatch is None or x.shape[0] <= microbatch:
        fx = vgg19_features(vgg_params, x)
        fy = vgg19_features(vgg_params, jax.lax.stop_gradient(y))
        p_loss = 0.0
        s_loss = 0.0
        for i in range(len(fx)):
            p_loss = p_loss + weights[i] * jnp.mean(jnp.abs(fx[i] - fy[i]))
            if style:
                gx, gy = gram_matrix(fx[i]), gram_matrix(fy[i])
                s_loss = s_loss + style_weights[i] * jnp.mean((gx - gy) ** 2) * 3e7
        return p_loss, s_loss

    b = x.shape[0]
    if b % microbatch:
        raise ValueError(
            f"vgg microbatch {microbatch} must divide the batch ({b})")
    n = b // microbatch
    xs = x.reshape(n, microbatch, *x.shape[1:])
    ys = jax.lax.stop_gradient(y).reshape(n, microbatch, *y.shape[1:])
    conv_specs = [s for s in vgg_params["convs"] if not isinstance(s, str)]
    tap_ch = [int(conv_specs[e - 1]["w"].shape[-1]) for e in _SLICE_ENDS]
    nslices = len(_SLICE_ENDS)

    @jax.checkpoint
    def chunk_stats(xc, yc):
        fx = vgg19_features(vgg_params, xc)
        fy = vgg19_features(vgg_params, yc)
        p = jnp.zeros(())
        gx = []
        gy = []
        for i in range(nslices):
            p = p + weights[i] * jnp.mean(jnp.abs(fx[i] - fy[i]))
            if style:
                gx.append(gram_matrix(fx[i]))
                gy.append(gram_matrix(fy[i]))
        return p, gx, gy

    def body(carry, xy):
        p_sum, gx_sum, gy_sum = carry
        p, gx, gy = chunk_stats(*xy)
        if style:
            gx_sum = [a + g for a, g in zip(gx_sum, gx)]
            gy_sum = [a + g for a, g in zip(gy_sum, gy)]
        return (p_sum + p, gx_sum, gy_sum), None

    zeros = [jnp.zeros((c, c), x.dtype) for c in tap_ch]
    (p_sum, gx_sum, gy_sum), _ = jax.lax.scan(
        body, (jnp.zeros((), x.dtype), zeros, [z for z in zeros]), (xs, ys))
    p_loss = p_sum / n
    s_loss = jnp.zeros(())
    if style:
        for i in range(nslices):
            s_loss = s_loss + style_weights[i] * jnp.mean(
                (gx_sum[i] / n - gy_sum[i] / n) ** 2) * 3e7
    return p_loss, s_loss

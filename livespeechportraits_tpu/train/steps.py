"""The three training drivers the reference implies but does not ship
(SURVEY.md §3.2-3.3: there is no train.py in the repo; the steps are
reconstructed from each model's optimize_parameters).

Each factory returns ONE jitted, pjit-compatible step function
`(state, batch, rng) -> (state, metrics)`: pure pytree-in/pytree-out, so
running data-parallel is just placing the batch with a `data`-sharded
NamedSharding (parallel/mesh.py) - the gradient all-reduce is inserted by
XLA, no DataParallel wrapper, no dummy-batch padding
(models/__init__.py:116-140 made obsolete by global-batch sharding).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from livespeechportraits_tpu.config import (
    APCConfig,
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
)
from livespeechportraits_tpu.models import (
    apc as apc_model,
    audio2feature as a2f,
    audio2headpose as a2h,
    feature2face as f2f,
    losses,
)
from livespeechportraits_tpu.ops import gmm
from livespeechportraits_tpu.train.state import TrainState, apply_updates_with_bn


# ---------------------------------------------------------------------------
# Host-link batch diet (the reference loads candidates once per subject,
# face_dataset.py:119-129, and reads uint8 jpgs, face_dataset.py:190-193;
# shipping per-sample f32 copies across a thin host link is pure waste).
# Batches may carry cand_image with leading dim 1 (uploaded once,
# device-cached) and tgt_image as uint8; both are expanded ON DEVICE
# inside the jitted step, where the broadcast is free and the normalise
# fuses into the first consumer.
# ---------------------------------------------------------------------------


def f2f_g_input(batch) -> jnp.ndarray:
    """Generator input [B, H, W, 13]: feature_map ++ candidates, with the
    shared [1, H, W, 12] candidate tensor broadcast to the batch."""
    fmap = batch["feature_map"]
    cand = batch["cand_image"]
    if cand.shape[0] != fmap.shape[0]:
        cand = jnp.broadcast_to(cand, (fmap.shape[0],) + tuple(cand.shape[1:]))
    return jnp.concatenate([fmap, cand.astype(fmap.dtype)], axis=-1)


def f2f_target(batch) -> jnp.ndarray:
    """Target frame in [-1, 1] f32; uint8 batches (4x cheaper transfer)
    are normalised here with the exact host expression ((x/255)-.5)/.5."""
    tgt = batch["tgt_image"]
    if tgt.dtype == jnp.uint8:
        tgt = (tgt.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return tgt


# ---------------------------------------------------------------------------
# APC pretraining: L1 future-frame prediction.  The reference loads a
# frozen pretrained encoder (demo.py:145-160) but ships no way to make
# one; this step reproduces the upstream objective so the audio
# front-end is trainable from raw speech in-framework.
# ---------------------------------------------------------------------------


def _apc_loss(cfg: APCConfig, preds, mels):
    n = cfg.time_shift
    return jnp.mean(jnp.abs(preds[:, :-n] - mels[:, n:]))


def make_apc_step(cfg: APCConfig, tx: optax.GradientTransformation,
                  donate: bool = True):
    def loss_fn(params, batch):
        preds = apc_model.apply_apc_pretrain(params, batch["mels"],
                                             residual=cfg.residual)
        return _apc_loss(cfg, preds, batch["mels"])

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        return new_state, {"loss": loss}

    return step


def apc_validate(cfg: APCConfig):
    @jax.jit
    def validate(params, batch):
        preds = apc_model.apply_apc_pretrain(params, batch["mels"],
                                             residual=cfg.residual)
        return _apc_loss(cfg, preds, batch["mels"])

    return validate


# ---------------------------------------------------------------------------
# Audio2Feature: MSE x 1000 with frame_future shift
# (audio2feature_model.py:88-93, 102-107)
# ---------------------------------------------------------------------------


def _a2f_loss(cfg: Audio2FeatureConfig, preds, target):
    """Frame-future-shifted A2F loss: MSE x 1000 (audio2feature_model.py:
    88-93) or the intended GMM NLL (the reference's GMM option is broken
    as shipped, audio2feature_model.py:85; config.py documents the
    runnable rebuild)."""
    ff = cfg.frame_future
    if ff > 0:
        preds, target = preds[:, ff:], target[:, :-ff]
    if cfg.loss == "GMM":
        return gmm.gmm_log_loss(preds, target, cfg.gmm_ncenter,
                                cfg.output_dim, cfg.gmm_sigma_min)
    return jnp.mean((preds - target) ** 2) * 1000.0


def _batch_audio(batch, audio_bank, audio_rows: Optional[int],
                 fold_pairs: bool):
    """Resolve the batch's audio windows - either shipped from the host
    (batch["audio"]) or gathered ON DEVICE from a resident feature bank
    (batch["audio_start"] scalar row indices; the host-link diet for the
    motion trainers, see AudioVisualSampler(device_audio=True)).  The
    gather is a vmapped fixed-length dynamic_slice - bitwise the same
    rows the host would have sliced.  fold_pairs reshapes the 2-rows-
    per-frame layout to [B, L, 2F] (the a2h window layout)."""
    if audio_bank is None or "audio_start" not in batch:
        return batch["audio"]
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(audio_bank, s, audio_rows, 0)
    )(batch["audio_start"])
    if fold_pairs:
        win = win.reshape(win.shape[0], audio_rows // 2, -1)
    return win


def make_a2f_step(cfg: Audio2FeatureConfig, tx: optax.GradientTransformation,
                  donate: bool = True, audio_bank=None,
                  audio_rows: Optional[int] = None):
    def loss_fn(params, batch):
        audio = _batch_audio(batch, audio_bank, audio_rows, fold_pairs=False)
        preds, aux = a2f.apply_audio2feature(params, audio, training=True)
        loss = _a2f_loss(cfg, preds, batch["target"])
        return loss, aux

    # donate: update params + Adam moments in place instead of
    # double-buffering the full state tree in HBM each step.  Callers
    # reassign `state = step(state, ...)`; pass donate=False to keep the
    # input state alive (e.g. equivalence tests stepping one state twice).
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_state = apply_updates_with_bn(state, grads, aux, tx)
        return new_state, {"loss": loss}

    return step


def a2f_validate(cfg: Audio2FeatureConfig, audio_bank=None,
                 audio_rows: Optional[int] = None):
    @jax.jit
    def validate(params, batch):
        audio = _batch_audio(batch, audio_bank, audio_rows, fold_pairs=False)
        preds, _ = a2f.apply_audio2feature(params, audio, training=False)
        return _a2f_loss(cfg, preds, batch["target"])

    return validate


# ---------------------------------------------------------------------------
# Audio2Headpose: GMM NLL (+ optional smoothness term)
# (audio2headpose_model.py:93-123)
# ---------------------------------------------------------------------------


def a2h_validate(cfg: Audio2HeadposeConfig, audio_bank=None,
                 audio_rows: Optional[int] = None):
    """Validation GMM NLL, eval mode (the reference's A2H model defines no
    validate_epoch; the A2F cadence of audio2feature_model.py:110-114 is
    applied uniformly as the intended behaviour)."""

    @jax.jit
    def validate(params, batch):
        audio = _batch_audio(batch, audio_bank, audio_rows, fold_pairs=True)
        preds, _ = a2h.apply_audio2headpose(
            params, cfg, batch["history"], audio,
            output_length=batch["target"].shape[1], training=False,
        )
        return gmm.gmm_log_loss(preds, batch["target"], cfg.ncenter, cfg.ndim,
                                cfg.sigma_min)

    return validate


def make_a2h_step(cfg: Audio2HeadposeConfig, tx: optax.GradientTransformation,
                  smooth_loss_weight: float = 0.0, donate: bool = True,
                  audio_bank=None, audio_rows: Optional[int] = None):
    def loss_fn(params, batch, rng):
        history, target = batch["history"], batch["target"]
        audio = _batch_audio(batch, audio_bank, audio_rows, fold_pairs=True)
        preds, aux = a2h.apply_audio2headpose(
            params, cfg, history, audio,
            output_length=target.shape[1], training=True, dropout_rng=rng,
        )
        loss = gmm.gmm_log_loss(preds, target, cfg.ncenter, cfg.ndim, cfg.sigma_min)
        metrics = {"gmm_nll": loss}
        if smooth_loss_weight > 0:
            # Sample_GMM with sigma_scale=0 returns component means; for the
            # single-center default this is just the mu block.
            mu = preds[..., cfg.ncenter : cfg.ncenter + cfg.ncenter * cfg.ndim]
            mu = mu.reshape(preds.shape[0], preds.shape[1], cfg.ncenter, cfg.ndim)[:, :, 0]
            smooth = jnp.abs(
                (mu[:, 2:] + target[:, :-2] - 2.0 * target[:, 1:-1]).mean(axis=2)
            ).mean()
            metrics["smooth"] = smooth
            loss = loss + smooth_loss_weight * smooth
        metrics["loss"] = loss
        return loss, (aux, metrics)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (_, (aux, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = apply_updates_with_bn(state, grads, aux, tx)
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Feature2Face: LSGAN + L1 + VGG/Style + FM, alternating D and G
# (feature2face_model.py:120-222)
# ---------------------------------------------------------------------------



def _remat_wrap(fn, remat, num_downs: int):
    """Apply the requested rematerialisation mode to a generator forward.

    remat=False: save everything.  remat=True: full jax.checkpoint
    (recompute the whole forward in the backward).  remat=int K >= 1:
    SELECTIVE - save only the stage-boundary activations tagged
    "down{d}"/"up{d}" (feature2face._resunet_stage checkpoint_name) for
    depths d >= K, i.e. rematerialise just the outermost K
    high-resolution stages.  At 512^2 those stages hold the overwhelming
    share of activation bytes (512^2/256^2 x 64ch tensors) but a small
    share of FLOPs, so selective remat frees the memory that forces XLA
    into spill copies (see tools/trace_train.py) at a fraction of full
    remat's recompute cost."""
    if remat is True:
        return jax.checkpoint(fn)
    if remat:
        names = [f"{k}{d}" for d in range(int(remat), num_downs)
                 for k in ("down", "up")]
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(*names))
    return fn


def make_f2f_steps(
    cfg: Feature2FaceConfig,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    vgg_params: Optional[Any] = None,
    compute_dtype=None,
    remat: bool = False,
    donate: bool = True,
    qat_d: bool = False,
    vgg_microbatch: Optional[int] = None,
):
    """Returns (d_step, g_step).

    qat_d=True runs the discriminator's interior convs on the real int8
    MXU kernel with straight-through gradients (f2f.qat_discriminator,
    applied inside the step so checkpoints stay tag-free) - a pure
    training-FLOPs lever; D never deploys.

    batch: feature_map [B,H,W,1], cand_image [B|1,H,W,12] (leading dim 1
    = shared subject candidates, broadcast on device), tgt_image
    [B,H,W,3] f32 or uint8 (normalised on device; see f2f_g_input /
    f2f_target) - NHWC, the FaceDataset sampler provides this layout.
    Generator TrainState.params holds the *net* subtree only (the `size`
    tag is static here).  The reference's fp16 GradScaler dance is
    unnecessary: bf16 on TPU keeps fp32 range.

    remat=True rematerialises the generator forward in the backward pass
    (jax.checkpoint) - trades ~1/3 more FLOPs for activation memory, the
    lever for 512^2 training at larger per-chip batches.  remat=int K
    rematerialises only the outermost K stages (_remat_wrap) - most of
    the memory at a fraction of the recompute.

    Note on batch-norm semantics under data parallelism: with a
    `data`-sharded global batch, GSPMD computes GLOBAL batch statistics
    (sync-BN).  torch DataParallel computes per-replica statistics; sync-BN
    is the strictly better-behaved variant, documented as an intended
    divergence.
    """
    gan_mode = cfg.gan_mode
    size = cfg.size

    def d_of(d_params):
        return f2f.qat_discriminator(d_params) if qat_d else d_params

    def g_forward(g_net, batch, training):
        """g_net is the generator's `net` subtree (no metadata leaves -
        the `size` string stays static via this closure)."""
        inp = f2f_g_input(batch)

        def fwd(net, x):
            fake, aux = f2f.apply_generator({"net": net, "size": size}, x,
                                            training=training,
                                            compute_dtype=compute_dtype)
            return fake, aux["net"]

        fwd = _remat_wrap(fwd, remat, cfg.n_downsample)
        fake, aux_net = fwd(g_net, inp)
        return inp, fake, aux_net

    def d_loss_fn(d_params, g_net, batch):
        inp, fake, _ = g_forward(g_net, batch, training=False)
        real_pair = jnp.concatenate([inp, f2f_target(batch)], axis=-1)
        fake_pair = jnp.concatenate([inp, jax.lax.stop_gradient(fake)], axis=-1)
        pred_real, aux_d = f2f.apply_discriminator(d_of(d_params), real_pair,
                                                   training=True)
        pred_fake, _ = f2f.apply_discriminator(d_of(d_params), fake_pair,
                                               training=True)
        # real x2 weighting (feature2face_model.py:166-171)
        loss_real = losses.gan_loss(pred_real, True, gan_mode) * 2.0
        loss_fake = losses.gan_loss(pred_fake, False, gan_mode)
        loss = (loss_real + loss_fake) * 0.5
        return loss, (aux_d, {"D_real": loss_real, "D_fake": loss_fake, "loss_D": loss})

    def g_loss_fn(g_net, d_params, batch):
        inp, fake, aux_g = g_forward(g_net, batch, training=True)
        tgt = f2f_target(batch)
        real_pair = jnp.concatenate([inp, tgt], axis=-1)
        fake_pair = jnp.concatenate([inp, fake], axis=-1)
        pred_real, _ = f2f.apply_discriminator(d_of(d_params), real_pair,
                                               training=False)
        pred_fake, _ = f2f.apply_discriminator(d_of(d_params), fake_pair,
                                               training=False)

        loss_gan = losses.gan_loss(pred_fake, True, gan_mode, for_discriminator=False)
        loss_l1 = jnp.mean(jnp.abs(fake - tgt)) * cfg.lambda_L1
        if vgg_params is not None:
            p_loss, s_loss = losses.vgg_style_loss(
                vgg_params, fake, tgt,
                microbatch=vgg_microbatch)
            loss_vgg = p_loss * cfg.lambda_feat
            loss_style = s_loss * cfg.lambda_feat
        else:
            loss_vgg = jnp.zeros(())
            loss_style = jnp.zeros(())
        loss_fm = losses.feature_matching_loss(
            pred_fake, pred_real, cfg.num_D, cfg.n_layers_D, cfg.lambda_feat
        )
        loss = loss_gan + loss_l1 + loss_vgg + loss_style + loss_fm
        metrics = {"loss_G_GAN": loss_gan, "L1": loss_l1, "VGG": loss_vgg,
                   "Style": loss_style, "loss_G_FM": loss_fm, "loss_G": loss}
        return loss, (aux_g, metrics)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def d_step(d_state: TrainState, g_net, batch):
        """g_net: the generator TrainState's params (its `net` subtree)."""
        (_, (aux_d, metrics)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params, g_net, batch
        )
        new_state = apply_updates_with_bn(d_state, grads, aux_d, tx_d)
        return new_state, metrics

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def g_step(g_state: TrainState, d_params, batch):
        (_, (aux_g, metrics)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, d_params, batch
        )
        new_state = apply_updates_with_bn(g_state, grads, aux_g, tx_g)
        return new_state, metrics

    return d_step, g_step


def make_f2f_fused_step(
    cfg: Feature2FaceConfig,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    vgg_params: Optional[Any] = None,
    compute_dtype=None,
    remat: bool = False,
    donate: bool = True,
    qat_d: bool = False,
    vgg_microbatch: Optional[int] = None,
    remat_d: bool = False,
):
    """One-program GAN step updating D and G together, sharing every
    forward tower via explicit `jax.vjp` pullbacks.

    The alternating `make_f2f_steps` pair runs the 512^2 generator forward
    twice per iteration (once inside d_step to produce the fake, once
    inside g_step) and the multiscale discriminator four times; the
    reference itself computes `self.fake_pred` ONCE in train mode and
    reuses it for both backward_D and backward_G
    (feature2face_model.py:120-124, 160-190).  This step restores that
    one-forward structure under jit: primal cost per iteration is
    1x G forward + 2x D forward (real/fake pairs), with the D-fake tower
    pulled back twice (toward d_params for the D loss, toward its input
    for the G loss) - exactly the backward count of the alternating pair.

    Intended divergences (documented, matching the reference more closely
    than the alternating pair in the first two):
    - the shared forwards run training=True, so the G-side GAN/FM terms
      see batch-stat BN features (the reference keeps netD in train mode
      for backward_G too);
    - G's gradient sees the PRE-update discriminator (simultaneous
      gradient descent) instead of the just-stepped one;
    - like d_step, BN running stats for D are taken from the real-pair
      forward only.
    """
    gan_mode = cfg.gan_mode
    size = cfg.size

    def g_fwd(g_net, inp):
        fake, aux = f2f.apply_generator({"net": g_net, "size": size}, inp,
                                        training=True,
                                        compute_dtype=compute_dtype)
        return fake, aux["net"]

    g_fwd = _remat_wrap(g_fwd, remat, cfg.n_downsample)

    def _tree_add(a, b):
        return jax.tree_util.tree_map(jnp.add, a, b)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def gan_step(g_state: TrainState, d_state: TrainState, batch):
        inp = f2f_g_input(batch)
        tgt = f2f_target(batch)

        # --- shared primal towers (linearised once each) ---
        fake, g_pull, aux_g = jax.vjp(lambda gn: g_fwd(gn, inp),
                                      g_state.params, has_aux=True)
        real_pair = jnp.concatenate([inp, tgt], axis=-1)
        fake_pair = jnp.concatenate([inp, fake], axis=-1)

        def d_apply(dp, x):
            # qat_d: interior D convs on the int8 MXU kernel, STE grads;
            # tags are added inside the traced step, so the cotangents and
            # checkpoints keep the untagged float structure
            if qat_d:
                dp = f2f.qat_discriminator(dp)
            feats, new_p = f2f.apply_discriminator(dp, x, training=True)
            return feats, new_p

        if remat_d:
            # Rematerialise the D towers in their pullbacks: D holds a
            # small share of the step's FLOPs but its multiscale
            # activations add to the liveness peak that drives XLA's
            # memory-pressure spill copies (tools/trace_train.py, ~11%
            # of the B=16 step).  Recompute cost is bounded by 3 extra
            # D forwards (the fake tower is pulled back twice).
            d_apply = jax.checkpoint(d_apply)

        pred_real, real_pull, aux_d = jax.vjp(
            lambda dp: d_apply(dp, real_pair), d_state.params, has_aux=True)
        pred_fake, fake_pull, _ = jax.vjp(d_apply, d_state.params, fake_pair,
                                          has_aux=True)

        # --- D loss: cotangents on the two prediction pytrees, pulled back
        # toward d_params only (feature2face_model.py:160-178 semantics,
        # real x2 weighting) ---
        def d_loss_of(pr, pf):
            loss_real = losses.gan_loss(pr, True, gan_mode) * 2.0
            loss_fake = losses.gan_loss(pf, False, gan_mode)
            loss = (loss_real + loss_fake) * 0.5
            return loss, (loss_real, loss_fake)

        (loss_d, (d_real, d_fake)), (c_pr, c_pf_d) = jax.value_and_grad(
            d_loss_of, argnums=(0, 1), has_aux=True)(pred_real, pred_fake)
        d_grads = _tree_add(real_pull(c_pr)[0], fake_pull(c_pf_d)[0])

        # --- G loss: cotangents w.r.t. (fake, pred_fake); the pred_fake
        # cotangent flows back through the D-fake tower into its INPUT
        # (the d_params half of that pullback is discarded, as jax.grad
        # w.r.t. g_net alone would), then joins the direct fake cotangent
        # before the single generator pullback ---
        def g_loss_of(fake_, pf):
            loss_gan = losses.gan_loss(pf, True, gan_mode,
                                       for_discriminator=False)
            loss_l1 = jnp.mean(jnp.abs(fake_ - tgt)) * cfg.lambda_L1
            if vgg_params is not None:
                p_loss, s_loss = losses.vgg_style_loss(
                    vgg_params, fake_, tgt, microbatch=vgg_microbatch)
                loss_vgg = p_loss * cfg.lambda_feat
                loss_style = s_loss * cfg.lambda_feat
            else:
                loss_vgg = jnp.zeros(())
                loss_style = jnp.zeros(())
            loss_fm = losses.feature_matching_loss(
                pf, pred_real, cfg.num_D, cfg.n_layers_D, cfg.lambda_feat)
            loss = loss_gan + loss_l1 + loss_vgg + loss_style + loss_fm
            return loss, {"loss_G_GAN": loss_gan, "L1": loss_l1,
                          "VGG": loss_vgg, "Style": loss_style,
                          "loss_G_FM": loss_fm, "loss_G": loss}

        (_, g_metrics), (c_fake, c_pf_g) = jax.value_and_grad(
            g_loss_of, argnums=(0, 1), has_aux=True)(fake, pred_fake)
        c_fake_pair = fake_pull(c_pf_g)[1]
        n_in = inp.shape[-1]
        g_grads = g_pull(c_fake + c_fake_pair[..., n_in:])[0]

        new_d = apply_updates_with_bn(d_state, d_grads, aux_d, tx_d)
        new_g = apply_updates_with_bn(g_state, g_grads, aux_g, tx_g)
        metrics = dict(g_metrics, D_real=d_real, D_fake=d_fake, loss_D=loss_d)
        return new_g, new_d, metrics

    return gan_step


def f2f_validate(cfg: Feature2FaceConfig, compute_dtype=None):
    """Eval-mode generator forward returning the synthesized frame plus
    fidelity scalars (L1, PSNR over the [-1, 1] range).  Doubles as the
    epoch image-panel renderer (get_current_visuals parity,
    feature2face_model.py:228-241 / visualizer.py:61-97)."""
    size = cfg.size

    @jax.jit
    def validate(g_net, batch):
        inp = f2f_g_input(batch)
        fake, _ = f2f.apply_generator({"net": g_net, "size": size}, inp,
                                      training=False, compute_dtype=compute_dtype)
        fake = fake.astype(jnp.float32)
        err = fake - f2f_target(batch)
        l1 = jnp.mean(jnp.abs(err))
        mse = jnp.mean(err ** 2)
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))
        return fake, {"val_L1": l1, "val_PSNR": psnr}

    return validate


def ttur_learning_rates(lr: float, ttur: bool, beta1: float = 0.5):
    """(lr_G, betas_G), (lr_D, betas_D) per feature2face_model.py:45-56/63-78."""
    if ttur:
        return (lr / 2, (0.0, 0.9)), (lr * 2, (0.0, 0.9))
    return (lr, (beta1, 0.999)), (lr, (beta1, 0.999))

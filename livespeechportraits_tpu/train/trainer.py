"""Training orchestration: the train.py the reference never shipped.

Drives the three stages (audio2feature / audio2headpose / feature2face)
with the loops reconstructed from the reference's model classes and the
orphaned helpers models/__init__.py:74-104 (save_latest_freq + per-epoch
checkpointing, LR decay after n_epochs, validation cadence) - epochs over
a host-side sampler, one pjit'd device step per batch, orbax checkpoints,
Visualizer scalar/loss logging, linear LR schedule with resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np
import optax

from livespeechportraits_tpu.config import (
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
)
from livespeechportraits_tpu.models import (
    audio2feature as a2f_model,
    audio2headpose as a2h_model,
    feature2face as f2f_model,
)
from livespeechportraits_tpu.parallel import mesh as mesh_mod
from livespeechportraits_tpu.train import prefetch as prefetch_mod
from livespeechportraits_tpu.train import schedulers, state as state_mod, steps
from livespeechportraits_tpu.utils import checkpoint as ckpt
from livespeechportraits_tpu.utils.visualizer import Visualizer


@dataclass
class TrainLoopConfig:
    n_epochs: int = 10
    n_epochs_decay: int = 10
    lr: float = 1e-4
    lr_policy: str = "linear"
    batch_size: int = 32
    print_freq: int = 10
    save_epoch_freq: int = 1
    validate_epoch: int = 1
    seed: int = 0
    checkpoints_dir: str = "./checkpoints"
    name: str = "experiment"
    continue_train: bool = False
    smooth_loss: float = 0.0
    ttur: bool = False
    data_parallel: bool = False  # shard batches over a (data,) mesh
    prefetch: int = 2  # background batch queue depth (0 = synchronous)
    display_epoch_freq: int = 1  # GAN epoch image-panel cadence (0 = off)
    remat: bool = False  # rematerialise the G forward in backward (512^2 memory lever)
    fused_step: bool = False  # one-program GAN step (shared forward towers)
    qat: bool = False  # quantization-aware G: train against the int8 arithmetic
    qat_int8: bool = False  # QAT forward on the real int8 MXU kernel (implies qat)
    qat_d: bool = False  # D's interior convs on the int8 kernel (training-FLOPs lever)
    zero1: bool = False  # partition optimizer state over the data axis (ZeRO-1)
    vgg_microbatch: int = 0  # chunk+remat the VGG loss tower (0 = unchunked);
    # what lets the B=16 512^2 production recipe afford a perceptual loss
    save_best: bool = True  # additionally keep <name>/ckpt_best = the
    # lowest-validation epoch (single-state trainers).  The reference
    # only keeps latest_/epoch saves (models/__init__.py:74-104), so a
    # decay schedule can end past the val optimum and serve a worse
    # model; loaders prefer ckpt_best when present.


def _maybe_zero1(st, mesh, loop: "TrainLoopConfig"):
    """Apply the ZeRO-1 optimizer-state placement (mesh.zero1_place) when
    requested - called after creation AND after checkpoint restore, since
    a restore re-materialises the state with default placement
    (zero1_place is idempotent, so an already-partitioned state passes
    through unchanged)."""
    if loop.zero1 and mesh is None:
        raise ValueError(
            "zero1 partitions optimizer state over the data axis and "
            "needs data_parallel=True (no mesh was built)")
    if mesh is not None and loop.zero1:
        st = st._replace(opt_state=mesh_mod.zero1_place(mesh, st.opt_state))
    return st


def _device_rasterize_batch(batch):
    """Materialise the feature_map on DEVICE from raw landmark/shoulder
    coords (FaceFrameSampler(device_rasterize=True)): the whole batch is
    rasterised with the same kernel the inference pipeline uses, so the
    host never draws a 512^2 edge map and train-time inputs are
    pixel-identical to serve-time ones."""
    from livespeechportraits_tpu.ops import rasterize, rasterize_pallas

    if "landmarks" not in batch:
        return batch
    batch = dict(batch)
    lm = batch.pop("landmarks")
    sh = batch.pop("shoulders")
    H, W = batch["tgt_image"].shape[1:3]
    fn = (rasterize_pallas.rasterize_feature_maps_pallas
          if rasterize_pallas.supports_pallas()
          else rasterize.rasterize_feature_maps)
    batch["feature_map"] = _jit_rasterize(fn, lm, sh, (H, W))
    return batch


def _jit_rasterize(fn, lm, sh, size):
    key = (fn, size)
    cached = _jit_rasterize._cache.get(key)
    if cached is None:
        cached = jax.jit(lambda a, b: fn(a, b, size)[..., None])
        _jit_rasterize._cache[key] = cached
    return cached(lm, sh)


_jit_rasterize._cache = {}


_shared_cand_cache = {}  # (id, mesh id) -> (host array ref, device array)


def _place_batch(batch, mesh):
    """Host->device placement with the shared-candidate diet: a
    cand_image with leading dim 1 is the per-subject candidate tensor
    (identical every batch - face_dataset.py:119-129 loads it once per
    subject), so it is uploaded ONCE per process and the cached device
    copy is reused; everything else ships per batch.  Under a mesh the
    cached copy is replicated (steps broadcast it to the sharded batch
    on device)."""
    place = (lambda b: mesh_mod.shard_batch(mesh, b)) if mesh is not None \
        else jax.device_put
    c = batch.get("cand_image") if isinstance(batch, dict) else None
    if isinstance(c, np.ndarray) and c.ndim == 4 and c.shape[0] == 1:
        # identity = the underlying buffer, not the view: samplers emit a
        # fresh [None] view of the same candidate array every batch, and
        # keying on the view would re-upload AND retain a device copy per
        # batch (~12.6 MB each at 512^2 - an HBM leak that OOMed a 140-step
        # campaign before it was keyed this way)
        base = c.base if isinstance(c.base, np.ndarray) else c
        key = (id(base), id(mesh) if mesh is not None else None)
        ent = _shared_cand_cache.get(key)
        if ent is None or ent[0] is not base:  # id() reuse after GC: re-place
            dev = jax.device_put(
                c, mesh_mod.replicated(mesh)) if mesh is not None \
                else jax.device_put(c)
            ent = (base, dev)
            _shared_cand_cache[key] = ent
        batch = {k: v for k, v in batch.items() if k != "cand_image"}
        batch = place(batch)
        batch["cand_image"] = ent[1]
        return batch
    return place(batch)


def _batch_iter(sampler, loop: "TrainLoopConfig", rng, mesh):
    """Epoch batch stream with host sampling + host->device transfer
    pipelined behind device compute (train/prefetch.py; the transform runs
    in the worker thread so the transfer overlaps the previous step)."""
    it = sampler.batches(loop.batch_size, rng)
    transform = lambda b: _device_rasterize_batch(_place_batch(b, mesh))  # noqa: E731
    if loop.prefetch > 0:
        return prefetch_mod.prefetch(it, loop.prefetch, transform)
    return map(transform, it)


def _device_audio_bank(sampler, mesh):
    """Place a sampler's resident audio feature bank on device once
    (replicated under a mesh) - the motion-trainer host-link diet: steps
    gather their windows from this bank instead of receiving ~MBs of
    feature rows per batch (AudioVisualSampler(device_audio=True))."""
    bank = getattr(sampler, "audio_bank", None) if sampler is not None else None
    if bank is None:
        return None, None
    dev = mesh_mod.replicate(mesh, bank) if mesh is not None \
        else jax.device_put(bank)
    return dev, sampler.audio_rows


def _train_single_state(loop: TrainLoopConfig, sampler, val_sampler,
                        init_params, *, init_fn, make_step, validate_fn,
                        val_key: str, step_rng: bool = False
                        ) -> state_mod.TrainState:
    """Shared driver for the three single-state trainers (APC / A2F /
    A2H): schedule + Adam, optional DP mesh + ZeRO-1, resume, epoch loop
    with prefetched batches, scalar logging, dedicated-rng validation,
    per-epoch checkpoints.  The public train_* wrappers differ only in
    the init/step factories, the validation metric name, and whether the
    step threads a PRNG key (A2H's WaveNet input dropout)."""
    schedule = schedulers.make_schedule(loop.lr_policy, loop.lr, loop.n_epochs,
                                        loop.n_epochs_decay)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.99)
    )(learning_rate=loop.lr)
    params = init_params if init_params is not None else \
        init_fn(jax.random.PRNGKey(loop.seed))
    mesh = mesh_mod.make_mesh(1) if loop.data_parallel else None
    if mesh is not None:
        params = mesh_mod.replicate(mesh, params)
    st = state_mod.create_state(params, tx)
    train_bank, train_rows = _device_audio_bank(sampler, mesh)
    step_fn = make_step(tx, train_bank, train_rows)
    val_bank, val_rows = _device_audio_bank(val_sampler, mesh)
    validate_fn = validate_fn(val_bank, val_rows)
    vis = Visualizer(loop.checkpoints_dir, loop.name)
    ckpt_dir = f"{loop.checkpoints_dir}/{loop.name}/ckpt"
    start_epoch = 0
    if loop.continue_train and ckpt.latest_step(ckpt_dir) is not None:
        start_epoch = ckpt.latest_step(ckpt_dir)
        st = ckpt.restore_checkpoint(ckpt_dir, start_epoch, template=st)
        print(f"resumed from epoch {start_epoch}")

    st = _maybe_zero1(st, mesh, loop)
    rng = np.random.default_rng(loop.seed)
    key = jax.random.PRNGKey(loop.seed)
    it = 0
    best_val = None  # best-so-far validation mean (resume restarts it:
    # the first post-resume validation re-seeds the tracker)
    for epoch in range(start_epoch, loop.n_epochs + loop.n_epochs_decay):
        lr_now = schedule(epoch)
        st = _set_lr(st, lr_now)
        t0 = time.time()
        epoch_it0 = it
        for batch in _batch_iter(sampler, loop, rng, mesh):
            if step_rng:
                key, sub = jax.random.split(key)
                st, metrics = step_fn(st, batch, sub)
            else:
                st, metrics = step_fn(st, batch)
            it += 1
            if it % loop.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()} | {"lr": lr_now}
                vis.plot_current_errors(m, it)
                vis.print_current_errors(
                    epoch, it, m,
                    (time.time() - t0) / max(it - epoch_it0, 1))
        if val_sampler is not None and (epoch + 1) % loop.validate_epoch == 0:
            rng_val = np.random.default_rng(loop.seed + 7919)  # never the
            # training stream's rng: deterministic eval, unchanged batches
            vs = [float(validate_fn(st.params, b))
                  for b in val_sampler.batches(loop.batch_size, rng_val,
                                               shuffle=False, drop_last=False)]
            if vs:  # a val set smaller than the batch must not log NaN
                val_mean = float(np.mean(vs))
                vis.plot_current_errors({val_key: val_mean}, it)
                if hasattr(schedule, "update"):  # plateau: feed the metric
                    schedule.update(val_mean)
                if loop.save_best and (best_val is None
                                       or val_mean < best_val):
                    best_val = val_mean
                    ckpt.save_checkpoint(f"{ckpt_dir}_best", st, epoch + 1)
        if (epoch + 1) % loop.save_epoch_freq == 0:
            ckpt.save_checkpoint(ckpt_dir, st, epoch + 1)
    vis.close()
    return st


def train_apc(
    cfg,
    loop: TrainLoopConfig,
    sampler,
    val_sampler=None,
    init_params: Optional[Any] = None,
) -> state_mod.TrainState:
    """APC self-supervised pretrainer (L1 future-mel prediction).

    Produces the frozen encoder the reference only ever *loads*
    (demo.py:145-160): checkpoints carry {"encoder", "head"}; serving
    and feature precompute take params["encoder"]
    (assets.load_trained_person_models(apc_ckpt=...), train.py
    --apc_ckpt with an orbax directory)."""
    from livespeechportraits_tpu.models import apc as apc_mod

    return _train_single_state(
        loop, sampler, val_sampler, init_params,
        init_fn=lambda k: apc_mod.init_apc_pretrain(k, cfg),
        make_step=lambda tx, bank, rows: steps.make_apc_step(cfg, tx),
        validate_fn=lambda bank, rows: steps.apc_validate(cfg),
        val_key="val_l1",
    )


def train_audio2feature(
    cfg: Audio2FeatureConfig,
    loop: TrainLoopConfig,
    sampler,
    val_sampler=None,
    init_params: Optional[Any] = None,
) -> state_mod.TrainState:
    """Audio2Feature trainer (per SURVEY.md §3.2)."""
    return _train_single_state(
        loop, sampler, val_sampler, init_params,
        init_fn=lambda k: a2f_model.init_audio2feature(k, cfg),
        make_step=lambda tx, bank, rows: steps.make_a2f_step(
            cfg, tx, audio_bank=bank, audio_rows=rows),
        validate_fn=lambda bank, rows: steps.a2f_validate(
            cfg, audio_bank=bank, audio_rows=rows),
        val_key="val_loss",
    )


def train_audio2headpose(
    cfg: Audio2HeadposeConfig,
    loop: TrainLoopConfig,
    sampler,
    val_sampler=None,
    init_params: Optional[Any] = None,
) -> state_mod.TrainState:
    """Audio2Headpose trainer (GMM NLL + optional smooth term; the step
    threads a PRNG key for WaveNet input dropout)."""
    return _train_single_state(
        loop, sampler, val_sampler, init_params,
        init_fn=lambda k: a2h_model.init_audio2headpose(k, cfg),
        make_step=lambda tx, bank, rows: steps.make_a2h_step(
            cfg, tx, smooth_loss_weight=loop.smooth_loss,
            audio_bank=bank, audio_rows=rows),
        validate_fn=lambda bank, rows: steps.a2h_validate(
            cfg, audio_bank=bank, audio_rows=rows),
        val_key="val_gmm_nll",
        step_rng=True,
    )


def train_feature2face(
    cfg: Feature2FaceConfig,
    loop: TrainLoopConfig,
    sampler,
    val_sampler=None,
    vgg_params: Optional[Any] = None,
    init_g: Optional[Any] = None,
    init_d: Optional[Any] = None,
):
    """Feature2Face GAN trainer (D step then G step per iteration,
    feature2face_model.py:195-222; bf16 compute on TPU).

    Per epoch: optional validation (eval L1/PSNR over val_sampler) and a
    get_current_visuals-style image panel (input feature map | synthesized
    | target, visualizer.py:61-97 parity) rendered from a fixed batch so
    progress is visually comparable across epochs."""
    (lr_g, bg), (lr_d, bd) = steps.ttur_learning_rates(loop.lr, loop.ttur)
    schedule_g = schedulers.make_schedule(loop.lr_policy, lr_g, loop.n_epochs,
                                          loop.n_epochs_decay)
    schedule_d = schedulers.make_schedule(loop.lr_policy, lr_d, loop.n_epochs,
                                          loop.n_epochs_decay)
    tx_g = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=bg[0], b2=bg[1])
    )(learning_rate=lr_g)
    tx_d = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=bd[0], b2=bd[1])
    )(learning_rate=lr_d)

    kg, kd = jax.random.split(jax.random.PRNGKey(loop.seed))
    g = init_g if init_g is not None else f2f_model.init_generator(kg, cfg)
    d = init_d if init_d is not None else f2f_model.init_discriminator(kd, cfg)
    use_qat = loop.qat or loop.qat_int8
    qat_tag = "fq8" if loop.qat_int8 else "fq"
    if use_qat and f2f_model.is_qat_generator(g) and \
            f2f_model.qat_tag_mode(g) != qat_tag:
        # init_g pre-tagged in the OTHER mode: retag to the requested one
        # (fake_quant_conv refuses double tags, so strip first)
        g = f2f_model.qat_generator(f2f_model.strip_qat_generator(g),
                                    int8_forward=loop.qat_int8)
    if use_qat and not f2f_model.is_qat_generator(g):
        # Quantization-aware fine-tuning: G forwards (train, validation,
        # panels) run the deployed int8 arithmetic via STE fake-quant
        # convs (f2f_model.qat_generator; real int8 MXU kernel when
        # qat_int8).  Checkpoints saved by a QAT run carry the tags;
        # resuming keeps them (no double-tagging).
        g = f2f_model.qat_generator(g, int8_forward=loop.qat_int8)
    mesh = mesh_mod.make_mesh(1) if loop.data_parallel else None
    g_net = g["net"]
    if mesh is not None:
        g_net = mesh_mod.replicate(mesh, g_net)
        d = mesh_mod.replicate(mesh, d)
    g_state = state_mod.create_state(g_net, tx_g)
    d_state = state_mod.create_state(d, tx_d)
    compute_dtype = None
    if cfg.precision == "bfloat16":
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    vgg_mb = loop.vgg_microbatch or None
    if loop.fused_step:
        gan_step = steps.make_f2f_fused_step(cfg, tx_g, tx_d, vgg_params,
                                             compute_dtype=compute_dtype,
                                             remat=loop.remat,
                                             qat_d=loop.qat_d,
                                             vgg_microbatch=vgg_mb)
    else:
        d_step, g_step = steps.make_f2f_steps(cfg, tx_g, tx_d, vgg_params,
                                              compute_dtype=compute_dtype,
                                              remat=loop.remat,
                                              qat_d=loop.qat_d,
                                              vgg_microbatch=vgg_mb)
    validate_fn = steps.f2f_validate(cfg, compute_dtype=compute_dtype)

    # Eval-side placement: under a mesh, validation/panel batches are
    # REPLICATED (no batch-divisibility constraint, and mixing a
    # device-0-committed batch with mesh-sharded params would crash the
    # jitted validate with "incompatible devices").
    def _eval_place(b):
        return mesh_mod.replicate(mesh, b) if mesh is not None \
            else jax.device_put(b)

    # Fixed panel batch: same frames every epoch so the HTML gallery shows
    # actual progress, not sampling noise.
    panel_batch = None
    if loop.display_epoch_freq > 0:
        panel_rng = np.random.default_rng(loop.seed + 1)
        panel_batch = next(iter(sampler.batches(
            min(loop.batch_size, 2, len(sampler)), panel_rng, shuffle=False)), None)
        if panel_batch is not None:
            panel_batch = _device_rasterize_batch(_eval_place(panel_batch))

    vis = Visualizer(loop.checkpoints_dir, loop.name)
    ckpt_dir = f"{loop.checkpoints_dir}/{loop.name}/ckpt"
    start_epoch = 0
    if loop.continue_train and ckpt.latest_step(ckpt_dir) is not None:
        start_epoch = ckpt.latest_step(ckpt_dir)
        raw = ckpt.restore_checkpoint(ckpt_dir, start_epoch)  # plain dicts
        ck_mode = f2f_model.qat_tag_mode({"net": raw["G"]["params"]})
        if use_qat and ck_mode is None:
            # Warm-start QAT from a float checkpoint - the natural
            # "fine-tune the converged float model onto the int8 grid"
            # flow: restore through untagged templates, tag the restored
            # params, and start fresh optimizer moments (their treedef
            # changed; a restarted Adam is standard for a new phase).
            g_f = init_g["net"] if init_g is not None else \
                f2f_model.init_generator(kg, cfg)["net"]
            float_tmpl = {"G": state_mod.create_state(g_f, tx_g),
                          "D": d_state}
            restored = ckpt.rebuild(float_tmpl, raw)
            d_state = restored["D"]
            tagged = f2f_model.qat_generator(
                {"net": restored["G"].params, "size": cfg.size},
                int8_forward=loop.qat_int8)
            g_state = state_mod.create_state(tagged["net"], tx_g)
            print(f"QAT warm-start from float checkpoint (epoch "
                  f"{start_epoch}); optimizer moments reset")
        else:
            if ck_mode is not None and not use_qat:
                print("WARNING: checkpoint carries QAT tags but qat=False;"
                      " tags dropped, training continues in float")
            if ck_mode is not None and use_qat and ck_mode != qat_tag:
                # Same float weights, different QAT mode (float emulation
                # vs real int8 forward): the tag is just a renamed unit
                # leaf, so rename it everywhere in the G subtree (params
                # AND optimizer moments share the treedef).
                def _retag(p):
                    if isinstance(p, dict):
                        return {(qat_tag if k in ("fq", "fq8") else k):
                                _retag(v) for k, v in p.items()}
                    if isinstance(p, list):
                        return [_retag(v) for v in p]
                    return p

                raw = dict(raw, G=_retag(raw["G"]))
                print(f"QAT checkpoint retagged {ck_mode} -> {qat_tag}")
            restored = ckpt.rebuild({"G": g_state, "D": d_state}, raw)
            g_state, d_state = restored["G"], restored["D"]

    g_state = _maybe_zero1(g_state, mesh, loop)
    d_state = _maybe_zero1(d_state, mesh, loop)
    rng = np.random.default_rng(loop.seed)
    it = 0
    for epoch in range(start_epoch, loop.n_epochs + loop.n_epochs_decay):
        g_state = _set_lr(g_state, schedule_g(epoch))
        d_state = _set_lr(d_state, schedule_d(epoch))
        t0 = time.time()
        epoch_it0 = it
        for batch in _batch_iter(sampler, loop, rng, mesh):
            if loop.fused_step:
                g_state, d_state, g_metrics = gan_step(g_state, d_state, batch)
                d_metrics = {}
            else:
                d_state, d_metrics = d_step(d_state, g_state.params, batch)
                g_state, g_metrics = g_step(g_state, d_state.params, batch)
            it += 1
            if it % loop.print_freq == 0:
                m = {k: float(v) for k, v in (d_metrics | g_metrics).items()}
                vis.plot_current_errors(m, it)
                vis.print_current_errors(epoch, it, m,
                                         (time.time() - t0) / max(it - epoch_it0, 1))
        if val_sampler is not None and (epoch + 1) % loop.validate_epoch == 0:
            # dedicated rng: evaluation must neither see random train-time
            # augmentation (noisy, non-comparable val metrics) nor advance
            # the training stream's generator (enabling validation would
            # change the next epoch's batch order)
            rng_val = np.random.default_rng(loop.seed + 7919)
            vals = [validate_fn(g_state.params,
                                _device_rasterize_batch(_eval_place(b)))[1]
                    for b in val_sampler.batches(loop.batch_size, rng_val,
                                                 shuffle=False, drop_last=False)]
            if vals:
                vm = {k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]}
                vis.plot_current_errors(vm, it)
                vis.print_current_errors(epoch, it, vm)
                if "val_L1" in vm:  # plateau policies track the G val loss
                    for s in (schedule_g, schedule_d):
                        if hasattr(s, "update"):
                            s.update(vm["val_L1"])
        if panel_batch is not None and (epoch + 1) % loop.display_epoch_freq == 0:
            fake, _ = validate_fn(g_state.params, panel_batch)
            fm = np.asarray(panel_batch["feature_map"][0, ..., 0])
            tgt0 = np.asarray(panel_batch["tgt_image"][0])
            if tgt0.dtype == np.uint8:  # diet batches ship u8 targets
                tgt0 = (tgt0.astype(np.float32) / 255.0 - 0.5) / 0.5
            vis.display_current_results({
                "input_feature_map": np.repeat((fm * 2.0 - 1.0)[..., None], 3, -1),
                "synthesized": np.asarray(fake[0]),
                "target": tgt0,
            }, epoch + 1, it)
        if (epoch + 1) % loop.save_epoch_freq == 0:
            ckpt.save_checkpoint(ckpt_dir, {"G": g_state, "D": d_state}, epoch + 1)
    vis.close()
    return g_state, d_state


def _set_lr(st: state_mod.TrainState, lr: float) -> state_mod.TrainState:
    """Update the injected learning-rate hyperparam in-place (functional)."""
    opt_state = st.opt_state
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr)
    return st

#!/usr/bin/env python
"""512^2 Feature2Face GAN training campaign on the real chip.

Flagship-scale renderer training (512^2 'large' U-Net + multiscale D,
bf16 compute, optional remat) on the structured synthetic subject
(train.synthetic_face_data: targets are a deterministic stylisation of
the landmarks, so falling loss and sharpening epoch panels demonstrate
actual learning, not noise-fitting).  The reference never shipped a
trainer; this is the capability proof for feature2face_model.py:195-222
at production scale.

    python tools/train512.py --steps 400 --batch 4 --vgg random
    python tools/train512.py --steps 120 --batch 4 --vgg none   # ablation arm

Outputs under --checkpoints_dir/<name>/: scalars.csv, loss_log.txt,
epoch image panels (web/images), orbax checkpoints.  Ends with a timed
in-cache step microbenchmark and prints ONE JSON summary line
(step_time_ms, steps_per_s, train_tflops_per_step, mfu).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--size", default="large", choices=["small", "normal", "large"])
    p.add_argument("--vgg", default="random", choices=["none", "random"],
                   help="perceptual/style loss backbone (no pretrained "
                        "weights exist in this zero-egress image; see README)")
    p.add_argument("--vgg_microbatch", type=int, default=0,
                   help="chunk+rematerialise the VGG tower in m-sample "
                        "chunks (0 = unchunked): the memory lever that "
                        "lets B=16 afford a perceptual loss")
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--name", default="train512")
    p.add_argument("--checkpoints_dir", default="/tmp/train512_r2")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--decay", action="store_true",
                   help="reference-style LR schedule: hold for the first "
                        "half of the epochs, linear decay to 0 over the "
                        "second half (feature2face_model.py trains 30+30 "
                        "epochs the same way); default is constant LR")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--remat_depth", type=int, default=0,
                   help="selective remat: recompute only the outermost N "
                        "U-Net stages (steps._remat_wrap); 0 = use the "
                        "--no_remat bool (full remat unless --no_remat)")
    p.add_argument("--fused_step", action="store_true",
                   help="one-program GAN step sharing the G/D forward "
                        "towers (steps.make_f2f_fused_step)")
    p.add_argument("--bench_only", action="store_true",
                   help="skip the training campaign; just compile the step "
                        "on fresh params and run the timed microbenchmark")
    p.add_argument("--device_rasterize", action="store_true",
                   help="rasterise training edge maps on device per batch "
                        "(drops the per-frame host cv2 draw)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: G forwards run the "
                        "deployed int8 arithmetic via STE fake-quant convs; "
                        "the report then compares the deployed int8 model "
                        "against the float A/B arm")
    p.add_argument("--qat_int8", action="store_true",
                   help="QAT with the forward convs on the REAL int8 MXU "
                        "kernel (bit-identical to deployment, STE "
                        "gradients); implies --qat")
    p.add_argument("--qat_d", action="store_true",
                   help="discriminator interior convs on the int8 MXU "
                        "kernel (training-FLOPs lever)")
    args = p.parse_args()

    def _remat_arg(a):
        return a.remat_depth if a.remat_depth else (not a.no_remat)

    import jax

    from livespeechportraits_tpu.utils import compile_cache

    compile_cache.enable()

    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import losses
    from livespeechportraits_tpu.train import trainer

    import train as train_cli

    H = args.image_size
    cfg = Feature2FaceConfig(size=args.size, ngf=64,
                             n_downsample=min(8, int(np.log2(H))),
                             load_size=H, precision="bfloat16")
    sampler = train_cli.synthetic_face_data(
        args.frames, H, device_rasterize=args.device_rasterize)
    steps_per_epoch = len(sampler) // args.batch
    if steps_per_epoch < 1:
        raise SystemExit(f"--batch {args.batch} exceeds --frames "
                         f"{args.frames}: no full batch fits an epoch")
    n_total = max(1, -(-args.steps // steps_per_epoch))
    n_decay = n_total // 2 if args.decay else 0
    n_epochs = n_total - n_decay
    loop = trainer.TrainLoopConfig(
        n_epochs=n_epochs, n_epochs_decay=n_decay, lr=args.lr,
        batch_size=args.batch,
        print_freq=10, checkpoints_dir=args.checkpoints_dir, name=args.name,
        ttur=True, remat=_remat_arg(args),
        # cadences scale with the campaign length: ~16 val points and ~8
        # image panels regardless of --steps (a 2k-step run used to pay
        # an epoch-panel render per 10-step epoch)
        save_epoch_freq=max(1, n_total // 2),
        display_epoch_freq=max(1, n_total // 8),
        validate_epoch=max(1, n_total // 16), fused_step=args.fused_step,
        qat=args.qat, qat_int8=args.qat_int8, qat_d=args.qat_d,
        vgg_microbatch=args.vgg_microbatch,
    )
    vgg_params = losses.init_vgg19(0) if args.vgg == "random" else None

    import jax.numpy as jnp
    import optax

    from livespeechportraits_tpu.train import steps as steps_mod

    (lr_g, bg), (lr_d, bd) = steps_mod.ttur_learning_rates(args.lr, True)
    tx_g = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=bg[0], b2=bg[1])
    )(learning_rate=lr_g)
    tx_d = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=bd[0], b2=bd[1])
    )(learning_rate=lr_d)

    if args.bench_only:
        from livespeechportraits_tpu.models import feature2face as f2f_model
        from livespeechportraits_tpu.train import state as state_mod

        kg, kd = jax.random.split(jax.random.PRNGKey(loop.seed))
        g0 = f2f_model.init_generator(kg, cfg)
        if args.qat or args.qat_int8:
            g0 = f2f_model.qat_generator(g0, int8_forward=args.qat_int8)
        g_state = state_mod.create_state(g0["net"], tx_g)
        d_state = state_mod.create_state(
            f2f_model.init_discriminator(kd, cfg), tx_d)
        train_wall = 0.0
    else:
        t0 = time.time()
        g_state, d_state = trainer.train_feature2face(
            cfg, loop, sampler, val_sampler=sampler, vgg_params=vgg_params)
        train_wall = time.time() - t0

    # ---- deployed-int8 fidelity report (the quantity QAT exists for) ----
    fidelity = None
    if not args.bench_only and args.size != "small":
        from livespeechportraits_tpu.models import feature2face as f2f_model

        eval_batch = trainer._device_rasterize_batch(jax.device_put(next(iter(
            sampler.batches(args.batch, np.random.default_rng(123),
                            shuffle=False)))))
        inp = steps_mod.f2f_g_input(eval_batch)
        tgt = steps_mod.f2f_target(eval_batch)
        g_tree = {"net": g_state.params, "size": args.size}
        if f2f_model.is_qat_generator(g_tree):
            g_tree = f2f_model.strip_qat_generator(g_tree)
        deployed = f2f_model.calibrate_generator(
            f2f_model.fold_bn_generator(f2f_model.quantize_generator(g_tree)),
            inp, compute_dtype=jnp.bfloat16)

        def _psnr(a, b):
            mse = float(jnp.mean((a.astype(jnp.float32) - b) ** 2))
            return round(10.0 * float(np.log10(4.0 / max(mse, 1e-12))), 2)

        fwd = jax.jit(lambda n, x: f2f_model.apply_generator(
            {"net": n, "size": args.size}, x, training=False,
            compute_dtype=jnp.bfloat16)[0])
        y_f = fwd(g_tree["net"], inp)
        y_q = fwd(deployed["net"], inp)
        fidelity = {
            "psnr_float_vs_target": _psnr(y_f, tgt),
            "psnr_int8_vs_target": _psnr(y_q, tgt),
            "psnr_int8_vs_float": _psnr(y_q, jnp.asarray(y_f, jnp.float32)),
        }

    # ---- timed in-cache step microbenchmark ----
    batch = trainer._device_rasterize_batch(jax.device_put(next(iter(
        sampler.batches(args.batch, np.random.default_rng(0))))))
    K = 20
    if args.fused_step:
        gan_step = steps_mod.make_f2f_fused_step(
            cfg, tx_g, tx_d, vgg_params, compute_dtype=jnp.bfloat16,
            remat=_remat_arg(args), qat_d=args.qat_d,
            vgg_microbatch=args.vgg_microbatch or None)
        g_state, d_state, gm = gan_step(g_state, d_state, batch)
        _ = float(gm["loss_G"])
        t0 = time.time()
        for _ in range(K):
            g_state, d_state, gm = gan_step(g_state, d_state, batch)
        _ = float(gm["loss_G"])  # true barrier on the tunnelled backend
        step_s = (time.time() - t0) / K
        step_fns = ((gan_step, (g_state, d_state, batch)),)
    else:
        d_step, g_step = steps_mod.make_f2f_steps(
            cfg, tx_g, tx_d, vgg_params, compute_dtype=jnp.bfloat16,
            remat=_remat_arg(args), qat_d=args.qat_d,
            vgg_microbatch=args.vgg_microbatch or None)
        # warm (hits the trainer's executables via the jit cache); the
        # scalar fetch is the true barrier on the tunnelled backend
        d_state, _ = d_step(d_state, g_state.params, batch)
        g_state, gm = g_step(g_state, d_state.params, batch)
        _ = float(gm["loss_G"])
        t0 = time.time()
        for _ in range(K):
            d_state, dm = d_step(d_state, g_state.params, batch)
            g_state, gm = g_step(g_state, d_state.params, batch)
        _ = float(gm["loss_G"])
        step_s = (time.time() - t0) / K
        step_fns = ((d_step, (d_state, g_state.params, batch)),
                    (g_step, (g_state, d_state.params, batch)))

    flops = None
    try:
        costs = []
        for fn, a in step_fns:
            c = fn.lower(*a).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            costs.append(float(c["flops"]))
        flops = sum(costs)
    except Exception:
        pass
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12, "v5p": 459e12,
             "v6e": 918e12, "trillium": 918e12}
    peak = next((v for k, v in peaks.items() if k in kind), None)

    print(json.dumps({
        "metric": "512^2 GAN train step (D+G), 1 chip",
        "size": args.size, "batch": args.batch, "vgg": args.vgg,
        "vgg_microbatch": args.vgg_microbatch,
        "remat": _remat_arg(args), "fused_step": args.fused_step,
        "qat": args.qat, "qat_int8": args.qat_int8, "qat_d": args.qat_d,
        "fidelity": fidelity,
        "steps_trained": int(g_state.step), "train_wall_s": round(train_wall, 1),
        "step_time_ms": round(step_s * 1e3, 1),
        "steps_per_s": round(1.0 / step_s, 3),
        "pixels_per_s": int(args.batch * H * H / step_s),
        "train_tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": round(flops / step_s / peak, 4) if flops and peak else None,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

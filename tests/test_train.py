"""Trainer tests: loss decrease on learnable synthetic data, BN-state
plumbing, schedulers, window-math property tests, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import (
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    WaveNetConfig,
)
from livespeechportraits_tpu.models import audio2feature, audio2headpose, feature2face
from livespeechportraits_tpu.train import datasets, schedulers, state as state_mod, steps

A2F_CFG = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=16, output_dim=6,
                              frame_future=2)
WN_CFG = WaveNetConfig(residual_layers=2, residual_blocks=1, dilation_channels=8,
                       residual_channels=8, skip_channels=16, cond_channels=8)
A2H_CFG = Audio2HeadposeConfig(apc_hidden_size=8, wavenet=WN_CFG, frame_future=1)
F2F_CFG = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=32)


def test_a2f_training_reduces_loss():
    key = jax.random.PRNGKey(0)
    params = audio2feature.init_audio2feature(key, A2F_CFG)
    tx = state_mod.adam(1e-3)
    st = state_mod.create_state(params, tx)
    step = steps.make_a2f_step(A2F_CFG, tx)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(4, 24, 8)).astype(np.float32)
    # learnable target: linear function of paired audio
    W = rng.normal(size=(16, 6)).astype(np.float32) * 0.1
    target = audio.reshape(4, 12, 16) @ W
    batch = {"audio": jnp.asarray(audio), "target": jnp.asarray(target)}

    losses = []
    for _ in range(30):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(st.step) == 30


def test_a2h_training_reduces_loss_and_smooth_term():
    key = jax.random.PRNGKey(1)
    params = audio2headpose.init_audio2headpose(key, A2H_CFG)
    tx = state_mod.adam(1e-3)
    st = state_mod.create_state(params, tx)
    step = steps.make_a2h_step(A2H_CFG, tx, smooth_loss_weight=0.1)

    rng = np.random.default_rng(1)
    L = WN_CFG.receptive_field + 4 - 1  # item_length for target_length=4
    batch = {
        "audio": jnp.asarray(rng.normal(size=(2, L, 16)).astype(np.float32)),
        "history": jnp.asarray(rng.normal(size=(2, L, 12)).astype(np.float32) * 0.1),
        "target": jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32) * 0.1),
    }
    losses = []
    for i in range(25):
        st, m = step(st, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert "smooth" in m
    assert losses[-1] < losses[0]


def test_f2f_gan_steps_run_and_update():
    kg, kd = jax.random.split(jax.random.PRNGKey(2))
    g = feature2face.init_generator(kg, F2F_CFG)
    d = feature2face.init_discriminator(kd, F2F_CFG)
    (lr_g, bg), (lr_d, bd) = steps.ttur_learning_rates(2e-4, ttur=False)
    tx_g = state_mod.adam(lr_g, b1=bg[0], b2=bg[1])
    tx_d = state_mod.adam(lr_d, b1=bd[0], b2=bd[1])
    g_state = state_mod.create_state(g["net"], tx_g)
    d_state = state_mod.create_state(d, tx_d)
    d_step, g_step = steps.make_f2f_steps(F2F_CFG, tx_g, tx_d, vgg_params=None,
                                           donate=False)

    rng = np.random.default_rng(2)
    B, H = 2, 32
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)),
    }
    d_state, md = d_step(d_state, g_state.params, batch)
    g_state2, mg = g_step(g_state, d_state.params, batch)
    for k in ["D_real", "D_fake", "loss_D"]:
        assert np.isfinite(float(md[k]))
    for k in ["loss_G_GAN", "L1", "loss_G_FM", "loss_G"]:
        assert np.isfinite(float(mg[k]))
    # generator weights changed
    before = jax.tree.leaves(g_state.params)[0]
    after = jax.tree.leaves(g_state2.params)[0]
    assert np.abs(np.asarray(before - after)).max() > 0


def test_merge_bn_stats_only_touches_running_stats():
    from livespeechportraits_tpu.models import nn_core

    p = {"bn": nn_core.batchnorm_init(4), "w": jnp.ones(3)}
    aux = {"bn": dict(p["bn"], mean=jnp.full(4, 7.0), var=jnp.full(4, 9.0),
                      scale=jnp.full(4, 100.0)),
           "w": jnp.zeros(3)}
    merged = state_mod.merge_bn_stats(p, aux)
    np.testing.assert_allclose(np.asarray(merged["bn"]["mean"]), 7.0)
    np.testing.assert_allclose(np.asarray(merged["bn"]["var"]), 9.0)
    np.testing.assert_allclose(np.asarray(merged["bn"]["scale"]), 1.0)  # untouched
    np.testing.assert_allclose(np.asarray(merged["w"]), 1.0)  # untouched


def test_schedulers_match_reference_semantics():
    lin = schedulers.make_schedule("linear", 1e-3, n_epochs=10, n_epochs_decay=10)
    assert lin(0) == pytest.approx(1e-3)
    assert lin(10) == pytest.approx(1e-3)
    assert lin(15) == pytest.approx(1e-3 * (1 - 5 / 11))
    assert lin(21) == pytest.approx(0.0)

    st = schedulers.make_schedule("step", 1e-3, step_size=5, gamma=0.5)
    assert st(4) == pytest.approx(1e-3)
    assert st(5) == pytest.approx(5e-4)

    cos = schedulers.make_schedule("cosine", 1e-3, n_epochs=10)
    assert cos(0) == pytest.approx(1e-3)
    assert cos(10) == pytest.approx(0.0, abs=1e-9)

    pl = schedulers.make_schedule("plateau", 1e-3)
    lr = 1e-3
    for _ in range(7):
        lr = pl.update(1.0)  # no improvement
    assert lr < 1e-3


def _toy_clip(T=800, F=8):
    rng = np.random.default_rng(0)
    return datasets.make_clip(
        audio_features=rng.normal(size=(2 * T, F)).astype(np.float32),
        pts3d=rng.normal(size=(T, 73, 3)).astype(np.float32),
        rot_angles=rng.uniform(-170, 170, (T, 3)).astype(np.float32),
        trans=rng.normal(size=(T, 3)).astype(np.float32),
    )


def test_a2f_sampler_window_math():
    clip = _toy_clip()
    s = datasets.AudioVisualSampler([clip], task="audio2feature", seq_len=32,
                                    frame_jump_stride=2)
    assert len(s) > 0
    item = s.sample(3)
    cf = 3 * 2  # stride 2, start_point 0, single clip
    np.testing.assert_array_equal(item["audio"], clip.audio_features[cf * 2 : (cf + 32) * 2])
    expected = clip.pts3d[cf : cf + 32][:, np.asarray(MOUTH_IDX)].reshape(32, -1)
    np.testing.assert_array_equal(item["target"], expected)
    assert item["target"].shape == (32, 75)


MOUTH_IDX = np.concatenate([np.arange(4, 11), np.arange(46, 64)])


def test_a2h_sampler_window_math():
    clip = _toy_clip()
    R, tfl, ff = 15, 8, 3
    s = datasets.AudioVisualSampler([clip], task="audio2headpose",
                                    target_length=tfl, receptive_field=R,
                                    frame_future=ff)
    item = s.sample(5)
    cf = 5 + 300  # start_point 300
    hs = cf - R
    L = R + tfl - 1
    pose_vel = np.concatenate([clip.headpose, clip.velocity], axis=1)
    np.testing.assert_array_equal(item["history"], pose_vel[hs : hs + L])
    np.testing.assert_array_equal(item["target"], pose_vel[hs + R : hs + L + 1])
    np.testing.assert_array_equal(
        item["audio"], clip.audio_features[2 * (hs + ff) : 2 * (hs + ff + L)].reshape(L, -1))
    assert item["target"].shape == (tfl, 12)


def test_rot_x_remap_convention():
    """-180..180 -> 0..360 -> -180 shift (audiovisual_dataset.py:158-161)."""
    rot = np.array([[-170.0, 0, 0], [170.0, 0, 0]], np.float32)
    clip = datasets.make_clip(
        audio_features=np.zeros((200, 4), np.float32),
        pts3d=np.zeros((100, 73, 3), np.float32),
        rot_angles=np.repeat(rot, 50, axis=0),
        trans=np.zeros((100, 3), np.float32),
    )
    assert clip.headpose[0, 0] == pytest.approx(10.0)  # -170 + 360 - 180
    assert clip.headpose[99, 0] == pytest.approx(-10.0)  # 170 - 180


def test_sampler_batches_and_multiclip_bisect():
    clips = [_toy_clip(T=700), _toy_clip(T=900)]
    s = datasets.AudioVisualSampler(clips, task="audio2feature", seq_len=16)
    rng = np.random.default_rng(0)
    b = next(s.batches(4, rng))
    assert b["audio"].shape == (4, 32, 8)
    assert b["target"].shape == (4, 16, 75)
    # index into second clip resolves against its own data
    second_start = s.sample_start[1]
    item = s.sample(second_start + 5)
    cf = second_start + 5 - second_start
    np.testing.assert_array_equal(
        item["audio"], clips[1].audio_features[cf * 2 : (cf + 16) * 2])


def test_face_sampler():
    rng = np.random.default_rng(0)
    N, H = 70, 64
    images = (rng.uniform(0, 255, (N, H, H, 3))).astype(np.uint8)
    lms = rng.uniform(10, 54, (N, 73, 2)).astype(np.float32)
    sh = rng.uniform(10, 54, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    s = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=H)
    item = s.sample(0)
    assert item["feature_map"].shape == (H, H, 1)
    assert item["cand_image"].shape == (H, H, 12)
    assert item["tgt_image"].shape == (H, H, 3)
    assert item["weight_mask"].shape == (H, H, 1)
    assert 0 <= item["feature_map"].max() <= 1
    batch = next(s.batches(2, rng))
    assert batch["tgt_image"].shape == (2, H, H, 3)


def test_checkpoint_roundtrip(tmp_path):
    from livespeechportraits_tpu.utils import checkpoint as ckpt

    key = jax.random.PRNGKey(0)
    params = audio2feature.init_audio2feature(key, A2F_CFG)
    tx = state_mod.adam(1e-3)
    st = state_mod.create_state(params, tx)
    d = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(d, {"a2f": st._asdict()}, step=7)
    assert ckpt.latest_step(d) == 7
    restored = ckpt.restore_checkpoint(d)
    r_params = restored["a2f"]["params"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(r_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_f2f_remat_step_matches_plain():
    """jax.checkpoint'd generator forward yields the same update."""
    import optax

    kg, kd = jax.random.split(jax.random.PRNGKey(3))
    g = feature2face.init_generator(kg, F2F_CFG)
    d = feature2face.init_discriminator(kd, F2F_CFG)
    tx = optax.sgd(0.01)
    rng = np.random.default_rng(4)
    B, H = 2, 32
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)),
    }
    outs = []
    for remat in [False, True, 2]:
        g_state = state_mod.create_state(g["net"], tx)
        d_state = state_mod.create_state(d, tx)
        _, g_step = steps.make_f2f_steps(F2F_CFG, tx, tx, remat=remat,
                                         donate=False)
        g_state, m = g_step(g_state, d_state.params, batch)
        outs.append((float(m["loss_G"]), g_state.params))
    for loss, params in outs[1:]:
        assert outs[0][0] == pytest.approx(loss, rel=1e-5)
        for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prefetch_iterator():
    from livespeechportraits_tpu.train.prefetch import prefetch

    out = list(prefetch(iter(range(10)), size=3, transform=lambda x: x * 2))
    assert out == [i * 2 for i in range(10)]

    def boom():
        yield 1
        raise RuntimeError("worker failed")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_f2f_fused_step_grads_match_oracle():
    """The manual-vjp fused GAN step must produce EXACTLY the gradients of
    its declared semantics: d_grads = grad of the D loss and g_grads =
    grad of the G loss, both evaluated at the pre-update params with
    training=True shared forwards (feature2face_model.py:120-190's
    compute-fake-once structure)."""
    from livespeechportraits_tpu.models import losses as losses_mod
    from livespeechportraits_tpu.train.state import merge_bn_stats

    import optax

    cfg = F2F_CFG
    kg, kd = jax.random.split(jax.random.PRNGKey(5))
    g = feature2face.init_generator(kg, cfg)
    d = feature2face.init_discriminator(kd, cfg)
    # SGD makes the post-step params LINEAR in the gradients, so the
    # comparison tolerances are meaningful (Adam's first step is
    # ~sign(grad)*lr, which amplifies float-reordering noise wherever a
    # gradient entry is near zero).
    tx = optax.sgd(1e-2)
    g_state = state_mod.create_state(g["net"], tx)
    d_state = state_mod.create_state(d, tx)

    rng = np.random.default_rng(5)
    B, H = 2, 32
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)),
    }
    inp = jnp.concatenate([batch["feature_map"], batch["cand_image"]], axis=-1)
    tgt = batch["tgt_image"]

    def fake_of(g_net):
        out, _ = feature2face.apply_generator({"net": g_net, "size": cfg.size},
                                              inp, training=True)
        return out

    def d_loss(d_params, g_net):
        fake = jax.lax.stop_gradient(fake_of(g_net))
        pr, _ = feature2face.apply_discriminator(
            d_params, jnp.concatenate([inp, tgt], -1), training=True)
        pf, _ = feature2face.apply_discriminator(
            d_params, jnp.concatenate([inp, fake], -1), training=True)
        return (losses_mod.gan_loss(pr, True, cfg.gan_mode) * 2.0
                + losses_mod.gan_loss(pf, False, cfg.gan_mode)) * 0.5

    def g_loss(g_net, d_params):
        fake = fake_of(g_net)
        pr, _ = feature2face.apply_discriminator(
            d_params, jnp.concatenate([inp, tgt], -1), training=True)
        pf, _ = feature2face.apply_discriminator(
            d_params, jnp.concatenate([inp, fake], -1), training=True)
        return (losses_mod.gan_loss(pf, True, cfg.gan_mode, for_discriminator=False)
                + jnp.mean(jnp.abs(fake - tgt)) * cfg.lambda_L1
                + losses_mod.feature_matching_loss(pf, pr, cfg.num_D,
                                                   cfg.n_layers_D, cfg.lambda_feat))

    # jit the oracle: an eager oracle evaluates the BN statistics
    # reductions op-by-op with a different accumulation schedule than any
    # fused program, and the one-pass BN stats (nn_core.BN_ONEPASS) raise
    # cross-SCHEDULE noise ~50x (var as E[z^2]-E[z]^2 inherits reduction-
    # order noise that centred squares cancel; measured worst post-SGD
    # param diff 4.9e-5 eager vs 6e-6 jitted at these shapes)
    d_grads_oracle = jax.jit(jax.grad(d_loss))(d_state.params, g_state.params)
    g_grads_oracle = jax.jit(jax.grad(g_loss))(g_state.params, d_state.params)

    # oracle updates from the same optimizer at the same (pre-update) params
    du, _ = tx.update(d_grads_oracle, d_state.opt_state, d_state.params)
    gu, _ = tx.update(g_grads_oracle, g_state.opt_state, g_state.params)
    d_expect = optax.apply_updates(d_state.params, du)
    g_expect = optax.apply_updates(g_state.params, gu)

    gan_step = steps.make_f2f_fused_step(cfg, tx, tx, vgg_params=None)
    new_g, new_d, metrics = gan_step(g_state, d_state, batch)

    for k in ["loss_D", "D_real", "D_fake", "loss_G", "loss_G_GAN", "L1",
              "loss_G_FM"]:
        assert np.isfinite(float(metrics[k])), k

    # compare every non-BN-stat leaf (BN running stats are merged from the
    # aux, which the oracle above does not model)
    def strip_bn(tree, ref):
        return merge_bn_stats(tree, ref)

    # atol = 3x the measured jitted-oracle-vs-fused reorder-noise floor
    # (~6e-6 with one-pass BN stats); a wrong/missing loss term moves
    # params by O(lr * grad) = O(1e-2), 500x above this
    got_d = strip_bn(new_d.params, d_expect)
    got_g = strip_bn(new_g.params, g_expect)
    for a, b in zip(jax.tree.leaves(got_d), jax.tree.leaves(d_expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(g_expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_f2f_fused_step_remat_matches_plain():
    cfg = F2F_CFG
    kg, kd = jax.random.split(jax.random.PRNGKey(6))
    g = feature2face.init_generator(kg, cfg)
    d = feature2face.init_discriminator(kd, cfg)
    tx = state_mod.adam(1e-3)
    rng = np.random.default_rng(6)
    B, H = 2, 32
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)),
    }
    outs = []
    # 2 = selective: rematerialise only the outermost 2 stages
    # (steps._remat_wrap named-checkpoint policy); the last variant
    # rematerialises the D towers instead (remat_d)
    for remat, remat_d in ((False, False), (True, False), (2, False),
                           (False, True)):
        g_state = state_mod.create_state(g["net"], tx)
        d_state = state_mod.create_state(d, tx)
        step = steps.make_f2f_fused_step(cfg, tx, tx, remat=remat,
                                         donate=False, remat_d=remat_d)
        new_g, new_d, m = step(g_state, d_state, batch)
        outs.append((new_g.params, new_d.params,
                     float(m["loss_G"]), float(m["loss_D"])))
    for other in outs[1:]:
        np.testing.assert_allclose(outs[0][2], other[2], rtol=1e-5)
        np.testing.assert_allclose(outs[0][3], other[3], rtol=1e-5)
        for ref_tree, other_tree in ((outs[0][0], other[0]),
                                     (outs[0][1], other[1])):
            for a, b in zip(jax.tree.leaves(ref_tree),
                            jax.tree.leaves(other_tree)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6, rtol=1e-5)


def test_f2f_qat_d_step_runs_and_stays_tag_free():
    """qat_d=True: the discriminator's interior convs run the int8 kernel
    inside the step (both fused and alternating forms), gradients stay
    finite and close to the float-D step's, and neither state tree ever
    carries a tag leaf (the transform is step-internal)."""
    kg, kd = jax.random.split(jax.random.PRNGKey(6))
    g = feature2face.init_generator(kg, F2F_CFG)
    d = feature2face.init_discriminator(kd, F2F_CFG)
    (lr_g, bg), (lr_d, bd) = steps.ttur_learning_rates(2e-4, ttur=False)
    tx_g = state_mod.adam(lr_g, b1=bg[0], b2=bg[1])
    tx_d = state_mod.adam(lr_d, b1=bd[0], b2=bd[1])

    rng = np.random.default_rng(6)
    B, H = 2, 32
    batch = {
        "feature_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32)),
        "cand_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32)),
        "tgt_image": jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)),
    }

    def run(qat_d, fused):
        g_state = state_mod.create_state(g["net"], tx_g)
        d_state = state_mod.create_state(d, tx_d)
        if fused:
            step = steps.make_f2f_fused_step(F2F_CFG, tx_g, tx_d, donate=False,
                                             qat_d=qat_d)
            g_state, d_state, m = step(g_state, d_state, batch)
        else:
            d_step, g_step = steps.make_f2f_steps(F2F_CFG, tx_g, tx_d,
                                                  donate=False, qat_d=qat_d)
            d_state, _ = d_step(d_state, g_state.params, batch)
            g_state, m = g_step(g_state, d_state.params, batch)
        return g_state, d_state, m

    for fused in (False, True):
        gq, dq, mq = run(True, fused)
        gf, df, mf = run(False, fused)
        assert np.isfinite(float(mq["loss_G"])) and np.isfinite(float(mq.get("loss_D", 0.0) or 0.0))
        # int8 D is a small perturbation of the float-D step, not a rewrite
        lg = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(gq.params)])
        lf = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(gf.params)])
        assert np.abs(lg - lf).max() < 1e-2, (fused, np.abs(lg - lf).max())
        # D params updated and stayed tag-free
        d0 = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(d)])
        d1 = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(dq.params)])
        assert np.abs(d0 - d1).max() > 0

        def keys_of(p, acc):
            if isinstance(p, dict):
                acc.update(p.keys())
                for v in p.values():
                    keys_of(v, acc)
            elif isinstance(p, list):
                for v in p:
                    keys_of(v, acc)
            return acc

        assert "fq8" not in keys_of(dq.params, set())
        assert "fq8" not in keys_of(gq.params, set())


def test_rebuild_rejects_extra_keys_but_drops_annotations():
    """checkpoint.rebuild mirrors the sequence branch's never-silently-
    truncate rule for dicts: unknown checkpoint keys raise (config
    mismatch), while the per-conv annotation leaves (QAT tags, baked
    x_scale) are deliberately droppable - the documented strip path."""
    from livespeechportraits_tpu.utils import checkpoint as ckpt

    tmpl = {"a": jnp.zeros(2), "conv": {"w": jnp.zeros(3), "b": jnp.zeros(3)}}
    ok = ckpt.rebuild(tmpl, {"a": np.ones(2),
                             "conv": {"w": np.ones(3), "b": np.ones(3),
                                      "fq": np.ones(()), "fq8": np.ones(()),
                                      "x_scale": np.ones(())}})
    assert set(ok["conv"].keys()) == {"w", "b"}

    with pytest.raises(ValueError, match="keys the template lacks"):
        ckpt.rebuild(tmpl, {"a": np.ones(2), "extra_stage": np.ones(4),
                            "conv": {"w": np.ones(3), "b": np.ones(3)}})


def test_audiovisual_sampler_rejects_oversized_windows():
    """A window no start of the clip can fit must fail at CONSTRUCTION,
    not slice out of range on a random shuffled index mid-epoch."""
    clip = _toy_clip(T=900)
    with pytest.raises(ValueError, match="too short"):
        datasets.AudioVisualSampler([clip], task="audio2feature", seq_len=960)
    # the boundary case that fits still constructs
    s = datasets.AudioVisualSampler([clip], task="audio2feature", seq_len=240)
    item = s.sample(len(s) - 1)
    assert item["target"].shape[0] == 240


def test_audiovisual_sampler_clamps_valid_starts_to_window():
    """The reference's FIXED 400-frame tail guard under-guards windows
    longer than 400 frames (audiovisual_dataset.py:172-208): its last
    starts would slice out of range.  Intended behaviour: the start
    count clamps so every admitted start reads its whole window
    in-bounds (regression: the A2H window rf 255 + target 240 = 495 on
    a 3600-frame clip used to raise outright)."""
    # a2f: 480-frame window on a 900-frame clip -> 421 in-bounds starts
    clip = _toy_clip(T=900)
    s = datasets.AudioVisualSampler([clip], task="audio2feature", seq_len=480)
    assert len(s) == 900 - 480 + 1
    item = s.sample(len(s) - 1)  # last admitted start: full-length window
    assert item["target"].shape[0] == 480
    # a2h at the production window on a 3600-frame clip (the e2e config)
    clip = _toy_clip(T=3600)
    s = datasets.AudioVisualSampler([clip], task="audio2headpose",
                                    target_length=240, receptive_field=255,
                                    frame_future=15)
    assert len(s) == 3600 - 300 - 495 + 1
    item = s.sample(len(s) - 1)
    assert item["target"].shape == (240, 12)
    assert item["history"].shape == (255 + 240 - 1, 12)


def test_audiovisual_sampler_multiclip_clamp_binding():
    """Multi-clip + clamp-binding window: the reference's cumulative
    start layout (`sample_start[-1] + len_[-1] - 1`,
    audiovisual_dataset.py:204-216) overlaps adjacent clips, so the
    final clip's top global indices used to map one past its admitted
    range and slice out of bounds mid-epoch.  Clip i must own exactly
    len_[i] consecutive global starts."""
    clips = [_toy_clip(T=900), _toy_clip(T=900)]
    s = datasets.AudioVisualSampler(clips, task="audio2feature", seq_len=480)
    per_clip = 900 - 480 + 1
    assert len(s) == 2 * per_clip
    # every admitted start reads its whole window in-bounds
    for i in (0, per_clip - 1, per_clip, len(s) - 1):
        item = s.sample(i)
        assert item["target"].shape[0] == 480
    # the seam is exact: first start of clip 1 reads clip 1's frame 0,
    # and clip 0's last start is reachable (not shadowed by the seam)
    np.testing.assert_array_equal(
        s.sample(per_clip)["audio"], clips[1].audio_features[: 480 * 2])
    np.testing.assert_array_equal(
        s.sample(per_clip - 1)["audio"],
        clips[0].audio_features[(per_clip - 1) * 2 : (per_clip - 1 + 480) * 2])
    # same layout holds for the a2h window shape
    clips = [_toy_clip(T=1200), _toy_clip(T=1200)]
    s = datasets.AudioVisualSampler(clips, task="audio2headpose",
                                    target_length=240, receptive_field=255,
                                    frame_future=15)
    per_clip = 1200 - 300 - 495 + 1
    assert len(s) == 2 * per_clip
    item = s.sample(len(s) - 1)
    assert item["target"].shape == (240, 12)


def test_prefetch_releases_worker_on_abandonment():
    """A consumer abandoning the generator mid-epoch must unblock the
    worker thread (it used to stay parked on q.put holding device-resident
    batches for the life of the process); size=0 is rejected outright."""
    import threading
    import time as _time

    from livespeechportraits_tpu.train import prefetch as pf

    with pytest.raises(ValueError, match="UNBOUNDED"):
        next(pf.prefetch(iter(range(10)), size=0))

    n_before = threading.active_count()
    gen = pf.prefetch(iter(range(1000)), size=1)
    assert next(gen) == 0
    gen.close()  # abandon mid-epoch
    deadline = _time.time() + 5.0
    while threading.active_count() > n_before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n_before + 1  # worker exited


def test_plateau_policy_usable_and_cosine_clamps():
    """make_schedule('plateau') is callable like every other policy (it
    used to crash the trainers at epoch 0) and anneals on update();
    cosine clamps at n_epochs instead of climbing back toward base_lr
    during the decay epochs the trainers always run."""
    pl = schedulers.make_schedule("plateau", 1e-3)
    assert pl(0) == pytest.approx(1e-3)
    for _ in range(7):
        pl.update(1.0)
    assert pl(3) < 1e-3

    cos = schedulers.make_schedule("cosine", 1e-3, n_epochs=10)
    assert cos(10) == pytest.approx(0.0, abs=1e-12)
    assert cos(19) == pytest.approx(0.0, abs=1e-12)  # no rise-back


# ---------------------------------------------------------------------------
# Host-link batch diet (shared candidates once + u8 targets + device-
# resident audio bank): the diet format must train IDENTICALLY to the
# legacy full-fat batches - expansion happens on device with the exact
# host expressions.
# ---------------------------------------------------------------------------


def _diet_face_data(N=12, H=32):
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (N, H, H, 3)).astype(np.uint8)
    # landmark x-range >= H/2 so the face-centred crop window IS the frame
    # (no resize): the u8 and f32 paths then agree bitwise
    lms = np.stack([
        np.stack([np.linspace(2, H - 2, 73), np.linspace(8, H - 8, 73)], 1)
        for _ in range(N)
    ]).astype(np.float32)
    sh = rng.uniform(4, H - 4, (18, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (4, H, H, 3)).astype(np.float32)
    return images, lms, sh, cands


def test_face_sampler_diet_batch_format():
    images, lms, sh, cands = _diet_face_data()
    s = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32,
                                  emit_weight_mask=False)
    b = next(s.batches(4, np.random.default_rng(0)))
    assert b["cand_image"].shape == (1, 32, 32, 12)  # shared, once per batch
    assert b["tgt_image"].dtype == np.uint8  # 4x fewer bytes on the link
    assert "weight_mask" not in b
    # the diet batch is an order of magnitude lighter than the legacy one
    legacy = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32,
                                       shared_cand=False, u8_targets=False)
    bl = next(legacy.batches(4, np.random.default_rng(0)))
    diet_bytes = sum(v.nbytes for v in b.values())
    legacy_bytes = sum(v.nbytes for v in bl.values())
    # at this tiny 32^2 the per-sample feature_map dominates; at the
    # production 512^2 B=16 the ratio is ~16x (12.6 MB shared cand +
    # 4x u8 targets + no mask)
    assert diet_bytes < 0.3 * legacy_bytes


def test_face_diet_expands_to_legacy_batch_exactly():
    """f2f_g_input / f2f_target on a diet batch reproduce the legacy f32
    batch bitwise (no crop-resize in this construction)."""
    images, lms, sh, cands = _diet_face_data()
    diet = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32)
    legacy = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32,
                                       shared_cand=False, u8_targets=False)
    bd = next(diet.batches(4, np.random.default_rng(7)))
    bl = next(legacy.batches(4, np.random.default_rng(7)))
    inp_d = np.asarray(steps.f2f_g_input(jax.device_put(bd)))
    inp_l = np.asarray(steps.f2f_g_input(jax.device_put(bl)))
    np.testing.assert_array_equal(inp_d, inp_l)
    tgt_d = np.asarray(steps.f2f_target(jax.device_put(bd)))
    np.testing.assert_array_equal(tgt_d, bl["tgt_image"])


def test_f2f_step_diet_equals_legacy():
    """One fused GAN step from identical init on the diet batch and the
    legacy batch produces the same metrics and updated params."""
    import optax

    images, lms, sh, cands = _diet_face_data()
    diet = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32)
    legacy = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32,
                                       shared_cand=False, u8_targets=False)
    bd = next(diet.batches(2, np.random.default_rng(1)))
    bl = next(legacy.batches(2, np.random.default_rng(1)))
    bd.pop("weight_mask", None), bl.pop("weight_mask", None)

    cfg = F2F_CFG
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    g = feature2face.init_generator(kg, cfg)
    d = feature2face.init_discriminator(kd, cfg)
    step = steps.make_f2f_fused_step(cfg, tx, tx, donate=False)
    g1, d1, m1 = step(state_mod.create_state(g["net"], tx),
                      state_mod.create_state(d, tx), jax.device_put(bd))
    g2, d2, m2 = step(state_mod.create_state(g["net"], tx),
                      state_mod.create_state(d, tx), jax.device_put(bl))
    for k in m1:
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-6), k
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 g1.params, g2.params)


def test_face_batches_emit_one_cand_view_per_epoch():
    """_face_batches must reuse ONE [1,H,W,12] view object across an
    epoch's batches: the trainer's device cache keys on the view's base,
    and per-batch fresh views used to re-upload + retain a device copy
    each step (the round-4 campaign OOM)."""
    images, lms, sh, cands = _diet_face_data()
    s = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32,
                                  emit_weight_mask=False)
    batches = list(s.batches(4, np.random.default_rng(0)))
    assert len(batches) >= 2
    assert batches[0]["cand_image"] is batches[1]["cand_image"]
    assert batches[0]["cand_image"].base is not None


def test_concat_face_sampler_shared_cand_guard():
    images, lms, sh, cands = _diet_face_data()
    s1 = datasets.FaceFrameSampler(images, lms, sh, cands, load_size=32)
    s2 = datasets.FaceFrameSampler(images, lms, sh, cands.copy(), load_size=32)
    assert datasets.ConcatFaceSampler([s1, s2]).shared_cand_array() is not None
    other = cands.copy()
    other[0] += 0.5
    s3 = datasets.FaceFrameSampler(images, lms, sh, other, load_size=32)
    cc = datasets.ConcatFaceSampler([s1, s3])
    assert cc.shared_cand_array() is None  # different cands: fall back
    b = next(cc.batches(4, np.random.default_rng(0)))
    assert b["cand_image"].shape == (4, 32, 32, 12)  # per-sample emission


def test_a2f_device_audio_bank_equals_host_path():
    clips = [_toy_clip(T=700), _toy_clip(T=900)]
    host = datasets.AudioVisualSampler(clips, task="audio2feature", seq_len=16)
    dev = datasets.AudioVisualSampler(clips, task="audio2feature", seq_len=16,
                                      device_audio=True)
    bh = next(host.batches(4, np.random.default_rng(5)))
    bd = next(dev.batches(4, np.random.default_rng(5)))
    assert "audio" not in bd and bd["audio_start"].shape == (4,)
    bank = jax.device_put(dev.audio_bank)
    win = np.asarray(steps._batch_audio(jax.device_put(bd), bank,
                                        dev.audio_rows, fold_pairs=False))
    np.testing.assert_array_equal(win, bh["audio"])

    import optax

    cfg = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=16,
                              output_dim=75, frame_future=2)
    tx = optax.adam(1e-3)
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), cfg)
    sh = steps.make_a2f_step(cfg, tx, donate=False)
    sd = steps.make_a2f_step(cfg, tx, donate=False, audio_bank=bank,
                             audio_rows=dev.audio_rows)
    _, mh = sh(state_mod.create_state(params, tx), jax.device_put(bh))
    _, md = sd(state_mod.create_state(params, tx), jax.device_put(bd))
    assert float(mh["loss"]) == pytest.approx(float(md["loss"]), rel=1e-6)


def test_a2h_device_audio_bank_equals_host_path():
    clips = [_toy_clip(T=1200)]
    kw = dict(task="audio2headpose", target_length=8, receptive_field=7,
              frame_future=1, start_point=300)
    host = datasets.AudioVisualSampler(clips, **kw)
    dev = datasets.AudioVisualSampler(clips, device_audio=True, **kw)
    bh = next(host.batches(3, np.random.default_rng(2)))
    bd = next(dev.batches(3, np.random.default_rng(2)))
    np.testing.assert_array_equal(bh["history"], bd["history"])
    bank = jax.device_put(dev.audio_bank)
    win = np.asarray(steps._batch_audio(jax.device_put(bd), bank,
                                        dev.audio_rows, fold_pairs=True))
    np.testing.assert_array_equal(win, bh["audio"])

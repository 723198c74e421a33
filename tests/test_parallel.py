"""Mesh/sharding tests on the 8-device virtual CPU mesh: the reference's
DataParallel batch-split equivalence becomes a pjit sharding test
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from livespeechportraits_tpu.config import (
    Audio2FeatureConfig,
    Feature2FaceConfig,
)
from livespeechportraits_tpu.models import audio2feature, feature2face
from livespeechportraits_tpu.parallel import mesh as mesh_mod
from livespeechportraits_tpu.parallel import sharding as shard_mod
from livespeechportraits_tpu.train import state as state_mod, steps

A2F_CFG = Audio2FeatureConfig(apc_hidden_size=8, lstm_hidden_size=16, output_dim=6,
                              frame_future=0)


def test_device_count():
    assert jax.device_count() == 8, "conftest should force 8 virtual CPU devices"


def test_make_mesh_shapes():
    m = mesh_mod.make_mesh(1)
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_mod.make_mesh(4)
    assert m2.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(3)


def test_data_parallel_step_matches_single_device():
    """The DataParallel equivalence: one step on a sharded global batch
    must produce the same new params as the unsharded run."""
    import optax

    key = jax.random.PRNGKey(0)
    params = audio2feature.init_audio2feature(key, A2F_CFG)
    # SGD keeps updates proportional to gradients; adam would amplify pure
    # float-noise gradients (e.g. the shift-invariant BN-input biases,
    # whose true gradient is 0) into full-lr steps with arbitrary signs.
    tx = optax.sgd(0.1)
    # donate=False: this test steps states built over the SAME param
    # arrays twice (single-device then sharded) for comparison
    step = steps.make_a2f_step(A2F_CFG, tx, donate=False)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(8, 12, 8)).astype(np.float32)
    target = rng.normal(size=(8, 6, 6)).astype(np.float32)

    # single-device baseline
    st0 = state_mod.create_state(params, tx)
    st1, m1 = step(st0, {"audio": jnp.asarray(audio), "target": jnp.asarray(target)})

    # 8-way data-parallel: shard the batch, replicate params
    m = mesh_mod.make_mesh(1)
    stp = state_mod.create_state(mesh_mod.replicate(m, params), tx)
    batch = mesh_mod.shard_batch(m, {"audio": audio, "target": target})
    st2, m2 = step(stp, batch)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    # Cross-device reductions reorder float sums.  Leaves whose true
    # gradient is zero (biases feeding BatchNorm are shift-invariant) carry
    # pure cancellation noise scaled by the x1000 loss, so tolerate up to
    # lr * noise there (~2x higher from-init under the one-pass BN stats,
    # nn_core.BN_ONEPASS - uncentred sumsq until the running-mean shift
    # warms); real gradient directions agree to ~1e-6.
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5e-3)


def test_batch_sharding_is_distributed():
    m = mesh_mod.make_mesh(1)
    x = np.zeros((16, 4), np.float32)
    placed = mesh_mod.shard_batch(m, x)
    assert placed.sharding == NamedSharding(m, P("data", None))
    assert len(placed.addressable_shards) == 8
    assert placed.addressable_shards[0].data.shape == (2, 4)


def test_model_parallel_generator_forward_matches():
    """Channel-sharding the renderer over a model axis must not change its
    output (XLA inserts the collectives)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, cfg.input_nc))

    y_ref, _ = feature2face.apply_generator(params, x)

    m = mesh_mod.make_mesh(4)  # 2 data x 4 model
    net_sharded = shard_mod.shard_params(m, params["net"], model_size=4)
    x_sharded = jax.device_put(x, NamedSharding(m, P("data", None, None, None)))

    @jax.jit
    def fwd(net, inp):
        y, _ = feature2face.apply_generator({"net": net, "size": "normal"}, inp)
        return y

    y_tp = fwd(net_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref), atol=2e-5)


def test_param_partition_spec_rules():
    spec = shard_mod.param_partition_spec((), np.zeros((3, 3, 8, 16)), 4)
    assert spec == P(None, None, None, "model")
    spec1 = shard_mod.param_partition_spec((), np.zeros((16,)), 4)
    assert spec1 == P("model")
    spec2 = shard_mod.param_partition_spec((), np.zeros((3, 3, 8, 6)), 4)
    assert spec2 == P()  # not divisible -> replicated
    assert shard_mod.param_partition_spec((), np.zeros(()), 4) == P()


def test_multichip_inference_rendering_matches_single_device():
    """Frame-sharded rendering over the data axis reproduces the
    single-device pipeline output."""
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    audio = _sine_audio(0.7)
    ref = animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=8)

    mesh = mesh_mod.make_mesh(1)  # 8 data devices
    out = animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=8, mesh=mesh)
    assert out.frames.shape == ref.frames.shape
    diff = np.abs(out.frames.astype(int) - ref.frames.astype(int))
    assert diff.max() <= 1

    with pytest.raises(ValueError):
        animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=3, mesh=mesh)


def test_multihost_shard_host_batch_single_process():
    """shard_host_batch assembles the same global data-sharded array as
    mesh.shard_batch when local == global (single process), and a train
    step over it matches the plain path bit-for-bit."""
    import optax
    from livespeechportraits_tpu.parallel import multihost

    mesh = mesh_mod.make_mesh(1)
    rng = np.random.default_rng(0)
    batch = {
        "audio": rng.normal(size=(8, 20, 8)).astype(np.float32),
        "target": rng.normal(size=(8, 10, 6)).astype(np.float32),
    }
    a = mesh_mod.shard_batch(mesh, batch)
    b = multihost.shard_host_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    tx = optax.adam(1e-3)
    params = audio2feature.init_audio2feature(jax.random.PRNGKey(0), A2F_CFG)
    step = steps.make_a2f_step(A2F_CFG, tx, donate=False)
    s1, m1 = step(state_mod.create_state(mesh_mod.replicate(mesh, params), tx), a)
    s2, m2 = step(state_mod.create_state(mesh_mod.replicate(mesh, params), tx), b)
    assert float(m1["loss"]) == float(m2["loss"])

    # the batch iterator degrades to plain DP sharding single-process
    class _S:
        def batches(self, bs, rng, **kw):
            yield batch

    it = multihost.global_batch_iter(_S(), 8, rng, mesh)
    g = next(it)
    np.testing.assert_array_equal(np.asarray(g["audio"]), batch["audio"])
    assert multihost.is_primary()


def test_fused_gan_step_data_parallel_matches_single_device():
    """The fused one-program GAN step under an 8-way data-sharded batch
    must match the unsharded run (the DataParallel equivalence extended
    to the shared-tower step: gradient all-reduces are inserted by XLA
    from the sharding layout alone)."""
    import optax

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5,
                             load_size=32, num_D=2, n_layers_D=2)
    kg, kd = jax.random.split(jax.random.PRNGKey(9))
    g = feature2face.init_generator(kg, cfg)
    d = feature2face.init_discriminator(kd, cfg)
    tx = optax.sgd(1e-2)
    gan_step = steps.make_f2f_fused_step(cfg, tx, tx, donate=False)

    rng = np.random.default_rng(9)
    B, H = 8, 32
    batch_np = {
        "feature_map": rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32),
        "cand_image": rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32),
        "tgt_image": rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32),
    }

    g0 = state_mod.create_state(g["net"], tx)
    d0 = state_mod.create_state(d, tx)
    g1, d1, m1 = gan_step(g0, d0, {k: jnp.asarray(v)
                                   for k, v in batch_np.items()})

    mesh = mesh_mod.make_mesh(1)
    gp = state_mod.create_state(mesh_mod.replicate(mesh, g["net"]), tx)
    dp = state_mod.create_state(mesh_mod.replicate(mesh, d), tx)
    g2, d2, m2 = gan_step(gp, dp, mesh_mod.shard_batch(mesh, batch_np))

    assert float(m1["loss_G"]) == pytest.approx(float(m2["loss_G"]), rel=1e-4)
    assert float(m1["loss_D"]) == pytest.approx(float(m2["loss_D"]), rel=1e-4)
    # sync-BN batch stats + cross-device reduction reordering: tolerate
    # small absolute noise, as in the A2F DP test above (incl. its
    # one-pass BN note)
    for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5e-3)
    for a, b in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5e-3)


def test_multichip_rendering_with_calibrated_int8():
    """Frame-sharded DP rendering composes with the calibrated static-int8
    renderer: int8 weights replicate over the mesh and the sharded frames
    match the single-device quantized pipeline."""
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(1),
                                            image_size=64, bank_size=64)
    audio = _sine_audio(0.7)
    calib = animate_mod.build_render_inputs(cfg, a, m, audio, max_frames=8)
    mq = assets_mod.quantize_person_models(m, calibrate_inputs=calib)

    ref = animate_mod.animate(cfg, a, mq, audio, seed=0, render_batch=8)
    mesh = mesh_mod.make_mesh(1)  # 8 data devices
    out = animate_mod.animate(cfg, a, mq, audio, seed=0, render_batch=8,
                              mesh=mesh)
    assert out.frames.shape == ref.frames.shape
    diff = np.abs(out.frames.astype(int) - ref.frames.astype(int))
    assert diff.max() <= 1


def test_qat_gan_step_dp_tp_matches_single_device():
    """The QAT (fake-quant STE) GAN step under a hybrid 4-data x 2-model
    mesh matches the unsharded run: the per-channel weight-scale amax and
    per-tensor activation amax reductions cross the channel sharding, and
    XLA's inserted collectives must reproduce them."""
    import optax

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5,
                             load_size=32, num_D=2, n_layers_D=2)
    kg, kd = jax.random.split(jax.random.PRNGKey(11))
    g = feature2face.qat_generator(feature2face.init_generator(kg, cfg))
    d = feature2face.init_discriminator(kd, cfg)
    tx = optax.sgd(1e-2)
    gan_step = steps.make_f2f_fused_step(cfg, tx, tx, donate=False)

    rng = np.random.default_rng(11)
    B, H = 8, 32
    batch_np = {
        "feature_map": rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32),
        "cand_image": rng.uniform(-1, 1, (B, H, H, 12)).astype(np.float32),
        "tgt_image": rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32),
    }

    g0 = state_mod.create_state(g["net"], tx)
    d0 = state_mod.create_state(d, tx)
    g1, d1, m1 = gan_step(g0, d0, {k: jnp.asarray(v)
                                   for k, v in batch_np.items()})

    mesh = mesh_mod.make_mesh(2)  # 4 data x 2 model
    gp = state_mod.create_state(
        shard_mod.shard_params(mesh, g["net"], model_size=2), tx)
    dp = state_mod.create_state(
        shard_mod.shard_params(mesh, d, model_size=2), tx)
    g2, d2, m2 = gan_step(gp, dp, mesh_mod.shard_batch(mesh, batch_np))

    assert float(m1["loss_G"]) == pytest.approx(float(m2["loss_G"]), rel=1e-4)
    assert float(m1["loss_D"]) == pytest.approx(float(m2["loss_D"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_zero1_optimizer_sharding_matches_replicated():
    """ZeRO-1: placing the Adam moments with a data-axis sharding
    (mesh.zero1_place) must not change the optimizer math - Adam is
    elementwise, so sharded-state updates are BITWISE equal to the
    replicated run - while the moment leaves actually live partitioned,
    stay partitioned across steps (jit propagates the input placement),
    and cost ~1/N of the replicated optimizer bytes per chip."""
    import optax

    key = jax.random.PRNGKey(3)
    params = audio2feature.init_audio2feature(key, A2F_CFG)
    tx = optax.adam(1e-3)
    m = mesh_mod.make_mesh(1)
    params = mesh_mod.replicate(m, params)

    # synthesized gradients, replicated: isolates the optimizer update
    # from model-side reduction-order noise (see the DataParallel test)
    ks = iter(jax.random.split(jax.random.PRNGKey(7), 100))
    grads = jax.tree.map(
        lambda x: jax.device_put(
            jax.random.normal(next(ks), np.shape(x), jnp.float32) * 1e-2,
            mesh_mod.replicated(m)),
        params)

    @jax.jit
    def upd(p, opt, g):
        u, new_opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), new_opt

    opt_rep = tx.init(params)
    opt_z = mesh_mod.zero1_place(m, tx.init(params))
    p_rep, p_z = params, params
    for _ in range(3):
        p_rep, opt_rep = upd(p_rep, opt_rep, grads)
        p_z, opt_z = upd(p_z, opt_z, grads)

    for a, b in zip(jax.tree.leaves(p_rep), jax.tree.leaves(p_z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the big moment leaves are still sharded after 3 steps
    sharded = [x for x in jax.tree.leaves(opt_z)
               if hasattr(x, "sharding") and np.ndim(x) > 0
               and x.sharding.spec != P()
               and "data" in jax.tree.leaves(tuple(x.sharding.spec))]
    assert sharded, "no optimizer leaf stayed data-sharded"
    one = max(sharded, key=lambda x: x.size)
    assert len(one.addressable_shards) == 8
    assert one.addressable_shards[0].data.size == one.size // 8

    # per-chip optimizer bytes drop ~1/N for the shardable mass
    def bytes_on_dev0(t):
        tot = 0
        for x in jax.tree.leaves(t):
            if hasattr(x, "addressable_shards"):
                for s in x.addressable_shards:
                    if s.device == jax.devices()[0]:
                        tot += s.data.size * s.data.dtype.itemsize
            else:
                tot += np.asarray(x).nbytes
        return tot

    assert bytes_on_dev0(opt_z) < 0.5 * bytes_on_dev0(opt_rep)

    # end-to-end wiring: a real sharded-batch train step with ZeRO-1 state
    # matches the replicated-optimizer step.  Compare the FIRST-STEP Adam
    # moments, which are LINEAR in the gradients (mu=(1-b1)g, nu=(1-b2)g²)
    # - post-Adam params are ±lr with the sign of the gradient, and the
    # shift-invariant biases feeding BatchNorm have true gradient 0, so
    # their params read amplified float noise under ANY tolerance < lr
    # (same reasoning as the SGD choice in the DataParallel test above).
    step = steps.make_a2f_step(A2F_CFG, tx, donate=False)
    rng = np.random.default_rng(3)
    batch = mesh_mod.shard_batch(m, {
        "audio": rng.normal(size=(8, 12, 8)).astype(np.float32),
        "target": rng.normal(size=(8, 6, 6)).astype(np.float32)})
    st_rep = state_mod.create_state(params, tx)
    st_z = st_rep._replace(opt_state=mesh_mod.zero1_place(m, st_rep.opt_state))
    st_rep, _ = step(st_rep, batch)
    st_z, _ = step(st_z, batch)
    # optimizer-math equivalence is proven BITWISE above on synthesized
    # gradients; comparing real-step moments elementwise would only
    # re-measure the BN-bias cancellation noise (two different programs,
    # ~1e-3 gradient noise on true-zero-gradient leaves - see the DP-test
    # comment).  The wiring property to check here: the moments are
    # still data-sharded after consuming REAL gradients.
    still_sharded = [x for x in jax.tree.leaves(st_z.opt_state)
                     if hasattr(x, "sharding") and np.ndim(x) > 0
                     and x.sharding.spec != P()
                     and "data" in jax.tree.leaves(tuple(x.sharding.spec))]
    assert still_sharded, "real step lost the ZeRO-1 moment sharding"
    # params: every Adam step is bounded by ~lr, so 2.1*lr catches any
    # gross wiring error (e.g. an unapplied or double-applied update)
    for a, b in zip(jax.tree.leaves(st_rep.params),
                    jax.tree.leaves(st_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)


def test_zero1_place_is_idempotent_and_composes_with_model_sharding():
    """Re-applying zero1_place to an already-partitioned state is a no-op
    (the restore path calls it unconditionally), and on a hybrid mesh the
    data axis lands on a FREE dim, preserving an existing model-axis
    channel sharding."""
    m = mesh_mod.make_mesh(1)
    x = jnp.zeros((3, 3, 64, 128))
    once = mesh_mod.zero1_place(m, {"mu": x})
    twice = mesh_mod.zero1_place(m, once)
    assert once["mu"].sharding == twice["mu"].sharding
    assert "data" in jax.tree.leaves(tuple(once["mu"].sharding.spec))

    hy = mesh_mod.make_mesh(4)  # 2 data x 4 model
    base = jax.device_put(x, NamedSharding(hy, P(None, None, None, "model")))
    placed = mesh_mod.zero1_place(hy, {"mu": base})["mu"]
    assert placed.sharding.spec == P(None, None, "data", "model")
    again = mesh_mod.zero1_place(hy, {"mu": placed})["mu"]
    assert again.sharding.spec == placed.sharding.spec


def test_spatial_partitioned_renderer_matches_single_device():
    """Spatial partitioning (SP): sharding the image HEIGHT over the
    model axis must reproduce the unsharded renderer (GSPMD inserts the
    3x3 halo exchanges and strided-stage reshardings), stay sharded at
    the output, and compose with the data axis on the batch dim."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=64)
    params = feature2face.init_generator(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, cfg.input_nc))
    y_ref, _ = feature2face.apply_generator(params, x)

    m = mesh_mod.make_mesh(4)  # 2 data x 4 model
    xs = shard_mod.shard_spatial(m, x)
    assert xs.sharding.spec == P(None, "model", None, None)
    net = mesh_mod.replicate(m, params["net"])

    @jax.jit
    def fwd(net, inp):
        y, _ = feature2face.apply_generator({"net": net, "size": "normal"}, inp)
        return y

    y = fwd(net, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    # the output stays model-sharded: no implicit full gather
    assert "model" in jax.tree.leaves(tuple(y.sharding.spec))

    # SP composes with batch sharding over `data`
    xds = jax.device_put(x, NamedSharding(m, P("data", "model", None, None)))
    y2 = fwd(net, xds)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref), atol=2e-5)


def test_shard_batch_replicates_leading_dim1():
    """The shared-candidate diet emits cand_image [1, H, W, 12]; a dim-1
    leading axis cannot scatter over an 8-way data axis, so shard_batch
    must REPLICATE it (and f2f_g_input broadcasts it on device)."""
    m = mesh_mod.make_mesh(1)
    rng = np.random.default_rng(0)
    batch = {
        "feature_map": rng.uniform(0, 1, (8, 16, 16, 1)).astype(np.float32),
        "cand_image": rng.uniform(-1, 1, (1, 16, 16, 12)).astype(np.float32),
        "tgt_image": rng.integers(0, 256, (8, 16, 16, 3)).astype(np.uint8),
    }
    placed = mesh_mod.shard_batch(m, batch)
    assert placed["cand_image"].sharding.is_fully_replicated
    assert not placed["feature_map"].sharding.is_fully_replicated
    inp = steps.f2f_g_input(placed)
    assert inp.shape == (8, 16, 16, 13)
    tgt = steps.f2f_target(placed)
    assert tgt.dtype == jnp.float32 and float(tgt.max()) <= 1.0


def test_trainer_place_batch_caches_shared_cand():
    """_place_batch uploads the shared candidate tensor once per process:
    the SAME np array must come back as the SAME device buffer across
    batches (no 12.6 MB re-upload per step)."""
    from livespeechportraits_tpu.train import trainer

    cand = np.zeros((1, 8, 8, 12), np.float32)
    b1 = {"cand_image": cand, "tgt_image": np.zeros((8, 8, 8, 3), np.uint8)}
    b2 = {"cand_image": cand, "tgt_image": np.ones((8, 8, 8, 3), np.uint8)}
    p1 = trainer._place_batch(b1, None)
    p2 = trainer._place_batch(b2, None)
    assert p1["cand_image"] is p2["cand_image"]
    m = mesh_mod.make_mesh(1)
    q1 = trainer._place_batch(b1, m)
    q2 = trainer._place_batch(b2, m)
    assert q1["cand_image"] is q2["cand_image"]
    assert q1["cand_image"].sharding.is_fully_replicated
    assert not q1["tgt_image"].sharding.is_fully_replicated


def test_trainer_place_batch_caches_across_views():
    """The production samplers emit a FRESH [None] view of the one
    candidate array every epoch; the cache must key on the underlying
    buffer, not the view object, or every miss both re-uploads and
    retains a device copy (~12.6 MB each at 512^2 - the HBM leak that
    OOMed the round-4 800-step campaign at step ~140)."""
    from livespeechportraits_tpu.train import trainer

    base = np.zeros((8, 8, 12), np.float32)
    n0 = len(trainer._shared_cand_cache)
    placed = [trainer._place_batch(
        {"cand_image": base[None],  # distinct view object each call
         "tgt_image": np.zeros((4, 8, 8, 3), np.uint8)}, None)
        for _ in range(3)]
    assert placed[0]["cand_image"] is placed[1]["cand_image"]
    assert placed[1]["cand_image"] is placed[2]["cand_image"]
    assert len(trainer._shared_cand_cache) == n0 + 1


def test_multichip_rendering_pack4e_matches_single_device():
    """The pack4e entropy-coding epilogue (prefix-sum + scatter + prefix
    fetch) composes with frame-sharded rendering: GSPMD partitions the
    packing, and the decoded frames equal the single-device pack4e run
    BITWISE (both are lossless recodings of the same jpeg4 stream)."""
    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    audio = _sine_audio(0.7)
    ref = animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=8,
                              transfer="pack4e")
    mesh = mesh_mod.make_mesh(1)  # 8 data devices
    out = animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=8,
                              transfer="pack4e", mesh=mesh)
    np.testing.assert_array_equal(out.frames, ref.frames)

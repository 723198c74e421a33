"""Feature2Face generator/discriminator: shapes and torch-oracle parity for
all three generator variants (converted reference modules as oracles)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import Feature2FaceConfig
from livespeechportraits_tpu.models import feature2face

# 64x64 with 6 downsamplings keeps the innermost map 1x1 and the tests fast.
SMALL = Feature2FaceConfig(size="small", ngf=8, n_downsample=6, load_size=64)
NORMAL = Feature2FaceConfig(size="normal", ngf=8, n_downsample=6, load_size=64)
LARGE = Feature2FaceConfig(size="large", ngf=8, n_downsample=6, load_size=64)


@pytest.mark.parametrize("cfg", [SMALL, NORMAL, LARGE], ids=["small", "normal", "large"])
def test_generator_shapes(cfg):
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, cfg.input_nc))
    y, _ = feature2face.apply_generator(params, x)
    assert y.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range


def test_generator_bf16_path():
    params = feature2face.init_generator(jax.random.PRNGKey(0), NORMAL)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 13))
    y32, _ = feature2face.apply_generator(params, x)
    y16, _ = feature2face.apply_generator(params, x, compute_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32
    assert np.abs(np.asarray(y16 - y32)).max() < 0.1  # bf16 drift stays small


def test_discriminator_shapes():
    cfg = NORMAL
    params = feature2face.init_discriminator(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, cfg.input_nc + 3))
    results, _ = feature2face.apply_discriminator(params, x)
    assert len(results) == cfg.num_D
    for feats in results:
        assert len(feats) == cfg.n_layers_D + 2
    # scale 1 operates at half resolution
    assert results[1][0].shape[1] < results[0][0].shape[1]
    # final logits are 1-channel patch maps
    assert results[0][-1].shape[-1] == 1


def _make_ref_generator(torch, size, input_nc, ngf, num_downs):
    sys.path.insert(0, "/root/reference")
    try:
        import models.networks as ref_networks  # type: ignore
    finally:
        sys.path.pop(0)
    torch.manual_seed(0)
    if size == "small":
        net = ref_networks.Feature2FaceGenerator_Unet(
            input_nc=input_nc, output_nc=3, num_downs=num_downs, ngf=ngf)
    elif size == "normal":
        net = ref_networks.Feature2FaceGenerator_normal(
            input_nc=input_nc, output_nc=3, num_downs=num_downs, ngf=ngf)
    else:
        net = ref_networks.Feature2FaceGenerator_large(
            input_nc=input_nc, output_nc=3, num_downs=num_downs, ngf=ngf)
    net.eval()
    return net


@pytest.mark.parametrize("size", ["small", "normal", "large"])
def test_generator_matches_reference_torch(size):
    """Convert a reference generator's weights and compare outputs."""
    torch = pytest.importorskip("torch")
    from livespeechportraits_tpu.utils import torch_convert

    input_nc, ngf, num_downs, hw = 5, 8, 6, 64
    ref = _make_ref_generator(torch, size, input_nc, ngf, num_downs)
    sd = {"netG." + k if not k.startswith("model") else "netG." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = torch_convert.convert_feature2face_g(sd, size, num_downs=num_downs)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, hw, hw, input_nc)).astype(np.float32)
    ours, _ = feature2face.apply_generator(params, jnp.asarray(x))
    with torch.no_grad():
        out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        if size == "small":
            pass  # Unet variant applies tanh inside the outermost block
        out_ref = out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=5e-4)


def test_split_candidate_conv_matches_fused():
    """apply_generator_edge (per-subject cached candidate contribution)
    must match apply_generator on concat(edge, cand) up to float summation
    order, for all three generator sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from livespeechportraits_tpu.config import Feature2FaceConfig
    from livespeechportraits_tpu.models import feature2face as f2f

    rng = np.random.default_rng(0)
    for size, in_nc in (("small", 23), ("normal", 13), ("large", 13)):
        cfg = Feature2FaceConfig(size=size, ngf=8, n_downsample=5, load_size=32)
        assert cfg.input_nc == in_nc
        params = f2f.init_generator(jax.random.PRNGKey(1), cfg)
        edge = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
        cand = jnp.asarray(rng.uniform(-1, 1, (32, 32, in_nc - 1)), jnp.float32)

        fused_in = jnp.concatenate(
            [edge, jnp.broadcast_to(cand, (2,) + cand.shape)], axis=-1)
        ref, _ = f2f.apply_generator(params, fused_in, training=False)

        cand_down = f2f.precompute_cand_down(params, cand)
        out = f2f.apply_generator_edge(params, edge, cand_down, training=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=0)


def test_quantized_conv_close_to_float():
    """nn_core.quantize_conv + conv2d dispatch: the int8 layer reproduces
    the float conv within combined weight+activation quantization noise
    (~1/127 per operand)."""
    from livespeechportraits_tpu.models import nn_core

    key = jax.random.PRNGKey(0)
    p = nn_core.conv2d_init(key, 32, 48, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32))
    y = nn_core.conv2d(p, x, padding=1)
    yq = nn_core.conv2d(nn_core.quantize_conv(p), x, padding=1)
    ref = float(jnp.sqrt(jnp.mean(y ** 2)))
    err = float(jnp.sqrt(jnp.mean((y - yq) ** 2)))
    assert err < 0.03 * ref, (err, ref)


def test_quantized_generator_fidelity():
    """int8 renderer vs float renderer: high-PSNR agreement on the tanh
    output, and the quantized tree really is int8 in the interior while
    the outermost down/up convs stay float (split-candidate fast path
    must keep working)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    y, _ = feature2face.apply_generator(params, x)

    qparams = feature2face.quantize_generator(params)
    assert qparams["net"]["sub"]["down"]["w_q"].dtype == jnp.int8
    assert "w" in qparams["net"]["down"] and "w" in qparams["net"]["up"]
    yq, _ = feature2face.apply_generator(qparams, x)

    mse = float(jnp.mean((y - yq) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # [-1, 1] range
    assert psnr > 28.0, psnr
    assert mse > 0  # actually quantized, not a pass-through

    # bf16 activation path runs too
    yqb, _ = feature2face.apply_generator(qparams, x, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(yqb)).all()

    # split-candidate fast path on the quantized tree (per-subject
    # constant candidates, [H, W, 12])
    edge = x[..., :1]
    cand = x[0, ..., 1:]
    x_shared = jnp.concatenate(
        [edge, jnp.broadcast_to(cand, (2,) + cand.shape)], axis=-1)
    yq_shared, _ = feature2face.apply_generator(qparams, x_shared)
    cand_down = feature2face.precompute_cand_down(qparams, cand)
    ye = feature2face.apply_generator_edge(qparams, edge, cand_down)
    mse_e = float(jnp.mean((ye - yq_shared) ** 2))
    assert 10 * np.log10(4.0 / max(mse_e, 1e-12)) > 40.0

    with pytest.raises(NotImplementedError):
        feature2face.quantize_generator(
            feature2face.init_generator(
                jax.random.PRNGKey(2),
                Feature2FaceConfig(size="small", ngf=4, n_downsample=5,
                                   load_size=32)))


def test_fold_bn_generator_matches_unfolded():
    """BN folding must be an exact algebraic rewrite of the eval-mode
    forward, for the float tree and the int8-quantized tree alike."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(3), cfg)
    # make the running stats non-trivial so folding has real work to do
    import jax as _jax

    def _noise(p, i=[0]):
        def walk(d):
            if isinstance(d, dict):
                if "mean" in d and "var" in d:
                    i[0] += 1
                    k = _jax.random.PRNGKey(i[0])
                    d = dict(d,
                             mean=0.3 * _jax.random.normal(k, d["mean"].shape),
                             var=jnp.exp(0.5 * _jax.random.normal(k, d["var"].shape)))
                    return d
                return {k2: walk(v) for k2, v in d.items()}
            if isinstance(d, list):
                return [walk(v) for v in d]
            return d
        return walk(p)

    params = _noise(params)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)

    y, _ = feature2face.apply_generator(params, x)
    yf, _ = feature2face.apply_generator(feature2face.fold_bn_generator(params), x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y), atol=2e-5)

    qp = feature2face.quantize_generator(params)
    yq, _ = feature2face.apply_generator(qp, x)
    yqf, _ = feature2face.apply_generator(feature2face.fold_bn_generator(qp), x)
    np.testing.assert_allclose(np.asarray(yqf), np.asarray(yq), atol=2e-5)


def test_calibrated_static_int8_matches_dynamic_on_calib_batch():
    """Activation-static int8: calibrating on batch X and then running the
    static forward on X reproduces the dynamic-quantization forward (the
    scales are by construction the same numbers; the two programs fuse
    differently so the float BN/relu chains between convs can differ at
    the last f32 bit, observed <= 2e-9) - which also proves the
    calibration walk visits convs in exact forward order (a misordered
    scale would flip whole int8 grid steps, ~1e-2 here)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(10), cfg)
    qp = feature2face.quantize_generator(params)
    x = jax.random.uniform(jax.random.PRNGKey(11), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    y_dyn, _ = feature2face.apply_generator(qp, x)

    cp = feature2face.calibrate_generator(qp, x)
    # every interior conv carries a static scale; the float outermost pair
    # does not
    assert "x_scale" in cp["net"]["sub"]["down"]
    assert "x_scale" in cp["net"]["res_down"][0]["conv1"]
    assert "x_scale" not in cp["net"]["down"]
    y_sta, _ = feature2face.apply_generator(cp, x)
    np.testing.assert_allclose(np.asarray(y_sta), np.asarray(y_dyn),
                               atol=1e-7, rtol=0)


def test_calibrated_static_int8_generalizes():
    """Scales calibrated on one batch keep fidelity on unseen inputs (the
    serving situation), in f32 and bf16, and on the split-candidate edge
    path; works on a BN-folded tree too (the deployment composition)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(12), cfg)
    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    calib = jax.random.uniform(jax.random.PRNGKey(13), (4, 32, 32, cfg.input_nc),
                               minval=-1, maxval=1)
    cp = feature2face.calibrate_generator(qp, calib, compute_dtype=jnp.bfloat16)

    x = jax.random.uniform(jax.random.PRNGKey(14), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    y_float, _ = feature2face.apply_generator(params, x)
    y_sta, _ = feature2face.apply_generator(cp, x)
    mse = float(jnp.mean((y_float - y_sta) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 26.0, mse

    y_bf16, _ = feature2face.apply_generator(cp, x, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(y_bf16)).all()

    # split-candidate edge path shares the interior convs and scales
    edge, cand = x[..., :1], x[0, ..., 1:]
    x_shared = jnp.concatenate(
        [edge, jnp.broadcast_to(cand, (2,) + cand.shape)], axis=-1)
    y_shared, _ = feature2face.apply_generator(cp, x_shared)
    cand_down = feature2face.precompute_cand_down(cp, cand)
    y_edge = feature2face.apply_generator_edge(cp, edge, cand_down)
    mse_e = float(jnp.mean((y_edge - y_shared) ** 2))
    assert 10 * np.log10(4.0 / max(mse_e, 1e-12)) > 40.0, mse_e

    # multi-batch calibration takes the elementwise max over batches
    cp2 = feature2face.calibrate_generator(qp, [calib, x])
    s1 = cp["net"]["sub"]["down"]["x_scale"]
    s2 = cp2["net"]["sub"]["down"]["x_scale"]
    assert float(s2) >= 0 and np.isfinite(float(s1))


def test_subpixel_upconv_matches_upsample_conv():
    """nn_core.upconv_subpixel on the rewritten kernel reproduces
    conv2d(upsample_nearest_2x(x)) exactly (up to float summation)."""
    from livespeechportraits_tpu.models import nn_core

    key = jax.random.PRNGKey(20)
    p = nn_core.conv2d_init(key, 24, 16, 3)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 9, 7, 24))
    ref = nn_core.conv2d(p, nn_core.upsample_nearest_2x(x), padding=1)
    out = nn_core.upconv_subpixel(nn_core.subpixel_from_conv3x3(p), x)
    assert out.shape == ref.shape == (2, 18, 14, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_subpixel_generator_float_equivalence():
    """subpixel_generator rewrites every up conv; the float forward is
    unchanged (tanh output agrees to float-noise)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(22), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(23), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    ref, _ = feature2face.apply_generator(params, x)
    sp = feature2face.subpixel_generator(params)
    assert "w_ph" in sp["net"]["up"] and "w" not in sp["net"]["up"]
    out, _ = feature2face.apply_generator(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # edge fast path still works on the rewritten tree
    edge, cand = x[..., :1], x[0, ..., 1:]
    cand_down = feature2face.precompute_cand_down(sp, cand)
    y_edge = feature2face.apply_generator_edge(sp, edge, cand_down)
    x_shared = jnp.concatenate(
        [edge, jnp.broadcast_to(cand, (2,) + cand.shape)], axis=-1)
    y_shared, _ = feature2face.apply_generator(sp, x_shared)
    np.testing.assert_allclose(np.asarray(y_edge), np.asarray(y_shared),
                               atol=1e-5)


def test_subpixel_generator_on_quantized_tree():
    """The deployment composition quantize -> fold_bn -> calibrate ->
    subpixel keeps fidelity vs the float forward, in f32 and bf16."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(24), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(25), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    ref, _ = feature2face.apply_generator(params, x)

    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    qp = feature2face.calibrate_generator(qp, x)
    sp = feature2face.subpixel_generator(qp)
    # outermost up conv is float by design; interior ups are int8 phases
    assert "w_ph" in sp["net"]["up"]
    assert sp["net"]["sub"]["up"]["w_ph_q"].dtype == jnp.int8
    assert "x_scale" in sp["net"]["sub"]["up"]
    out, _ = feature2face.apply_generator(sp, x)
    mse = float(jnp.mean((ref - out) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 26.0, mse

    out_b, _ = feature2face.apply_generator(sp, x, compute_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(out_b)).all()


def test_s2d_input_conv_matches_strided_conv():
    """nn_core.conv_s2d_down == conv2d(stride=2, padding=1) exactly."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(30), 13, 64, 3)
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 32, 32, 13))
    ref = nn_core.conv2d(p, x, stride=2, padding=1)
    out = nn_core.conv_s2d_down(nn_core.s2d_from_conv3x3s2(p), x)
    assert out.shape == ref.shape == (2, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_s2d_input_generator_equivalence():
    """Full generator with the packed-input first conv matches baseline,
    composed with quantize+calibrate+subpixel (the deployment stack)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(32), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(33), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    ref, _ = feature2face.apply_generator(params, x)
    sp = feature2face.s2d_input_generator(params)
    assert "w_s2d" in sp["net"]["down"]
    out, _ = feature2face.apply_generator(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    qp = feature2face.calibrate_generator(qp, x)
    qp = feature2face.s2d_input_generator(feature2face.subpixel_generator(qp))
    out_q, _ = feature2face.apply_generator(qp, x, compute_dtype=jnp.bfloat16)
    mse = float(jnp.mean((ref - out_q.astype(jnp.float32)) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 24.0, mse


def test_subpixel_single_conv_variants():
    """mode='single' (one zero-structured 3x3 conv, 4x out channels) is
    float-exact vs baseline, for all ups and outermost-only, float and
    int8+calibrated."""
    from livespeechportraits_tpu.models import nn_core

    # layer-level exactness
    p = nn_core.conv2d_init(jax.random.PRNGKey(40), 24, 16, 3)
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 9, 7, 24))
    ref = nn_core.conv2d(p, nn_core.upsample_nearest_2x(x), padding=1)
    out = nn_core.upconv_subpixel1(nn_core.subpixel1_from_conv3x3(p), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(42), cfg)
    xg = jax.random.uniform(jax.random.PRNGKey(43), (2, 32, 32, cfg.input_nc),
                            minval=-1, maxval=1)
    refg, _ = feature2face.apply_generator(params, xg)
    for kwargs in ({"mode": "single"},
                   {"mode": "single", "outermost_only": True}):
        sp = feature2face.subpixel_generator(params, **kwargs)
        outg, _ = feature2face.apply_generator(sp, xg)
        np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                                   atol=1e-5)
    assert "w_sp1" in feature2face.subpixel_generator(
        params, mode="single", outermost_only=True)["net"]["up"]
    assert "w" in feature2face.subpixel_generator(
        params, mode="single", outermost_only=True)["net"]["sub"]["up"]

    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    qp = feature2face.calibrate_generator(qp, xg)
    sq = feature2face.subpixel_generator(qp, mode="single")
    assert sq["net"]["sub"]["up"]["w_sp1_q"].dtype == jnp.int8
    outq, _ = feature2face.apply_generator(sq, xg, compute_dtype=jnp.bfloat16)
    mse = float(jnp.mean((refg - outq.astype(jnp.float32)) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 24.0, mse


def test_subpixel_dilated_variant():
    """mode='dilated' (one lhs_dilation=2 transposed conv, no materialised
    upsample) is float-exact and composes with the int8 stack."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(50), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(51), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    ref, _ = feature2face.apply_generator(params, x)
    sp = feature2face.subpixel_generator(params, mode="dilated")
    assert "w_dl" in sp["net"]["up"]
    out, _ = feature2face.apply_generator(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    qp = feature2face.calibrate_generator(qp, x)
    sq = feature2face.subpixel_generator(qp, mode="dilated")
    assert sq["net"]["sub"]["up"]["w_dl_q"].dtype == jnp.int8
    outq, _ = feature2face.apply_generator(sq, x, compute_dtype=jnp.bfloat16)
    mse = float(jnp.mean((ref - outq.astype(jnp.float32)) ** 2))
    assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 24.0, mse


def test_upconv_split_matches_upsample_conv_on_concat():
    """nn_core.upconv_split == conv2d(upsample_nearest_2x(cat(a, b)))
    exactly (float up to summation order)."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(60), 24, 16, 3)
    a = jax.random.normal(jax.random.PRNGKey(61), (2, 9, 7, 12))
    b = jax.random.normal(jax.random.PRNGKey(62), (2, 9, 7, 12))
    cat = jnp.concatenate([a, b], axis=-1)
    ref = nn_core.conv2d(p, nn_core.upsample_nearest_2x(cat), padding=1)
    out = nn_core.upconv_split(nn_core.split_from_concat_conv(p, 12), a, b)
    assert out.shape == ref.shape == (2, 18, 14, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_split_skip_generator_float_equivalence():
    """split_skip_generator removes every skip concat; the float forward
    is unchanged, including the split-candidate edge fast path."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(63), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(64), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    ref, _ = feature2face.apply_generator(params, x)
    sp = feature2face.split_skip_generator(params)
    assert "w_a" in sp["net"]["up"] and "w" not in sp["net"]["up"]
    # the innermost up conv reads a single tensor: stays unsplit
    inner = sp["net"]
    while "sub" in inner:
        inner = inner["sub"]
    assert "w" in inner["up"]
    out, _ = feature2face.apply_generator(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    edge, cand = x[..., :1], x[0, ..., 1:]
    cand_down = feature2face.precompute_cand_down(sp, cand)
    y_edge = feature2face.apply_generator_edge(sp, edge, cand_down)
    x_shared = jnp.concatenate(
        [edge, jnp.broadcast_to(cand, (2,) + cand.shape)], axis=-1)
    y_shared, _ = feature2face.apply_generator(sp, x_shared)
    np.testing.assert_allclose(np.asarray(y_edge), np.asarray(y_shared),
                               atol=1e-5)


def test_split_skip_generator_int8_bit_identical():
    """On the quantized tree the split form matches the unsplit int8
    forward to float noise (shared x_scale, partials summed before the
    rescale), calibrated and uncalibrated, f32 and bf16.  The int32
    arithmetic is identical in exact integers; XLA:CPU lowers the int8
    conv through float accumulation, so reassociating the 2*C-channel
    sum into two C-channel partials leaves ~1e-8 noise (observed max
    1.5e-8 vs outputs O(1e-2)) - on the TPU MXU int8 path the sums are
    integer-exact."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(65), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(66), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)

    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    for calibrated in (False, True):
        q = feature2face.calibrate_generator(qp, x) if calibrated else qp
        sp = feature2face.split_skip_generator(q)
        assert sp["net"]["sub"]["up"]["w_a_q"].dtype == jnp.int8
        if calibrated:
            assert "x_scale" in sp["net"]["sub"]["up"]
        for dt in (None, jnp.bfloat16):
            ref, _ = feature2face.apply_generator(q, x, compute_dtype=dt)
            out, _ = feature2face.apply_generator(sp, x, compute_dtype=dt)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=2e-7 if dt is None else 1e-3)


def test_split_skip_calibrate_after_split_matches():
    """Calibrating the ALREADY-split tree records one joint amax per
    split conv (same protocol as unsplit) - the resulting scales match
    calibrate-then-split."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(67), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(68), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    qp = feature2face.fold_bn_generator(feature2face.quantize_generator(params))
    a = feature2face.split_skip_generator(feature2face.calibrate_generator(qp, x))
    b = feature2face.calibrate_generator(feature2face.split_skip_generator(qp), x)
    np.testing.assert_allclose(
        float(a["net"]["sub"]["up"]["x_scale"]),
        float(b["net"]["sub"]["up"]["x_scale"]), rtol=1e-6)
    ra, _ = feature2face.apply_generator(a, x)
    rb, _ = feature2face.apply_generator(b, x)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


# ---------------------------------------------------------------------------
# Quantization-aware training (nn_core.fake_quant_conv / f2f.qat_generator)
# ---------------------------------------------------------------------------


def test_fake_quant_conv_matches_int8_layer():
    """The STE fake-quant conv runs the SAME arithmetic as the deployed
    int8 layer (identical weight/activation scales; f32 accumulation vs
    int32 differs only in rounding)."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(0), 16, 24, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16))
    y_fq = nn_core.conv2d(nn_core.fake_quant_conv(p), x, padding=1)
    y_q8 = nn_core.conv2d(nn_core.quantize_conv(p), x, padding=1)
    np.testing.assert_allclose(np.asarray(y_fq), np.asarray(y_q8),
                               atol=1e-5, rtol=1e-5)
    # tagging an already-int8 layer is an error
    with pytest.raises(ValueError):
        nn_core.fake_quant_conv(nn_core.quantize_conv(p))


def test_qat_generator_matches_quantized_forward():
    """qat_generator's eval forward == quantize_generator's forward (up
    to accumulation rounding), and strip_qat_generator restores the
    exact float forward."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(10), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(11), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)

    qat = feature2face.qat_generator(params)
    assert feature2face.is_qat_generator(qat)
    assert not feature2face.is_qat_generator(params)
    # outermost convs stay untagged, mirroring quantize_generator
    assert "fq" not in qat["net"]["down"] and "fq" not in qat["net"]["up"]
    assert "fq" in qat["net"]["sub"]["down"]

    y_qat, _ = feature2face.apply_generator(qat, x, training=False)
    y_int8, _ = feature2face.apply_generator(
        feature2face.quantize_generator(params), x, training=False)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               atol=2e-4)

    stripped = feature2face.strip_qat_generator(qat)
    assert not feature2face.is_qat_generator(stripped)
    y_float, _ = feature2face.apply_generator(params, x, training=False)
    y_strip, _ = feature2face.apply_generator(stripped, x, training=False)
    np.testing.assert_array_equal(np.asarray(y_strip), np.asarray(y_float))


def test_qat_gradients_flow_through_ste():
    """Gradients reach the tagged float weights (STE) and are zero for
    the tag leaf itself (scales are stop-gradiented)."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(20), cfg)
    qat = feature2face.qat_generator(params)
    x = jax.random.uniform(jax.random.PRNGKey(21), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    tgt = jax.random.uniform(jax.random.PRNGKey(22), (2, 32, 32, 3),
                             minval=-1, maxval=1)

    def loss(net):
        y, _ = feature2face.apply_generator(
            {"net": net, "size": "normal"}, x, training=True)
        return jnp.mean((y - tgt) ** 2)

    grads = jax.grad(loss)(qat["net"])
    inner = grads["sub"]["down"]
    assert float(jnp.max(jnp.abs(inner["w"]))) > 0
    assert np.isfinite(np.asarray(inner["w"])).all()
    assert float(jnp.max(jnp.abs(grads["sub"]["res_down"][0]["conv1"]["w"]))) > 0
    assert float(jnp.abs(inner["fq"])) == 0.0


def test_qat_calibration_and_deploy_carry_scales():
    """calibrate_generator works on a QAT tree (same recording protocol);
    the baked x_scale leaves survive strip + quantize_conv into the
    deployed int8 tree, and the QAT forward with static scales matches
    the deployed static-scale forward."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(30), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(31), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)

    qat = feature2face.calibrate_generator(feature2face.qat_generator(params), x)
    assert "x_scale" in qat["net"]["sub"]["down"]

    deployed = feature2face.quantize_generator(
        feature2face.strip_qat_generator(qat))
    assert "x_scale" in deployed["net"]["sub"]["down"]
    np.testing.assert_allclose(
        float(qat["net"]["sub"]["down"]["x_scale"]),
        float(deployed["net"]["sub"]["down"]["x_scale"]))

    y_qat, _ = feature2face.apply_generator(qat, x, training=False)
    y_dep, _ = feature2face.apply_generator(deployed, x, training=False)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_dep), atol=2e-4)


def test_qat_finetune_improves_deployed_int8():
    """The point of QAT: fine-tuning against the fake-quant forward
    reduces the deployed int8 model's task loss below what post-training
    quantization of the same fine-tune achieves from the float path."""
    import optax

    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(40), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(41), (4, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)
    tgt = jax.random.uniform(jax.random.PRNGKey(42), (4, 32, 32, 3),
                             minval=-1, maxval=1)

    def task_loss_int8(float_net):
        q = feature2face.quantize_generator(
            {"net": float_net, "size": "normal"})
        y, _ = feature2face.apply_generator(q, x, training=False)
        return float(jnp.mean((y - tgt) ** 2))

    qat = feature2face.qat_generator(params)
    tx = optax.adam(1e-3)

    @jax.jit
    def step(net, opt):
        def loss(n):
            y, new = feature2face.apply_generator(
                {"net": n, "size": "normal"}, x, training=True)
            return jnp.mean((y - tgt) ** 2), new["net"]

        (l, _), g = jax.value_and_grad(loss, has_aux=True)(net)
        upd, opt = tx.update(g, opt, net)
        return optax.apply_updates(net, upd), opt, l

    net, opt = qat["net"], tx.init(qat["net"])
    l0 = None
    for _ in range(40):
        net, opt, l = step(net, opt)
        if l0 is None:
            l0 = float(l)
    l_end = float(l)
    assert l_end < l0  # the fake-quant objective itself trains

    before = task_loss_int8(params["net"])
    after = task_loss_int8(feature2face.strip_qat_generator(
        {"net": net, "size": "normal"})["net"])
    assert after < before, (after, before)


# ---------------------------------------------------------------------------
# QAT with the real int8 forward kernel (fake_quant_conv(int8_forward=True))
# ---------------------------------------------------------------------------


def test_fq8_conv_forward_bit_identical_to_deployed():
    """An fq8-tagged conv's forward is the deployed int8 layer's forward
    EXACTLY (same s8 x s8 -> s32 kernel, same scale expressions) - no
    f32-vs-int32 accumulation gap, unlike the float fake-quant emulation."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(0), 16, 24, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16))
    y_q8 = nn_core.conv2d(nn_core.quantize_conv(p), x, padding=1)
    y_fq8 = nn_core.conv2d(nn_core.fake_quant_conv(p, int8_forward=True), x,
                           padding=1)
    np.testing.assert_array_equal(np.asarray(y_fq8), np.asarray(y_q8))

    # static activation scale rides through identically
    ps = dict(p, x_scale=jnp.asarray(0.02, jnp.float32))
    y_q8s = nn_core.conv2d(nn_core.quantize_conv(ps), x, padding=1)
    y_fq8s = nn_core.conv2d(nn_core.fake_quant_conv(ps, int8_forward=True), x,
                            padding=1)
    np.testing.assert_array_equal(np.asarray(y_fq8s), np.asarray(y_q8s))

    # and under the bf16 production compute dtype: the deployed tree's
    # float leaves (w_scale, b) are cast to bf16 by apply_generator's
    # _cast_net, which the fq8 conv emulates from f32 master weights
    xb = x.astype(jnp.bfloat16)
    q8b = {k: (v.astype(jnp.bfloat16)
               if jnp.issubdtype(v.dtype, jnp.floating) else v)
           for k, v in nn_core.quantize_conv(p).items()}
    y_q8b = nn_core.conv2d(q8b, xb, padding=1)
    y_fq8b = nn_core.conv2d(nn_core.fake_quant_conv(p, int8_forward=True), xb,
                            padding=1)
    assert y_fq8b.dtype == y_q8b.dtype
    np.testing.assert_array_equal(np.asarray(y_fq8b, np.float32),
                                  np.asarray(y_q8b, np.float32))


def test_fq8_gradients_match_fake_quant_ste():
    """The custom-VJP backward reproduces the float fake-quant path's
    straight-through gradients (same conv of cotangents at the snapped
    values, scales stop-gradiented)."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(2), 8, 12, 3)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 10, 8))

    def grads_of(tagged):
        def loss(w, xx, b):
            pp = dict(tagged, w=w, b=b)
            y = nn_core.conv2d(pp, xx, padding=1)
            return jnp.sum(jnp.sin(y))

        return jax.grad(loss, argnums=(0, 1, 2))(tagged["w"], x, tagged["b"])

    gw_f, gx_f, gb_f = grads_of(nn_core.fake_quant_conv(p))
    gw_8, gx_8, gb_8 = grads_of(nn_core.fake_quant_conv(p, int8_forward=True))
    # forwards differ only by accumulation rounding, so the sin' cotangent
    # (and thus the grads) agree to float tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(gb_8), np.asarray(gb_f),
                               atol=1e-4, rtol=1e-4)
    # weight/activation grads: equal everywhere EXCEPT the entries sitting
    # exactly on the +-127 grid edge (each channel's max-|w|; the batch
    # amax of x under the dynamic scale), where the float emulation's
    # jnp.clip tie-splits and leaks only HALF the cotangent through; the
    # custom VJP passes the full straight-through gradient (documented in
    # nn_core._q8_ste_bwd)
    w = np.asarray(p["w"])
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    tie_w = np.abs(np.round(w / s_w)) >= 127
    s_x = np.abs(np.asarray(x)).max() / 127.0
    tie_x = np.abs(np.round(np.asarray(x) / s_x)) >= 127
    assert tie_w.any() and tie_x.any()
    gw_f, gw_8 = np.asarray(gw_f), np.asarray(gw_8)
    gx_f, gx_8 = np.asarray(gx_f), np.asarray(gx_8)
    np.testing.assert_allclose(gw_8[~tie_w], gw_f[~tie_w],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gw_8[tie_w], 2.0 * gw_f[tie_w],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gx_8[~tie_x], gx_f[~tie_x],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gx_8[tie_x], 2.0 * gx_f[tie_x],
                               atol=1e-4, rtol=1e-4)


def test_fq8_clip_mask_zeroes_saturated_activations():
    """With a static x_scale small enough to clip, saturated input
    positions get ZERO gradient (STE clip semantics), matching the float
    fake-quant path position for position."""
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(4), 4, 6, 3)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    s = float(jnp.max(jnp.abs(x))) / 300.0  # |x|/s up to ~300 >> 127
    ps = dict(p, x_scale=jnp.asarray(s, jnp.float32))

    def gx_of(tagged):
        def loss(xx):
            return jnp.sum(nn_core.conv2d(tagged, xx, padding=1))

        return jax.grad(loss)(x)

    gx_f = np.asarray(gx_of(nn_core.fake_quant_conv(ps)))
    gx_8 = np.asarray(gx_of(nn_core.fake_quant_conv(ps, int8_forward=True)))
    sat = np.abs(np.asarray(jnp.round(x / s))) > 127
    assert sat.any() and not sat.all()
    assert np.abs(gx_8[sat]).max() == 0.0
    assert np.abs(gx_f[sat]).max() == 0.0
    np.testing.assert_allclose(gx_8, gx_f, atol=1e-5)


def test_qat_int8_generator_matches_deployed_bitwise():
    """qat_generator(int8_forward=True) eval forward == the deployed
    quantize_generator forward bit for bit (interior convs run the same
    int8 kernel; BN/outer convs are shared float code), and the tree
    still trains (STE grads reach the weights) and calibrates."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(50), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(51), (2, 32, 32, cfg.input_nc),
                           minval=-1, maxval=1)

    qat8 = feature2face.qat_generator(params, int8_forward=True)
    assert feature2face.is_qat_generator(qat8)
    assert feature2face.qat_tag_mode(qat8) == "fq8"
    assert feature2face.qat_tag_mode(feature2face.qat_generator(params)) == "fq"
    assert feature2face.qat_tag_mode(params) is None

    y_qat8, _ = feature2face.apply_generator(qat8, x, training=False)
    y_int8, _ = feature2face.apply_generator(
        feature2face.quantize_generator(params), x, training=False)
    np.testing.assert_array_equal(np.asarray(y_qat8), np.asarray(y_int8))

    # bit-identical under the bf16 production compute dtype too
    y_qat8b, _ = feature2face.apply_generator(qat8, x, training=False,
                                              compute_dtype=jnp.bfloat16)
    y_int8b, _ = feature2face.apply_generator(
        feature2face.quantize_generator(params), x, training=False,
        compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(y_qat8b, np.float32),
                                  np.asarray(y_int8b, np.float32))

    # strip removes fq8 tags too
    stripped = feature2face.strip_qat_generator(qat8)
    assert not feature2face.is_qat_generator(stripped)
    y_float, _ = feature2face.apply_generator(params, x, training=False)
    y_strip, _ = feature2face.apply_generator(stripped, x, training=False)
    np.testing.assert_array_equal(np.asarray(y_strip), np.asarray(y_float))

    # gradients flow (jitted, as the train step runs it)
    tgt = jax.random.uniform(jax.random.PRNGKey(52), (2, 32, 32, 3))

    @jax.jit
    def gfn(net):
        def loss(n):
            y, _ = feature2face.apply_generator(
                {"net": n, "size": "normal"}, x, training=True)
            return jnp.mean((y - tgt) ** 2)

        return jax.grad(loss)(net)

    grads = gfn(qat8["net"])
    inner = grads["sub"]["down"]
    assert float(jnp.max(jnp.abs(inner["w"]))) > 0
    assert np.isfinite(np.asarray(inner["w"])).all()
    assert float(jnp.abs(inner["fq8"])) == 0.0

    # calibration records through the fq8 tree (float-emulation fallback)
    cal = feature2face.calibrate_generator(qat8, x)
    assert "x_scale" in cal["net"]["sub"]["down"]
    dep = feature2face.quantize_generator(feature2face.strip_qat_generator(cal))
    y_dep, _ = feature2face.apply_generator(dep, x, training=False)
    y_cal, _ = feature2face.apply_generator(cal, x, training=False)
    np.testing.assert_array_equal(np.asarray(y_cal), np.asarray(y_dep))


def test_fake_quant_conv_refuses_double_tag_and_calibrate_precondition():
    from livespeechportraits_tpu.models import nn_core

    p = nn_core.conv2d_init(jax.random.PRNGKey(0), 4, 6, 3)
    tagged = nn_core.fake_quant_conv(p)
    with pytest.raises(ValueError, match="already carries"):
        nn_core.fake_quant_conv(tagged, int8_forward=True)

    cfg = Feature2FaceConfig(size="normal", ngf=4, n_downsample=5, load_size=32)
    params = feature2face.init_generator(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, cfg.input_nc))
    with pytest.raises(ValueError, match="no quantized or QAT-tagged"):
        feature2face.calibrate_generator(params, x)


def test_orthogonal_init_widening_shapes():
    from livespeechportraits_tpu.models import nn_core

    for shape in ((3, 3, 3, 64), (8, 64), (64, 8), (3, 3, 64, 32)):
        w = nn_core.orthogonal_init(jax.random.PRNGKey(0), shape)
        assert w.shape == shape
        flat = np.asarray(w).reshape(-1, shape[-1]) / 0.02
        # orthonormal columns (or rows for widening layers)
        if flat.shape[0] >= flat.shape[1]:
            g = flat.T @ flat
        else:
            g = flat @ flat.T
        np.testing.assert_allclose(g, np.eye(g.shape[0]), atol=1e-4)


def test_bn_scale_init_matches_reference_distribution():
    """init_weights draws BatchNorm scale from N(1, 0.02)
    (networks.py:373-375): the generator/discriminator BN scales must not
    all be exactly 1."""
    cfg = Feature2FaceConfig(size="normal", ngf=8, n_downsample=5, load_size=32)
    g = feature2face.init_generator(jax.random.PRNGKey(0), cfg)
    d = feature2face.init_discriminator(jax.random.PRNGKey(1), cfg)
    for tree in (g["net"], d):
        scales = []

        def walk(p):
            if isinstance(p, dict):
                if "mean" in p and "scale" in p:  # BN params
                    scales.append(np.asarray(p["scale"]))
                for v in p.values():
                    walk(v)
            elif isinstance(p, list):
                for v in p:
                    walk(v)

        walk(tree)
        assert scales
        flat = np.concatenate([s.ravel() for s in scales])
        assert np.abs(flat - 1.0).max() > 1e-3  # actually noisy
        assert abs(flat.mean() - 1.0) < 0.02
        assert 0.005 < flat.std() < 0.05

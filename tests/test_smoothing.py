import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter1d as scipy_gaussian

from livespeechportraits_tpu.ops import smoothing


def test_gaussian_filter_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 7)).astype(np.float32)
    for sigma in [0.5, 1.5, 5.0]:
        ours = np.asarray(smoothing.gaussian_filter1d(jnp.asarray(x), sigma))
        ref = scipy_gaussian(x, sigma, axis=0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_landmark_smooth_3d_matches_reference_composition():
    """'only_mouth' smooths mouth separately then overwrites into the
    globally smoothed array (funcs/utils.py:252-259)."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(40, 73, 3)).astype(np.float32)
    sigma = 1.5
    ours = np.asarray(smoothing.landmark_smooth_3d(jnp.asarray(pts), sigma, "only_mouth"))

    mouth = scipy_gaussian(pts[:, 46:64].reshape(-1, 18 * 3), sigma, axis=0).reshape(-1, 18, 3)
    ref = scipy_gaussian(pts.reshape(-1, 73 * 3), sigma, axis=0).reshape(-1, 73, 3)
    ref[:, 46:64] = mouth
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # sigma=0 is identity
    np.testing.assert_allclose(
        np.asarray(smoothing.landmark_smooth_3d(jnp.asarray(pts), 0.0)), pts
    )


def test_mouth_amp_xyz():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(10, 73, 3)).astype(np.float32)
    out = np.asarray(smoothing.mouth_amp(jnp.asarray(pts), True, "XYZ", [2.0, 2.0, 2.0]))
    np.testing.assert_allclose(out[:, 46:64], pts[:, 46:64] * 2.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, :46], pts[:, :46], rtol=1e-6)


def test_mouth_amp_xy_delta():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(6, 73, 3)).astype(np.float32)
    out = np.asarray(smoothing.mouth_amp(jnp.asarray(pts), True, "XY", [3.0, 0.5]))
    np.testing.assert_allclose(out[:, 46:64, 0], pts[:, 46:64, 0] * 3.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, 46:64, 1], pts[:, 46:64, 1] * 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[:, 46:64, 2], pts[:, 46:64, 2], rtol=1e-6)

    out2 = np.asarray(smoothing.mouth_amp(jnp.asarray(pts), True, "delta", [0.5, 0.5]))
    ref = pts.copy()
    ref[1:, 46:64] += 0.5 * (pts[1:, 46:64] - pts[:-1, 46:64])
    np.testing.assert_allclose(out2, ref, rtol=1e-5)


def test_solve_intersect_mouth_fixes_flip():
    pts = np.zeros((4, 73, 3), np.float32)
    # frame 1: lower inner lip above upper inner lip (flip)
    for idx in smoothing.UPPER_INNER_LIP:
        pts[1, idx, 1] = -1.0
    for idx in smoothing.LOWER_INNER_LIP:
        pts[1, idx, 1] = 1.0
    out = np.asarray(smoothing.solve_intersect_mouth(jnp.asarray(pts)))
    # after the fix, inner lips meet at y=0 for the flipped frame
    for idx in smoothing.UPPER_INNER_LIP:
        assert abs(out[1, idx, 1]) < 1e-6
    for idx in smoothing.LOWER_INNER_LIP:
        assert abs(out[1, idx, 1]) < 1e-6
    # untouched frames stay identical
    np.testing.assert_allclose(out[0], pts[0])
    np.testing.assert_allclose(out[2:], pts[2:])
    # outer lips of the flipped frame moved by the mean overlap (=1)
    for idx in smoothing.UPPER_OUTER_LIP:
        assert abs(out[1, idx, 1] - 1.0) < 1e-6


def test_headpose_smooth():
    rng = np.random.default_rng(4)
    hp = rng.normal(size=(30, 6)).astype(np.float32)
    out = np.asarray(smoothing.headpose_smooth(jnp.asarray(hp), (2.0, 8.0)))
    ref_rot = scipy_gaussian(hp[:, :3], 2.0, axis=0)
    ref_trans = scipy_gaussian(hp[:, 3:], 8.0, axis=0)
    np.testing.assert_allclose(out[:, :3], ref_rot, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], ref_trans, atol=1e-5)

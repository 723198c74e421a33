import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from livespeechportraits_tpu.ops import geometry


def test_euler_to_rotation_matches_scipy():
    rng = np.random.default_rng(0)
    angles = rng.uniform(-90, 90, size=(16, 3)).astype(np.float32)
    ours = np.asarray(geometry.euler_to_rotation(jnp.asarray(angles)))
    # Reference convention (funcs/utils.py:182-207): R = Rz @ Ry @ Rx with
    # intrinsic-looking extrinsic composition = scipy 'xyz' extrinsic.
    ref = Rotation.from_euler("xyz", angles, degrees=True).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotation_orthonormal():
    angles = jnp.asarray([[10.0, -20.0, 30.0]])
    R = np.asarray(geometry.euler_to_rotation(angles))[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(R) - 1) < 1e-6


def test_euler_grad_matches_finite_difference():
    a = jnp.asarray([5.0, -3.0, 12.0])
    R, grads = geometry.euler_to_rotation_grad(a)
    eps = 1e-3
    for axis in range(3):
        da = np.zeros(3, np.float32)
        da[axis] = eps
        Rp = np.asarray(geometry.euler_to_rotation(a + da))
        Rm = np.asarray(geometry.euler_to_rotation(a - da))
        fd = (Rp - Rm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[axis]), fd, atol=1e-3)


def test_project_landmarks_identity_camera():
    """With identity pose/viewpoint and K=I, projection = pts/z."""
    K = jnp.eye(3)
    R = jnp.eye(3)
    T0 = jnp.zeros(3)
    pts = jnp.asarray([[[1.0, 2.0, 4.0], [0.5, 0.5, 2.0]]])
    pose = jnp.asarray([[0.0, 0, 0, 0, 0, 0]])
    p2d = np.asarray(geometry.project_landmarks(K, R, T0, 1.0, pose, pts))
    np.testing.assert_allclose(p2d[0, 0], [0.25, 0.5], atol=1e-6)
    np.testing.assert_allclose(p2d[0, 1], [0.25, 0.25], atol=1e-6)


def test_project_landmarks_against_reference_formula():
    """Cross-check the batched projection against a per-frame numpy oracle
    implementing demo.py:239-244 / funcs/utils.py:231-242."""
    rng = np.random.default_rng(3)
    Tn, N = 5, 73
    K = np.array([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1]], np.float32)
    poses = np.concatenate(
        [rng.uniform(-30, 30, (Tn, 3)), rng.uniform(-5, 5, (Tn, 2)), rng.uniform(80, 120, (Tn, 1))],
        axis=1,
    ).astype(np.float32)
    pts = rng.normal(0, 1, (Tn, N, 3)).astype(np.float32)
    scale = 1.7

    ours = np.asarray(
        geometry.project_landmarks(jnp.asarray(K), jnp.eye(3), jnp.zeros(3), scale,
                                   jnp.asarray(poses), jnp.asarray(pts))
    )
    for t in range(Tn):
        rot = Rotation.from_euler("xyz", poses[t, :3], degrees=True).as_matrix()
        p3 = scale * rot @ pts[t].T + poses[t, 3:][:, None]
        uvw = K @ p3
        ref = (uvw[:2] / uvw[2]).T
        # float32 device math vs float64 oracle: sub-pixel agreement
        np.testing.assert_allclose(ours[t], ref, rtol=2e-3, atol=0.5)


def test_project_shoulders():
    K = jnp.asarray(np.array([[1000.0, 0, 256], [0, 1000.0, 256], [0, 0, 1]], np.float32))
    sh3d = jnp.asarray(np.random.default_rng(0).normal(0, 1, (18, 3)).astype(np.float32) + np.array([0, 0, 100]))
    trans = jnp.asarray([[0.0, 0.0, 100.0], [1.0, 2.0, 100.0]])
    ref_trans = jnp.asarray([0.0, 0.0, 100.0])
    p2d, p3d = geometry.project_shoulders(K, sh3d, trans, ref_trans, 0.5)
    assert p2d.shape == (2, 18, 2) and p3d.shape == (2, 18, 3)
    # frame 0 has zero diff => p3d == shoulder3D
    np.testing.assert_allclose(np.asarray(p3d[0]), np.asarray(sh3d), atol=1e-6)
    # frame 1 shifted by 0.5 * (1, 2, 0)
    np.testing.assert_allclose(np.asarray(p3d[1]) - np.asarray(sh3d), np.tile([0.5, 1.0, 0.0], (18, 1)), atol=1e-5)


def test_camera_intrinsic_scaling():
    cam = geometry.Camera(fx=1000, fy=1000, cx=256, cy=256)
    M = np.array([[0.5, 0, 10], [0, 0.5, 20], [0, 0, 1]], np.float32)
    cam2 = cam.scaled(M)
    assert cam2.fx == 500 and cam2.cx == 138 and cam2.cy == 148

"""3D head geometry: Euler rotations, landmark projection, camera.

Capability parity with funcs/utils.py:15-56 (camera), 182-227
(angle2matrix), 231-242 (project_landmarks) - re-designed batched: the
reference projects one frame per Python-loop iteration (demo.py:239-244);
here every frame of an utterance is rotated/projected in a single fused jit
call (two einsum contractions on the MXU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Camera:
    """Pinhole camera intrinsics (funcs/utils.py:15-56).

    The reference's viewpoint transform defaults to identity R / zero T
    (utils.py:22-23); both are kept as explicit parameters here.
    """

    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0

    @property
    def intrinsic(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    def scaled(self, transform: np.ndarray) -> "Camera":
        """Apply a 3x3 image-space transform to the intrinsics
        (utils.py:48-56)."""
        s = float(transform[0, 0])
        return Camera(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=s * self.cx + float(transform[0, 2]),
            cy=s * self.cy + float(transform[1, 2]),
        )


def euler_to_rotation(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (degrees, x=pitch / y=yaw / z=roll) -> rotation matrices.

    Batched equivalent of funcs/utils.py:182-207: R = Rz @ Ry @ Rx,
    right-handed.  [..., 3] -> [..., 3, 3].
    """
    rad = jnp.deg2rad(angles_deg)
    x, y, z = rad[..., 0], rad[..., 1], rad[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    # Rows of R = Rz @ Ry @ Rx, expanded analytically.
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def euler_to_rotation_grad(angles_deg: jnp.ndarray):
    """(R, [dR/dx, dR/dy, dR/dz]) like utils.py:210-227 gradient='true'.

    Provided for API parity; under JAX the analytic gradient also falls out
    of jax.jacfwd(euler_to_rotation).  Batched [T, 3] input vmaps the
    per-frame jacobian (a full jacfwd would produce cross-batch axes and
    O(T^2) work).
    """
    R = euler_to_rotation(angles_deg)
    if angles_deg.ndim == 1:
        jac = jax.jacfwd(euler_to_rotation)(angles_deg)  # [3,3,3]
    else:
        jac = jax.vmap(jax.jacfwd(euler_to_rotation))(angles_deg)
    return R, [jac[..., 0], jac[..., 1], jac[..., 2]]


@jax.jit
def project_landmarks(
    camera_intrinsic: jnp.ndarray,
    viewpoint_R: jnp.ndarray,
    viewpoint_T: jnp.ndarray,
    scale: jnp.ndarray,
    headposes: jnp.ndarray,
    pts_3d: jnp.ndarray,
) -> jnp.ndarray:
    """Project 3D landmarks to 2D for a whole utterance at once.

    Batched equivalent of funcs/utils.py:231-242 (called per-frame at
    demo.py:239-244):
        p3d = scale * R(pose[:3]) @ pts + pose[3:]
        p3d = viewpoint_R @ p3d + viewpoint_T
        p2d = K @ p3d; p2d /= z

    Args:
        camera_intrinsic: [3, 3]
        viewpoint_R / viewpoint_T: [3, 3] / [3]
        scale: scalar reconstruction scale (id_scale.mat, demo.py:108)
        headposes: [T, 6] (deg rot xyz, trans xyz)
        pts_3d: [T, N, 3] (or [N, 3], broadcast over T)
    Returns:
        [T, N, 2] pixel coordinates.
    """
    headposes = jnp.atleast_2d(headposes)
    if pts_3d.ndim == 2:
        pts_3d = jnp.broadcast_to(pts_3d[None], (headposes.shape[0],) + pts_3d.shape)
    rot = euler_to_rotation(headposes[:, :3])  # [T, 3, 3]
    trans = headposes[:, 3:]  # [T, 3]
    p = scale * jnp.einsum("tij,tnj->tni", rot, pts_3d) + trans[:, None, :]
    p = jnp.einsum("ij,tnj->tni", viewpoint_R, p) + viewpoint_T[None, None, :]
    uvw = jnp.einsum("ij,tnj->tni", camera_intrinsic, p)
    return uvw[..., :2] / uvw[..., 2:3]


@jax.jit
def project_shoulders(
    camera_intrinsic: jnp.ndarray,
    shoulder3D: jnp.ndarray,
    headpose_trans: jnp.ndarray,
    ref_trans: jnp.ndarray,
    shoulder_amp: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deduce upper-body motion from head translation and project.

    Batched equivalent of demo.py:246-255: shoulders follow the head's
    translation offset scaled by shoulder_AMP, then a plain pinhole divide.

    Args:
        shoulder3D: [S, 3] reference 3D shoulder points
        headpose_trans: [T, 3] predicted head translations
        ref_trans: [3] reference translation (trans[1], demo.py:100)
    Returns:
        ([T, S, 2] projected points, [T, S, 3] 3D points).
    """
    diff = (headpose_trans - ref_trans[None]) * shoulder_amp  # [T, 3]
    p3d = shoulder3D[None] + diff[:, None, :]  # [T, S, 3]
    uvw = jnp.einsum("ij,tnj->tni", camera_intrinsic, p3d)
    return uvw[..., :2] / uvw[..., 2:3], p3d

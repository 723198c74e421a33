"""Motion post-processing: temporal smoothing, amplitude scaling,
lip de-intersection.

Capability parity with funcs/utils.py:246-367.  The reference runs these on
CPU with scipy; here each is a vectorised jnp op (one conv per smoothing
pass) so the whole post-processing stage stays on device between the motion
generators and the renderer.  `gaussian_filter1d` reproduces
scipy.ndimage.gaussian_filter1d's defaults exactly (truncate=4.0, reflect
boundary) - golden-tested against scipy in tests/test_smoothing.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Landmark-group index constants (funcs/utils.py:267-273).
MOUTH_RANGE = (46, 64)
UPPER_OUTER_LIP = tuple(range(47, 52))
UPPER_INNER_LIP = (63, 62, 61)
LOWER_INNER_LIP = (58, 59, 60)
LOWER_OUTER_LIP = tuple(range(57, 52, -1))
LOWER_MOUTH = (53, 54, 55, 56, 57, 58, 59, 60)
UPPER_MOUTH = (46, 47, 48, 49, 50, 51, 52, 61, 62, 63)


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible discrete Gaussian kernel."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter1d(x: jnp.ndarray, sigma: float, truncate: float = 4.0,
                      valid_len=None) -> jnp.ndarray:
    """Gaussian smoothing along axis 0 of [T, D] (scipy parity, mode='reflect').

    scipy's 'reflect' boundary duplicates the edge sample ([d c b a | a b c d]).

    valid_len (traced int scalar, optional): treat only rows [0, valid_len)
    as the signal (the rest is bucket padding, serve.py).  The reflect
    extension is built from the valid rows via the closed-form periodic
    reflect map, so rows >= valid_len are never read and outputs
    [0, valid_len) are bit-identical to filtering the unpadded signal -
    dynamic values, static shapes.
    """
    if sigma <= 0:
        return x
    kernel = jnp.asarray(_gaussian_kernel(sigma, truncate))
    radius = kernel.shape[0] // 2
    T = x.shape[0]
    i = np.arange(-radius, T + radius)
    if valid_len is None:
        # scipy 'reflect' (a.k.a. symmetric): indices reflect at the edges;
        # closed form of the repeated reflection is a period-2T triangle.
        m = np.mod(i, 2 * T)
        idx = jnp.asarray(np.where(m < T, m, 2 * T - 1 - m))
    else:
        # max(., 1): a (traced) valid_len of 0 would mod by zero, which is
        # undefined; callers reject empty valid prefixes upstream, this
        # just keeps the compiled program well-defined for every input
        period = jnp.maximum(2 * valid_len, 1)
        m = jnp.mod(jnp.asarray(i), period)
        idx = jnp.where(m < valid_len, m, period - 1 - m)
    xp = x[idx]  # [T + 2r, D]
    # Correlate: out[t] = sum_j kernel[j] * xp[t + j]
    out = jax.vmap(
        lambda col: jnp.convolve(col, kernel[::-1], mode="valid"), in_axes=1, out_axes=1
    )(xp.astype(jnp.float32))
    return out.astype(x.dtype)


def landmark_smooth_3d(
    pts3d: jnp.ndarray, smooth_sigma: float = 0.0, area: str = "only_mouth",
    valid_len=None,
) -> jnp.ndarray:
    """Temporal Gaussian smoothing of [T, 73, 3] landmarks
    (funcs/utils.py:246-263).

    'only_mouth' smooths the mouth block independently *before* the global
    pass and then re-inserts it, matching the reference's ordering.
    valid_len: see gaussian_filter1d (bucket padding exactness).
    """
    if smooth_sigma == 0:
        return pts3d
    T = pts3d.shape[0]
    if area == "all":
        return gaussian_filter1d(pts3d.reshape(T, -1), smooth_sigma,
                                 valid_len=valid_len).reshape(pts3d.shape)
    if area != "only_mouth":
        raise ValueError(f"unknown smoothing area {area!r}")
    m0, m1 = MOUTH_RANGE
    mouth = pts3d[:, m0:m1, :].reshape(T, -1)
    mouth = gaussian_filter1d(mouth, smooth_sigma, valid_len=valid_len).reshape(T, m1 - m0, 3)
    smoothed = gaussian_filter1d(pts3d.reshape(T, -1), smooth_sigma,
                                 valid_len=valid_len).reshape(pts3d.shape)
    return smoothed.at[:, m0:m1, :].set(mouth)


def mouth_amp(
    pts3d: jnp.ndarray,
    is_delta: bool = True,
    method: str = "XY",
    params: Sequence[float] = (1.0, 1.0),
) -> jnp.ndarray:
    """Mouth-region amplitude scaling (funcs/utils.py:274-325).

    Methods: 'XY' | 'delta' | 'XYZ' | 'LowerMore' | 'CloseSmall', applied to
    delta-landmarks ([T, 73, 3]) exactly as the reference does.
    """
    m0, m1 = MOUTH_RANGE
    p = list(params)
    if method == "XY":
        ax, ay = p
        if is_delta:
            pts3d = pts3d.at[:, m0:m1, 0].multiply(ax)
            pts3d = pts3d.at[:, m0:m1, 1].multiply(ay)
        else:
            mean_xy = pts3d[:, m0:m1, :2].mean(axis=0)  # [18, 2]
            pts3d = pts3d.at[:, m0:m1, 0].add((ax - 1) * (pts3d[:, m0:m1, 0] - mean_xy[:, 0]))
            pts3d = pts3d.at[:, m0:m1, 1].add((ay - 1) * (pts3d[:, m0:m1, 1] - mean_xy[:, 1]))
    elif method == "delta":
        ax = p[0]
        if is_delta:
            diff = ax * (pts3d[1:, m0:m1] - pts3d[:-1, m0:m1])
            pts3d = pts3d.at[1:, m0:m1].add(diff)
    elif method == "XYZ":
        ax, ay, az = p
        if is_delta:
            pts3d = pts3d.at[:, m0:m1, :].multiply(jnp.asarray([ax, ay, az]))
    elif method == "LowerMore":
        ux, uy, uz, lx, ly, lz = p
        if is_delta:
            up = jnp.asarray(UPPER_MOUTH)
            lo = jnp.asarray(LOWER_MOUTH)
            pts3d = pts3d.at[:, up, :].multiply(jnp.asarray([ux, uy, uz]))
            pts3d = pts3d.at[:, lo, :].multiply(jnp.asarray([lx, ly, lz]))
    elif method == "CloseSmall":
        ox, oy, oz, cx, cy, cz = p
        up = jnp.asarray(UPPER_MOUTH)
        lo = jnp.asarray(LOWER_MOUTH)
        # Per-frame open/closed classification (vectorised; the reference
        # loops frames and - buggily - rescales *all* frames whenever one is
        # closed, utils.py:313-323.  We implement the intended per-frame op.)
        open_score = (pts3d[:, up, 1] > 0).sum(axis=1) + (pts3d[:, lo, 1] < 0).sum(axis=1)
        is_open = (open_score > 16 * 0.3)[:, None, None]
        open_scale = jnp.asarray([ox, oy, oz])
        close_scale = jnp.asarray([cx, cy, cz])
        scale = jnp.where(is_open, open_scale, close_scale)
        pts3d = pts3d.at[:, m0:m1, :].multiply(scale)
    else:
        raise ValueError(f"unknown AMP method {method!r}")
    return pts3d


@jax.jit
def solve_intersect_mouth(pts3d: jnp.ndarray, valid=None) -> jnp.ndarray:
    """De-intersect flipped lips after aggressive AMP
    (funcs/utils.py:330-357).

    A frame is 'flipped' when all three inner lower-lip points sit above the
    inner upper-lip points; affected frames get half the overlap pushed back
    into each lip, outer lips moved by the mean overlap.  Vectorised with a
    per-frame mask (no data-dependent indexing, jit-safe).

    `valid` ([T] bool, optional) excludes padded tail rows from the global
    flipped-frame statistic so a bucket-padded sequence reproduces the
    unpadded sequence's outputs exactly (serve length bucketing).
    """
    ui = jnp.asarray(UPPER_INNER_LIP)
    li = jnp.asarray(LOWER_INNER_LIP)
    uo = jnp.asarray(UPPER_OUTER_LIP)
    lo = jnp.asarray(LOWER_OUTER_LIP)

    upper_y = pts3d[:, ui, 1]  # [T, 3]
    lower_y = pts3d[:, li, 1]
    flip = (lower_y > upper_y).sum(axis=1) == 3  # [T]
    if valid is not None:
        flip = flip & valid
    diff_half = (lower_y - upper_y) * 0.5  # [T, 3]

    # The reference computes the outer-lip shift as the mean over *all*
    # flipped frames' overlaps (utils.py:352), a global statistic.
    n_flip = jnp.maximum(flip.sum(), 1)
    global_mean = (diff_half * flip[:, None]).sum() / (n_flip * diff_half.shape[1])

    fmask = flip[:, None]
    pts3d = pts3d.at[:, ui, 1].add(jnp.where(fmask, diff_half, 0.0))
    pts3d = pts3d.at[:, li, 1].add(jnp.where(fmask, -diff_half, 0.0))
    pts3d = pts3d.at[:, uo, 1].add(jnp.where(fmask, global_mean, 0.0))
    pts3d = pts3d.at[:, lo, 1].add(jnp.where(fmask, -global_mean, 0.0))
    return pts3d


def headpose_smooth(
    headpose: jnp.ndarray, smooth_sigmas: Tuple[float, float] = (0.0, 0.0),
    valid_len=None,
) -> jnp.ndarray:
    """Smooth [T, 6] headpose: rot with sigma[0], trans with sigma[1]
    (funcs/utils.py:361-367).  valid_len: see gaussian_filter1d."""
    rot_sigma, trans_sigma = smooth_sigmas
    rot = gaussian_filter1d(headpose[:, :3], rot_sigma, valid_len=valid_len)
    trans = gaussian_filter1d(headpose[:, 3:], trans_sigma, valid_len=valid_len)
    return jnp.concatenate([rot, trans], axis=1)

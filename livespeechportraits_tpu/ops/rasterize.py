"""Landmark -> edge feature-map rasterisation.

Capability parity with FaceDataset.draw_face_feature_maps /
draw_shoulder_points (datasets/face_dataset.py:301-323): the 73 facial
landmarks are connected into 8 polyline part groups plus 2 shoulder
polylines and drawn as 2-px-wide white lines on a 512x512 canvas.

The reference rasterises with cv2.line on the CPU inside the per-frame
render loop (demo.py:260-265).  Here the primary path is a vectorised
device rasteriser (`rasterize_feature_maps`): every (pixel, segment)
point-to-segment distance is evaluated in one jit (a lax.scan over segments
keeps peak memory at one [H, W] tile per step), batched over frames - so
the conditional input of the renderer never leaves the TPU.  A cv2/numpy
host fallback (`rasterize_feature_map_host`) reproduces the reference
bit-exactly for parity testing.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# Facial part polylines (datasets/face_dataset.py:34-42).
PART_LIST: Tuple[Tuple[Tuple[int, ...], ...], ...] = (
    (tuple(range(0, 15)),),  # contour
    ((15, 16, 17, 18, 18, 19, 20, 15),),  # right eyebrow
    ((21, 22, 23, 24, 24, 25, 26, 21),),  # left eyebrow
    (tuple(range(35, 44)),),  # nose
    ((27, 65, 28, 68, 29), (29, 67, 30, 66, 27)),  # right eye
    ((33, 69, 32, 72, 31), (31, 71, 34, 70, 33)),  # left eye
    (tuple(range(46, 53)), (52, 53, 54, 55, 56, 57, 46)),  # mouth
    ((46, 63, 62, 61, 52), (52, 60, 59, 58, 46)),  # tongue
)
MOUTH_OUTER: Tuple[int, ...] = (46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 46)


def face_segments() -> np.ndarray:
    """[S, 2] landmark-index pairs for every face line segment."""
    segs: List[Tuple[int, int]] = []
    for group in PART_LIST:
        for edge in group:
            for a, b in zip(edge[:-1], edge[1:]):
                segs.append((a, b))
    return np.asarray(segs, dtype=np.int32)


_FACE_SEGMENTS = face_segments()


def shoulder_segments(n_points: int) -> np.ndarray:
    """[S, 2] index pairs for the two shoulder polylines
    (face_dataset.py:301-309: points split into 2 rows of n/2)."""
    half = n_points // 2
    segs = [(i * half + j, i * half + j + 1) for i in range(2) for j in range(half - 1)]
    # < 4 points yield no segments; keep the [0, 2] shape so callers can
    # still index segs[:, 0] without a special case
    return np.asarray(segs, dtype=np.int32).reshape(-1, 2)


def _segment_endpoints(
    landmarks: jnp.ndarray, shoulders: jnp.ndarray | None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-frame segment endpoints [T, S, 2] (int-cast like cv2)."""
    # trunc, not floor: cv2/int() truncate toward ZERO, so a -0.5
    # endpoint must become 0, not -1 (host/device parity at the border)
    lm = jnp.trunc(landmarks).astype(jnp.float32)
    p1 = lm[:, _FACE_SEGMENTS[:, 0], :]
    p2 = lm[:, _FACE_SEGMENTS[:, 1], :]
    if shoulders is not None and shoulders.shape[1] > 1:
        segs = shoulder_segments(shoulders.shape[1])
        sh = jnp.trunc(shoulders).astype(jnp.float32)
        p1 = jnp.concatenate([p1, sh[:, segs[:, 0], :]], axis=1)
        p2 = jnp.concatenate([p2, sh[:, segs[:, 1], :]], axis=1)
    return p1, p2


@functools.partial(jax.jit, static_argnames=("height", "width", "radius"))
def rasterize_segments(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    height: int = 512,
    width: int = 512,
    radius: float = 1.5,
) -> jnp.ndarray:
    """Draw line segments as a white-on-black edge map, batched over frames.

    A pixel lights up when its distance to any segment is <= radius
    (radius 1.5 calibrated to cv2 thickness 2: IoU ~0.95).  Args p1/p2: [T, S, 2] (x, y) endpoint
    coords.  Returns [T, H, W] float32 in {0, 1}.
    """
    T, S, _ = p1.shape
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]

    def seg_body(canvas, seg):
        a, b = seg  # [T, 2] each
        ax, ay = a[:, 0, None, None], a[:, 1, None, None]  # [T,1,1]
        bx, by = b[:, 0, None, None], b[:, 1, None, None]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        px = xs[None] - ax  # [T, H, W] via broadcast
        py = ys[None] - ay
        t = jnp.where(len2 > 0, (px * dx + py * dy) / jnp.maximum(len2, 1e-12), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        d2 = (px - t * dx) ** 2 + (py - t * dy) ** 2
        canvas = jnp.maximum(canvas, (d2 <= radius * radius).astype(jnp.float32))
        return canvas, None

    init = jnp.zeros((T, height, width), jnp.float32)
    canvas, _ = jax.lax.scan(seg_body, init, (p1.transpose(1, 0, 2), p2.transpose(1, 0, 2)))
    return canvas


def rasterize_feature_maps(
    landmarks: jnp.ndarray,
    shoulders: jnp.ndarray | None = None,
    size: Tuple[int, int] = (512, 512),
) -> jnp.ndarray:
    """[T, 73, 2] landmarks (+[T, S2, 2] shoulders) -> [T, H, W] edge maps
    in [0, 1] (the /255 of face_dataset.py:280 folded in)."""
    h, w = size
    p1, p2 = _segment_endpoints(landmarks, shoulders)
    return rasterize_segments(p1, p2, height=h, width=w)


# ---------------------------------------------------------------------------
# Host (cv2) reference path - bit-exact parity with the reference rasteriser
# ---------------------------------------------------------------------------


def rasterize_feature_map_host(
    landmarks: np.ndarray,
    shoulders: np.ndarray | None = None,
    size: Tuple[int, int] = (512, 512),
) -> np.ndarray:
    """Single-frame cv2.line rasteriser (face_dataset.py:301-323 semantics).

    Returns [H, W] uint8 in {0, 255}.  Used for golden tests and as a
    host-side fallback when no device is available.
    """
    w, h = size
    img = np.zeros((h, w), np.uint8)
    if cv2 is None:  # pragma: no cover
        on = np.asarray(
            rasterize_feature_maps(jnp.asarray(landmarks)[None],
                                   None if shoulders is None else jnp.asarray(shoulders)[None],
                                   (h, w))[0]  # device fn takes (H, W); this fn takes cv2's (w, h)
        )
        return (on * 255).astype(np.uint8)
    for a, b in _FACE_SEGMENTS:
        pt1 = tuple(int(v) for v in landmarks[a])
        pt2 = tuple(int(v) for v in landmarks[b])
        img = cv2.line(img, pt1, pt2, 255, 2)
    if shoulders is not None:
        for a, b in shoulder_segments(shoulders.shape[0]):
            pt1 = tuple(int(v) for v in shoulders[a])
            pt2 = tuple(int(v) for v in shoulders[b])
            img = cv2.line(img, pt1, pt2, 255, 2)
    return img


def facial_weight_mask(points: np.ndarray, h: int = 512, w: int = 512) -> np.ndarray:
    """Mouth-region training weight mask (face_dataset.py:234-242):
    fillPoly over the outer-mouth polygon, dilated by a 45x45 box."""
    mask = np.zeros((h, w, 1), np.float32)
    poly = np.int32(points[list(MOUTH_OUTER)])
    if cv2 is not None:
        mask = cv2.fillPoly(mask, [poly], (255, 0, 0))
        mask = cv2.dilate(mask, np.ones((45, 45))) / 255.0
        return mask.astype(np.float32)
    # numpy fallback: bounding-box approximation of the dilated polygon.
    x0, y0 = poly.min(axis=0) - 22
    x1, y1 = poly.max(axis=0) + 22
    out = np.zeros((h, w), np.float32)
    # clamp ENDS too: a fully off-canvas polygon gives negative x1/y1,
    # which would wrap around and fill almost the whole row/column span
    out[max(y0, 0) : max(y1, 0), max(x0, 0) : max(x1, 0)] = 1.0
    return out

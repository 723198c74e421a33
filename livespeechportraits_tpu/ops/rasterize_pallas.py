"""Pallas TPU kernel for landmark->edge-map rasterisation.

The XLA path (ops/rasterize.py) scans 88 segments sequentially, each step
re-materialising a full [T, H, W] canvas in HBM - ~70 ms for an 8-frame
batch, comparable to the 512^2 renderer itself.  This kernel keeps one
(row-tile x W) canvas slab in VMEM per grid step and folds all segments
into it with VPU max-accumulation, so HBM sees each output pixel exactly
once.

Grid: (frame, H / TILE_H).  Inputs are the per-frame segment endpoint
table [T, S, 4] (ax, ay, bx, by) - padded to a fixed S with degenerate
off-screen segments so shapes stay static.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from livespeechportraits_tpu.ops import rasterize as rast_xla

# Pad segment tables to a lane-friendly width.
SEG_PAD = 128
TILE_H = 128
# Full-width tiles measured fastest at 512^2 (column tiling doubles the
# grid-step overhead for less culling win than row tiling already gives);
# the kernel supports narrower tiles for wider canvases.
TILE_W = 512


def _kernel(seg_ref, out_ref, *, radius: float, n_seg: int, tile_h: int, tile_w: int):
    """One (frame, row-tile, col-tile) program: fold every segment into
    the tile.

    Segments whose x/y bounding box misses this tile are skipped with a
    scalar branch (faces cluster spatially, so most segments touch only a
    couple of tiles)."""
    tile_row = pl.program_id(1)
    tile_col = pl.program_id(2)
    y0 = tile_row * tile_h
    x0 = tile_col * tile_w
    # tpu.iota only produces integers; cast to f32 afterwards.
    ys = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32) + jnp.float32(y0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32) + jnp.float32(x0)

    r2 = jnp.float32(radius * radius)
    y_lo = jnp.float32(y0) - jnp.float32(radius)
    y_hi = jnp.float32(y0 + tile_h - 1) + jnp.float32(radius)
    x_lo = jnp.float32(x0) - jnp.float32(radius)
    x_hi = jnp.float32(x0 + tile_w - 1) + jnp.float32(radius)

    def body(s, acc):
        ax = seg_ref[0, s, 0]
        ay = seg_ref[0, s, 1]
        bx = seg_ref[0, s, 2]
        by = seg_ref[0, s, 3]

        def hit(_):
            dx = bx - ax
            dy = by - ay
            len2 = dx * dx + dy * dy
            px = xs - ax
            py = ys - ay
            t = jnp.where(len2 > 0, (px * dx + py * dy) / jnp.maximum(len2, 1e-12), 0.0)
            t = jnp.clip(t, 0.0, 1.0)
            ex = px - t * dx
            ey = py - t * dy
            d2 = ex * ex + ey * ey
            return jnp.maximum(acc, jnp.where(d2 <= r2, 1.0, 0.0))

        touches_y = jnp.logical_and(jnp.maximum(ay, by) >= y_lo,
                                    jnp.minimum(ay, by) <= y_hi)
        touches_x = jnp.logical_and(jnp.maximum(ax, bx) >= x_lo,
                                    jnp.minimum(ax, bx) <= x_hi)
        return jax.lax.cond(jnp.logical_and(touches_y, touches_x),
                            hit, lambda _: acc, None)

    acc = jax.lax.fori_loop(0, n_seg, body, jnp.zeros((tile_h, tile_w), jnp.float32))
    out_ref[0, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("height", "width", "radius", "interpret")
)
def rasterize_segments_pallas(
    segments: jnp.ndarray,
    height: int = 512,
    width: int = 512,
    radius: float = 1.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """segments: [T, S, 4] float32 (ax, ay, bx, by; S <= SEG_PAD, padded by
    the caller or here) -> [T, H, W] float32 in {0, 1}."""
    T, S, _ = segments.shape
    if S > SEG_PAD:
        raise ValueError(
            f"{S} segments exceed the kernel's SEG_PAD={SEG_PAD}: raise "
            "SEG_PAD (block shape) rather than silently dropping the tail")
    if S < SEG_PAD:
        pad = jnp.full((T, SEG_PAD - S, 4), -1e6, segments.dtype)
        segments = jnp.concatenate([segments, pad], axis=1)
    tile_h = min(TILE_H, height)
    tile_w = min(TILE_W, width)
    n_rows = -(-height // tile_h)
    n_cols = -(-width // tile_w)

    kernel = functools.partial(
        _kernel, radius=radius, n_seg=SEG_PAD, tile_h=tile_h, tile_w=tile_w
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, height, width), jnp.float32),
        grid=(T, n_rows, n_cols),
        in_specs=[
            pl.BlockSpec((1, SEG_PAD, 4), lambda t, i, j: (t, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, tile_w), lambda t, i, j: (t, i, j),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(segments)


def segment_table(
    landmarks: jnp.ndarray, shoulders: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """[T, 73, 2] (+shoulders) -> [T, S, 4] endpoint table (cv2 int-cast
    parity like the XLA path)."""
    p1, p2 = rast_xla._segment_endpoints(landmarks, shoulders)
    return jnp.concatenate([p1, p2], axis=-1)  # [T, S, 4]


def rasterize_feature_maps_pallas(
    landmarks: jnp.ndarray,
    shoulders: Optional[jnp.ndarray] = None,
    size: Tuple[int, int] = (512, 512),
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas variant of rasterize.rasterize_feature_maps."""
    h, w = size
    segs = segment_table(landmarks, shoulders)
    return rasterize_segments_pallas(segs, height=h, width=w, interpret=interpret)


def supports_pallas() -> bool:
    """Compiled Pallas path needs a real TPU backend."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False

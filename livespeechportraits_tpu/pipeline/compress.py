"""Device-side JPEG-class frame compression for thin-link egress.

The render pipeline's frames leave the chip as raw planar YUV 4:2:0
(~0.4 MB each at 512^2).  Over any thin host link - and this harness's
~8 MB/s loopback relay is exactly that - raw egress caps the deliverable
frame rate far below the device pipeline's.  The reference itself never
ships raw frames: its demo writes per-frame jpgs
(/root/reference/demo.py:35-45, util/visualizer.py:120-143).

This module is the TPU-native equivalent: a JPEG-class transform coder
that runs INSIDE the render program, so what crosses the link is already
compressed:

- 8x8 block DCT as two batched 8x8 matmuls (einsum -> MXU);
- JPEG Annex-K quantization tables, libjpeg quality scaling;
- zigzag ZONAL selection: keep the first K_y (luma) / K_c (chroma)
  zigzag coefficients per block.  Fixed K keeps every shape static
  (XLA-friendly: no data-dependent output sizes), at the cost of a
  bounded-quality rather than bounded-rate code - the right trade for a
  fidelity-gated serving path (the PSNR gate below picks K).
- DC always quantizes with step 8: the centered DC range [-1024, 1016]
  then maps EXACTLY onto int8 - no DC clipping ever.

Host-side decode (numpy) dequantizes, inverse-DCTs and hands planes to
the existing yuv420_to_rgb.  bytes/frame at (K_y=16, K_c=6) is
0.273 B/px vs yuv420's 1.5 - a 5.5x egress cut; quality stays gated by
the same >30 dB PSNR bar the yuv420 path ships under
(tests/test_compress.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu import native as _native

# JPEG Annex-K base quantization tables (the spec's example tables, used
# by libjpeg and virtually every encoder).
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)

_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def zigzag_order() -> np.ndarray:
    """The 64 (row, col) flat indices in JPEG zigzag order."""
    out = []
    for s in range(15):
        js = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in js]
        if s % 2 == 1:
            diag = diag[::-1]
        out.extend(diag)
    return np.array([i * 8 + j for i, j in out], np.int64)


_ZIGZAG = zigzag_order()

# Serving defaults: quality/K chosen so the jpeg transfer clears the same
# >30 dB PSNR gate as yuv420 with ~4x margin on rendered frames
# (tests/test_compress.py) at ~0.27 B/px.  Override per call; these are
# read at call time so a process can retune before tracing.
DEFAULT_QUALITY = 75
DEFAULT_K_Y = 16
DEFAULT_K_C = 6

# pack4 ('jpeg4') defaults: 4-bit AC nibbles + per-block shift (below).
# K must be odd (K-1 AC nibbles pack in pairs).  At (13, 5): 37,888 B per
# 512^2 frame = 0.145 B/px - 2.05x under the int8 zonal code, 10.4x under
# yuv420 - while staying over the same >30 dB PSNR serving gate
# (tests/test_compress.py).
DEFAULT_P4_K_Y = 13
DEFAULT_P4_K_C = 5


def _p4_defaults(quality, k_y, k_c):
    return (DEFAULT_QUALITY if quality is None else quality,
            DEFAULT_P4_K_Y if k_y is None else k_y,
            DEFAULT_P4_K_C if k_c is None else k_c)


def _defaults(quality, k_y, k_c):
    return (DEFAULT_QUALITY if quality is None else quality,
            DEFAULT_K_Y if k_y is None else k_y,
            DEFAULT_K_C if k_c is None else k_c)


def dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: coefficients = D @ x @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return (d * 0.5).astype(np.float32)


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table; DC step floored at 8 so
    the centered DC range [-1024, 1016] always fits int8 exactly."""
    q = int(quality)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    t = np.floor((base * scale + 50.0) / 100.0).clip(1, 255)
    t.flat[0] = max(t.flat[0], 8.0)
    return t.astype(np.float32)


def _plane_sizes(h: int, w: int, k_y: int, k_c: int) -> Tuple[int, int]:
    """(luma bytes, per-chroma-plane bytes) for one frame."""
    return (h // 8) * (w // 8) * k_y, (h // 16) * (w // 16) * k_c


def encoded_bytes_per_frame(h: int, w: int, k_y: int = None,
                            k_c: int = None) -> int:
    _, k_y, k_c = _defaults(None, k_y, k_c)
    ny, nc = _plane_sizes(h, w, k_y, k_c)
    return ny + 2 * nc


@functools.lru_cache(maxsize=None)
def _bd_dct(n: int, transpose: bool) -> np.ndarray:
    """Block-diagonal 8-point DCT operator of size n (kron(I, D) or
    kron(I, D^T)): applying it along a full image axis performs every
    block's 1-D DCT as ONE [n, n] matmul.  On TPU this keeps the DCT on
    the MXU with image-sized operands instead of (8, 8) inner dims, which
    serialize on the VPU's 2-D vector layout (the same lesson as the
    rasterizer kernel - see CLAUDE.md kernel-tuning notes)."""
    d = dct_matrix()
    return np.kron(np.eye(n // 8, dtype=np.float32), d.T if transpose else d)


def _encode_plane(plane: jnp.ndarray, qtab: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B, H, W] float (0..255) -> [B, nblocks*k] int8 zonal DCT code.

    qtab is the [8, 8] quantization table.  The 2-D blockwise DCT is two
    image-sized block-diagonal matmuls (see _bd_dct); quantization
    happens in-plane (elementwise, fuses), so the only small-dim work is
    the final int8 gather.
    """
    B, H, W = plane.shape
    m_col = jnp.asarray(_bd_dct(H, False), plane.dtype)   # rows <- D
    m_row = jnp.asarray(_bd_dct(W, True), plane.dtype)    # cols <- D^T
    x = plane - 128.0
    coef = jnp.einsum("kh,bhw->bkw", m_col, x) @ m_row    # [B, H, W]
    qplane = jnp.tile(qtab.astype(plane.dtype), (H // 8, W // 8))
    q = jnp.round(coef / qplane).clip(-128, 127).astype(jnp.int8)
    blocks = q.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(B, -1, 64)
    zz = jnp.take(blocks, jnp.asarray(_ZIGZAG[:k]), axis=-1)  # [B, nb, k]
    return zz.reshape(B, -1)


def _decode_plane(code: np.ndarray, qvec: np.ndarray, h: int, w: int,
                  k: int) -> np.ndarray:
    """[B, nblocks*k] int8 -> [B, h, w] float plane (0..255, unclipped)."""
    B = code.shape[0]
    nb = (h // 8) * (w // 8)
    zz = code.reshape(B, nb, k).astype(np.float32) * qvec
    c = np.zeros((B, nb, 64), np.float32)
    c[:, :, _ZIGZAG[:k]] = zz
    c = c.reshape(B, h // 8, w // 8, 8, 8)
    d = dct_matrix()
    x = np.einsum("ai,bhwac,cj->bhiwj", d, c, d, optimize=True) + 128.0
    return x.reshape(B, h, w)


def _zig_qvec(base: np.ndarray, quality: int, k: int) -> np.ndarray:
    return quant_table(base, quality).reshape(-1)[_ZIGZAG[:k]]


@functools.lru_cache(maxsize=16)
def _dequant_idct_basis_cached(is_luma: bool, quality: int,
                               k: int) -> np.ndarray:
    """[k, 64] dequantize+iDCT operator: only the k kept zigzag
    coefficients are nonzero, so the whole per-block inverse collapses to
    ONE (nblocks, k) @ (k, 64) GEMM - x[i,j] = sum_k c_k q_k
    D[u_k,i] D[v_k,j].  Shared by the CPU-XLA decoders below and the
    native C++ decoder (livespeechportraits_tpu/native)."""
    base = _Q_LUMA if is_luma else _Q_CHROMA
    qvec = _zig_qvec(base, quality, k)
    d = dct_matrix()
    rows = []
    for kk in range(k):
        u, v = divmod(int(_ZIGZAG[kk]), 8)
        rows.append(np.outer(d[u], d[v]).reshape(64) * qvec[kk])
    return np.ascontiguousarray(np.stack(rows), np.float32)


def encode_yuv420(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                  quality: int = None, k_y: int = None,
                  k_c: int = None) -> jnp.ndarray:
    """Float YUV planes (Y [B,H,W], U/V [B,H/2,W/2], 0..255) -> one packed
    [B, bytes_per_frame] int8 buffer (single host fetch per batch)."""
    quality, k_y, k_c = _defaults(quality, k_y, k_c)
    qy = jnp.asarray(quant_table(_Q_LUMA, quality), y.dtype)
    qc = jnp.asarray(quant_table(_Q_CHROMA, quality), y.dtype)
    return jnp.concatenate([
        _encode_plane(y, qy, k_y),
        _encode_plane(u, qc, k_c),
        _encode_plane(v, qc, k_c),
    ], axis=1)


def decode_to_yuv(packed: np.ndarray, h: int, w: int, quality: int = None,
                  k_y: int = None, k_c: int = None):
    """Host-side inverse of encode_yuv420 -> (Y [B,h,w], U, V [B,h/2,w/2])
    uint8 planes, ready for animate.yuv420_to_rgb."""
    quality, k_y, k_c = _defaults(quality, k_y, k_c)
    ny, nc = _plane_sizes(h, w, k_y, k_c)
    qy = _zig_qvec(_Q_LUMA, quality, k_y)
    qc = _zig_qvec(_Q_CHROMA, quality, k_c)
    yb = _decode_plane(packed[:, :ny], qy, h, w, k_y)
    ub = _decode_plane(packed[:, ny:ny + nc], qc, h // 2, w // 2, k_c)
    vb = _decode_plane(packed[:, ny + nc:], qc, h // 2, w // 2, k_c)
    u8 = lambda p: np.clip(p + 0.5, 0, 255).astype(np.uint8)  # noqa: E731
    return u8(yb), u8(ub), u8(vb)


# ---------------------------------------------------------------------------
# pack4 ('jpeg4'): 4-bit AC packing with a per-block shift exponent.
#
# The int8 zonal code above spends 8 bits on every kept coefficient, but
# after JPEG table quantization most AC values in rendered-face content
# are tiny - except in the few hard-edge blocks.  Entropy coding (RLE /
# varint) would exploit that but needs data-dependent output sizes, which
# XLA cannot ship off-device.  The static-shape equivalent: per block,
# store the K-1 AC coefficients as 4-bit nibbles n = round(ac / 2^s) with
# ONE shared shift s = smallest exponent that fits the block's max |ac|
# (a micro block-exponent, like a shared-scale int4).  Flat blocks keep
# full precision (s=0); busy blocks trade precision exactly where JPEG's
# psychovisual model says masking hides it.  DC stays a full int8 (step
# >= 8, never clips).  Everything is static-shape device arithmetic; the
# host decoder below reverses it.
#
# Per-plane layout (nb = (H/8)*(W/8) blocks, K odd):
#   [B, nb]          DC bytes  (int8 stored as uint8 + 128)
#   [B, nb/2]        shift nibbles (two 4-bit block shifts per byte)
#   [B, nb*(K-1)/2]  AC nibbles (two 4-bit coefficients per byte)
# ---------------------------------------------------------------------------

_P4_MAX_SHIFT = 7  # 4-bit shift field; 7.5 * 2^7 = 960 covers every table
_P4E_SLOW_WARNED = False  # one-time pack4e python-fallback warning


def _plane_sizes_p4(h: int, w: int, k: int) -> int:
    nb = (h // 8) * (w // 8)
    return nb + nb // 2 + nb * (k - 1) // 2


def encoded_bytes_per_frame_p4(h: int, w: int, k_y: int = None,
                               k_c: int = None) -> int:
    _, k_y, k_c = _p4_defaults(None, k_y, k_c)
    return (_plane_sizes_p4(h, w, k_y)
            + 2 * _plane_sizes_p4(h // 2, w // 2, k_c))


def _zigzag_quant(plane: jnp.ndarray, qtab: jnp.ndarray,
                  k: int) -> jnp.ndarray:
    """[B, H, W] float (0..255) -> [B, nblocks, k] float table-quantized
    zigzag coefficients (the shared front half of every blockwise coder
    here: block-diagonal DCT matmuls, table quantization, zigzag gather)."""
    B, H, W = plane.shape
    m_col = jnp.asarray(_bd_dct(H, False), plane.dtype)
    m_row = jnp.asarray(_bd_dct(W, True), plane.dtype)
    x = plane - 128.0
    coef = jnp.einsum("kh,bhw->bkw", m_col, x) @ m_row
    qplane = jnp.tile(qtab.astype(plane.dtype), (H // 8, W // 8))
    q = jnp.round(coef / qplane)  # float, table-quantized integers
    blocks = q.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(B, -1, 64).astype(jnp.float32)
    return jnp.take(blocks, jnp.asarray(_ZIGZAG[:k]), axis=-1)  # [B, nb, k]


def _encode_plane_p4(plane: jnp.ndarray, qtab: jnp.ndarray,
                     k: int) -> jnp.ndarray:
    """[B, H, W] float (0..255) -> [B, _plane_sizes_p4] uint8 pack4 code."""
    if (k - 1) % 2:
        raise ValueError(f"pack4 K must be odd, got {k}")
    B = plane.shape[0]
    zz = _zigzag_quant(plane, qtab, k)  # [B, nb, k]
    dc = (jnp.clip(zz[..., 0], -128, 127) + 128.0).astype(jnp.uint8)
    ac = zz[..., 1:]  # [B, nb, k-1]
    m = jnp.max(jnp.abs(ac), axis=-1)  # [B, nb]
    # smallest s in [0, 7] with m <= 7.5 * 2^s (count thresholds passed)
    thresholds = 7.5 * (2.0 ** np.arange(_P4_MAX_SHIFT, dtype=np.float32))
    s = jnp.sum(m[..., None] > thresholds, axis=-1).astype(jnp.float32)
    n = jnp.clip(jnp.round(ac * jnp.exp2(-s)[..., None]), -8, 7) + 8.0
    n = n.astype(jnp.uint8)  # [B, nb, k-1] nibbles in 0..15
    nib = (n[..., 0::2] | (n[..., 1::2] << 4)).reshape(B, -1)
    su = s.astype(jnp.uint8)
    sbyte = su[:, 0::2] | (su[:, 1::2] << 4)  # [B, nb/2]
    return jnp.concatenate([dc.reshape(B, -1), sbyte, nib], axis=1)


def encode_yuv420_p4(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                     quality: int = None, k_y: int = None,
                     k_c: int = None) -> jnp.ndarray:
    """Float YUV planes -> one packed [B, bytes] uint8 pack4 buffer."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    qy = jnp.asarray(quant_table(_Q_LUMA, quality), y.dtype)
    qc = jnp.asarray(quant_table(_Q_CHROMA, quality), y.dtype)
    return jnp.concatenate([
        _encode_plane_p4(y, qy, k_y),
        _encode_plane_p4(u, qc, k_c),
        _encode_plane_p4(v, qc, k_c),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("quality", "k_y", "k_c"))
def _encode_rgb_frames_p4_jit(img, quality, k_y, k_c):
    y, u, v = rgb_to_yuv_planes(img)
    return encode_yuv420_p4(y, u, v, quality=quality, k_y=k_y, k_c=k_c)


def encode_rgb_frames_p4(img: jnp.ndarray, quality: int = None,
                         k_y: int = None, k_c: int = None) -> jnp.ndarray:
    """[B, H, W, 3] float in [-1, 1] -> packed pack4 code (device)."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    return _encode_rgb_frames_p4_jit(img, quality, k_y, k_c)


def _decode_plane_p4_np(code: np.ndarray, base: np.ndarray, quality: int,
                        h: int, w: int, k: int) -> np.ndarray:
    """Numpy reference inverse of _encode_plane_p4 (testing oracle)."""
    B = code.shape[0]
    nb = (h // 8) * (w // 8)
    dc = code[:, :nb].astype(np.float32) - 128.0
    sb = code[:, nb:nb + nb // 2]
    s = np.empty((B, nb), np.float32)
    s[:, 0::2] = (sb & 0xF).astype(np.float32)
    s[:, 1::2] = (sb >> 4).astype(np.float32)
    nibs = code[:, nb + nb // 2:]
    n = np.empty((B, nb, k - 1), np.float32)
    pairs = nibs.reshape(B, nb, (k - 1) // 2)
    n[..., 0::2] = (pairs & 0xF).astype(np.float32) - 8.0
    n[..., 1::2] = (pairs >> 4).astype(np.float32) - 8.0
    ac = n * np.exp2(s)[..., None]
    zz = np.concatenate([dc[..., None], ac], axis=-1)  # table-quantized ints
    qvec = _zig_qvec(base, quality, k)
    c = np.zeros((B, nb, 64), np.float32)
    c[:, :, _ZIGZAG[:k]] = zz * qvec
    c = c.reshape(B, h // 8, w // 8, 8, 8)
    d = dct_matrix()
    x = np.einsum("ai,bhwac,cj->bhiwj", d, c, d, optimize=True) + 128.0
    return x.reshape(B, h, w)


def decode_to_yuv_p4(packed: np.ndarray, h: int, w: int, quality: int = None,
                     k_y: int = None, k_c: int = None):
    """Numpy reference host decode -> uint8 (Y, U, V) planes."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    ny = _plane_sizes_p4(h, w, k_y)
    nc = _plane_sizes_p4(h // 2, w // 2, k_c)
    yb = _decode_plane_p4_np(packed[:, :ny], _Q_LUMA, quality, h, w, k_y)
    ub = _decode_plane_p4_np(packed[:, ny:ny + nc], _Q_CHROMA, quality,
                             h // 2, w // 2, k_c)
    vb = _decode_plane_p4_np(packed[:, ny + nc:], _Q_CHROMA, quality,
                             h // 2, w // 2, k_c)
    u8 = lambda p: np.clip(p + 0.5, 0, 255).astype(np.uint8)  # noqa: E731
    return u8(yb), u8(ub), u8(vb)


@functools.lru_cache(maxsize=8)
def _cpu_decoder_p4(h: int, w: int, quality: int, k_y: int, k_c: int):
    """Fused CPU-XLA pack4 decoder: unpack nibbles + per-block shift +
    dequantize+iDCT GEMM + color conversion in one program (same
    structure as _cpu_decoder; numpy reference pinned equal in
    tests/test_compress.py)."""
    by = jnp.asarray(_dequant_idct_basis_cached(True, quality, k_y))
    bc = jnp.asarray(_dequant_idct_basis_cached(False, quality, k_c))

    def plane(code, basis, hh, ww, k):
        B = code.shape[0]
        nb = (hh // 8) * (ww // 8)
        dc = code[:, :nb].astype(jnp.float32) - 128.0
        sb = code[:, nb:nb + nb // 2]
        s = jnp.stack([sb & 0xF, sb >> 4], axis=-1).reshape(B, nb)
        pairs = code[:, nb + nb // 2:].reshape(B, nb, (k - 1) // 2)
        n = jnp.stack([pairs & 0xF, pairs >> 4], axis=-1).reshape(
            B, nb, k - 1).astype(jnp.float32) - 8.0
        ac = n * jnp.exp2(s.astype(jnp.float32))[..., None]
        zz = jnp.concatenate([dc[..., None], ac], axis=-1)  # [B, nb, k]
        x = zz @ basis + 128.0
        x = x.reshape(B, hh // 8, ww // 8, 8, 8).transpose(0, 1, 3, 2, 4)
        x = x.reshape(B, hh, ww)
        return jnp.clip(x + 0.5, 0, 255).astype(jnp.uint8)

    ny = _plane_sizes_p4(h, w, k_y)
    nc = _plane_sizes_p4(h // 2, w // 2, k_c)

    def dec(packed):
        y = plane(packed[:, :ny], by, h, w, k_y)
        u = plane(packed[:, ny:ny + nc], bc, h // 2, w // 2, k_c)
        v = plane(packed[:, ny + nc:], bc, h // 2, w // 2, k_c)
        return _yuv_to_rgb_traced(y, u, v)

    return _cpu_run(jax.jit(dec))


def decode_to_rgb_p4(packed: np.ndarray, h: int, w: int,
                     quality: int = None, k_y: int = None,
                     k_c: int = None) -> np.ndarray:
    """Host: pack4 code -> [B, h, w, 3] uint8 RGB.

    Dispatches to the native C++ decoder when available (GIL-free, no
    framework buffer copies - see livespeechportraits_tpu/native), else
    the fused CPU-XLA program.  The two are pinned equal to within 1 LSB
    in tests/test_native_codec.py (float32 dot-order is the only slack).
    """
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    if _native.get_lib() is not None:
        return _native.decode_p4(
            np.asarray(packed), h, w, k_y, k_c,
            _dequant_idct_basis_cached(True, quality, k_y),
            _dequant_idct_basis_cached(False, quality, k_c))
    return _cpu_decoder_p4(h, w, quality, k_y, k_c)(np.asarray(packed))


# ---------------------------------------------------------------------------
# pack4e ('jpeg4e'): true variable-length entropy coding of the pack4
# stream, ON DEVICE, with a static-shape program.
#
# pack4 spends a fixed 37,888 B/frame at 512^2; on rendered face content
# ~93% of its AC nibbles are zero, so most of those bytes carry no
# information and the host link (the real bottleneck of this harness, and
# of any thin-link serving host) moves them anyway — the relay transport
# does NOT compress (measured: pack4 / PRNG / zero buffers all fetch at
# the same MB/s).  The reference never ships uncompressed frames either:
# its egress is entropy-coded jpgs (/root/reference/demo.py:35-45).
#
# XLA cannot emit data-dependent SHAPES, but it can emit data-dependent
# CONTENT: the encoder computes every block's variable-length code, a
# prefix sum turns per-block byte counts into byte offsets, and one
# scatter packs the codes back-to-back into a static worst-case buffer
# whose tail is dead.  The host then fetches only a PREFIX of that buffer
# (a pow2-bucketed device slice — see animate.render_frames), so the
# bytes that cross the link are ~ the entropy-coded size, not the static
# cap.  The stream is self-delimiting: the decoder never needs the
# lengths, so no extra length round-trip is paid on the fetch path.
#
# Per-block code (byte-aligned; run-length on trailing zero ACs + skipped
# DC deltas — the same two redundancies JPEG's RLE/EOB model targets):
#   control byte: bit7 = dc_flag, bits 6..3 = m (kept AC nibbles, 0..12),
#                 bits 2..0 = s (pack4's block shift)
#   [dc_flag]     1 byte: (dc - prev_dc) mod 256   (prev starts at 128)
#   ceil(m/2)     AC nibble bytes: first m nibbles (through the last
#                 nonzero), packed (lo, hi); odd-m padding nibble is the
#                 (zero) value 8
# Frame = luma blocks, then U, then V, in raster order; frames are packed
# back-to-back in the batch buffer.  pack4e is a LOSSLESS recoding of
# pack4: the decoder reconstructs the exact pack4 coefficients, so the
# >30 dB serving gate carries over unchanged (pinned bitwise in
# tests/test_compress.py).
# ---------------------------------------------------------------------------


def _p4e_slots(k: int) -> int:
    return 2 + (k - 1) // 2


def p4e_bytes_per_frame_cap(h: int, w: int, k_y: int = None,
                            k_c: int = None) -> int:
    """Static worst-case bytes/frame (every block: dc delta + all nibbles)."""
    _, k_y, k_c = _p4_defaults(None, k_y, k_c)
    nb_y = (h // 8) * (w // 8)
    nb_c = (h // 16) * (w // 16)
    return nb_y * _p4e_slots(k_y) + 2 * nb_c * _p4e_slots(k_c)


def _p4e_tokens(zz: jnp.ndarray, k: int):
    """[B, nb, k] quantized zigzag floats -> per-block slot tables.

    Returns (vals [B,nb,S] uint8, valid [B,nb,S] bool, within [B,nb,S]
    int32 exclusive-cumsum slot offsets, nbytes [B,nb] int32)."""
    if (k - 1) % 2:
        raise ValueError(f"pack4e K must be odd, got {k}")
    if k > 15:
        # the control byte's kept-nibble count m (up to k-1) is a 4-bit
        # field; a larger k would silently overflow into the dc flag
        raise ValueError(f"pack4e K must be <= 15 (4-bit m field), got {k}")
    B, nb, _ = zz.shape
    dcu = (jnp.clip(zz[..., 0], -128, 127) + 128.0).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((B, 1), 128, jnp.int32), dcu[:, :-1]], axis=1)
    d = (dcu - prev) & 0xFF
    ac = zz[..., 1:]  # [B, nb, k-1]
    m_abs = jnp.max(jnp.abs(ac), axis=-1)
    thresholds = 7.5 * (2.0 ** np.arange(_P4_MAX_SHIFT, dtype=np.float32))
    s = jnp.sum(m_abs[..., None] > thresholds, axis=-1).astype(jnp.float32)
    n = (jnp.clip(jnp.round(ac * jnp.exp2(-s)[..., None]), -8, 7)
         + 8.0).astype(jnp.int32)  # biased nibbles, 8 == zero
    m = jnp.max(jnp.where(n != 8, jnp.arange(1, k)[None, None, :], 0),
                axis=-1)  # kept nibbles: through the last nonzero
    dcf = (d != 0).astype(jnp.int32)
    nnib = (m + 1) // 2
    nbytes = 1 + dcf + nnib
    control = (dcf << 7) | (m << 3) | s.astype(jnp.int32)
    pair = n[..., 0::2] | (n[..., 1::2] << 4)  # [B, nb, (k-1)/2]
    vals = jnp.concatenate(
        [control[..., None], d[..., None], pair], axis=-1).astype(jnp.uint8)
    S = _p4e_slots(k)
    t = jnp.arange(S - 2)
    valid = jnp.concatenate([
        jnp.ones((B, nb, 1), bool),
        (dcf == 1)[..., None],
        t[None, None, :] < nnib[..., None],
    ], axis=-1)
    within = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - valid.astype(
        jnp.int32)
    return vals, valid, within, nbytes


def encode_yuv420_p4e(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      quality: int = None, k_y: int = None, k_c: int = None):
    """Float YUV planes -> (flat [B*cap] uint8 packed stream, total int32).

    The flat buffer holds the B frames' variable-length codes back-to-back
    from byte 0; bytes at and past `total` are dead (zero).  Fetch a
    prefix >= total and hand it to decode_to_rgb_p4e."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    h, w = y.shape[1], y.shape[2]
    qy = jnp.asarray(quant_table(_Q_LUMA, quality), y.dtype)
    qc = jnp.asarray(quant_table(_Q_CHROMA, quality), y.dtype)
    toks = [
        _p4e_tokens(_zigzag_quant(y, qy, k_y), k_y),
        _p4e_tokens(_zigzag_quant(u, qc, k_c), k_c),
        _p4e_tokens(_zigzag_quant(v, qc, k_c), k_c),
    ]
    B = y.shape[0]
    nbytes_cat = jnp.concatenate([t[3] for t in toks], axis=1)
    csum = jnp.cumsum(nbytes_cat, axis=1)
    frame_len = csum[:, -1]  # [B]
    offs = csum - nbytes_cat  # exclusive, within frame
    base = jnp.cumsum(frame_len) - frame_len  # [B]
    cap = p4e_bytes_per_frame_cap(h, w, k_y, k_c)
    flat = jnp.zeros(B * cap, jnp.uint8)
    col = 0
    for vals, valid, within, nb_arr in toks:
        nb = nb_arr.shape[1]
        off_p = offs[:, col:col + nb]
        col += nb
        tgt = base[:, None, None] + off_p[..., None] + within
        tgt = jnp.where(valid, tgt, B * cap)  # OOB -> dropped
        flat = flat.at[tgt.reshape(-1)].set(
            vals.reshape(-1), mode="drop")
    return flat, jnp.sum(frame_len).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("quality", "k_y", "k_c"))
def _encode_rgb_frames_p4e_jit(img, quality, k_y, k_c):
    y, u, v = rgb_to_yuv_planes(img)
    return encode_yuv420_p4e(y, u, v, quality=quality, k_y=k_y, k_c=k_c)


def encode_rgb_frames_p4e(img: jnp.ndarray, quality: int = None,
                          k_y: int = None, k_c: int = None):
    """[B, H, W, 3] float in [-1, 1] -> (flat stream, total bytes)."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    return _encode_rgb_frames_p4e_jit(img, quality, k_y, k_c)


def _decode_p4e_plane_np(buf: np.ndarray, pos: int, basis: np.ndarray,
                         h: int, w: int, k: int):
    """Parse one plane from the pack4e stream (numpy oracle).  Returns
    (plane float [h, w] unclipped, new pos) or raises on truncation."""
    hb, wb = h // 8, w // 8
    out = np.empty((hb, wb, 64), np.float32)
    prev = 128
    end = buf.shape[0]
    coef = np.zeros(64, np.float32)
    for b in range(hb * wb):
        if pos >= end:
            raise IndexError("pack4e stream truncated")
        c = int(buf[pos]); pos += 1
        dcf, m, s = c >> 7, (c >> 3) & 0xF, c & 0x7
        if dcf:
            if pos >= end:
                raise IndexError("pack4e stream truncated")
            prev = (prev + int(buf[pos])) & 0xFF
            pos += 1
        nbyt = (m + 1) // 2
        if pos + nbyt > end:
            raise IndexError("pack4e stream truncated")
        coef[:] = 0.0
        coef[0] = prev - 128
        scale = float(2.0 ** s)
        for t in range(m):
            byte = int(buf[pos + t // 2])
            nibble = (byte >> 4) if t % 2 else (byte & 0xF)
            coef[1 + t] = (nibble - 8) * scale
        pos += nbyt
        out[b // wb, b % wb] = coef[:k] @ basis
    x = out.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    return x + 128.0, pos


def decode_to_rgb_p4e(flat: np.ndarray, B: int, h: int, w: int,
                      quality: int = None, k_y: int = None,
                      k_c: int = None, return_consumed: bool = False):
    """Host: pack4e stream (a prefix of the flat buffer) -> [B, h, w, 3]
    uint8 RGB (optionally with the bytes consumed — the true coded size,
    which drives the next fetch's prefix bucket).  Native C++ when
    available; numpy oracle otherwise.  Raises IndexError if the prefix
    is too short (caller refetches a larger one — see
    animate.render_frames)."""
    quality, k_y, k_c = _p4_defaults(quality, k_y, k_c)
    flat = np.ascontiguousarray(flat, np.uint8)
    by = _dequant_idct_basis_cached(True, quality, k_y)
    bc = _dequant_idct_basis_cached(False, quality, k_c)
    if _native.get_lib() is not None:
        rgb, consumed = _native.decode_p4e(flat, B, h, w, k_y, k_c, by, bc)
        return (rgb, consumed) if return_consumed else rgb
    global _P4E_SLOW_WARNED
    if not _P4E_SLOW_WARNED:
        _P4E_SLOW_WARNED = True
        import warnings

        warnings.warn(
            "pack4e host decode without the native codec runs a "
            "per-block Python loop (orders of magnitude slower than the "
            "jpeg4 fused CPU-XLA fallback); install a C++ toolchain or "
            "use transfer='jpeg4' on this host")
    u8 = lambda p: np.clip(p + 0.5, 0, 255).astype(np.uint8)  # noqa: E731
    from livespeechportraits_tpu.pipeline.animate import yuv420_to_rgb

    frames, pos = [], 0
    for _ in range(B):
        yp, pos = _decode_p4e_plane_np(flat, pos, by, h, w, k_y)
        up, pos = _decode_p4e_plane_np(flat, pos, bc, h // 2, w // 2, k_c)
        vp, pos = _decode_p4e_plane_np(flat, pos, bc, h // 2, w // 2, k_c)
        frames.append(yuv420_to_rgb(u8(yp)[None], u8(up)[None],
                                    u8(vp)[None])[0])
    rgb = np.stack(frames)
    return (rgb, pos) if return_consumed else rgb


def rgb_to_yuv_planes(img: jnp.ndarray):
    """[B, H, W, 3] in [-1, 1] -> float (Y [B,H,W], U/V [B,H/2,W/2]),
    BT.601 full range, 0..255 (the same colorspace as the yuv420 path)."""
    rgb = (img + 1.0) * 127.5
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def down2(c):
        B, H, W = c.shape
        return c.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))

    return y, down2(u), down2(v)


@functools.partial(jax.jit, static_argnames=("quality", "k_y", "k_c"))
def _encode_rgb_frames_jit(img, quality, k_y, k_c):
    y, u, v = rgb_to_yuv_planes(img)
    return encode_yuv420(y, u, v, quality=quality, k_y=k_y, k_c=k_c)


def encode_rgb_frames(img: jnp.ndarray, quality: int = None, k_y: int = None,
                      k_c: int = None) -> jnp.ndarray:
    """[B, H, W, 3] float in [-1, 1] -> packed int8 code (device)."""
    quality, k_y, k_c = _defaults(quality, k_y, k_c)
    return _encode_rgb_frames_jit(img, quality, k_y, k_c)


@functools.lru_cache(maxsize=8)
def _cpu_decoder(h: int, w: int, quality: int, k_y: int, k_c: int):
    """jit-compiled (CPU backend) packed-code -> I420 uint8 decoder.

    The naive numpy decode costs ~7 ms/frame at 512^2 on this host's one
    core; a single fused CPU-XLA program (dequantize + zigzag scatter +
    block-diagonal iDCT matmuls + clip/pack) runs the same math several
    times faster and keeps the hot path identical under the axon and cpu
    backends (both expose a CpuDevice)."""
    ny, nc = _plane_sizes(h, w, k_y, k_c)
    by = jnp.asarray(_dequant_idct_basis_cached(True, quality, k_y))
    bc = jnp.asarray(_dequant_idct_basis_cached(False, quality, k_c))

    def plane(code, basis, hh, ww, k):
        B = code.shape[0]
        nb = (hh // 8) * (ww // 8)
        x = code.reshape(B, nb, k).astype(jnp.float32) @ basis + 128.0
        x = x.reshape(B, hh // 8, ww // 8, 8, 8).transpose(0, 1, 3, 2, 4)
        x = x.reshape(B, hh, ww)
        return jnp.clip(x + 0.5, 0, 255).astype(jnp.uint8)

    def dec(packed):
        y = plane(packed[:, :ny], by, h, w, k_y)
        u = plane(packed[:, ny:ny + nc], bc, h // 2, w // 2, k_c)
        v = plane(packed[:, ny + nc:], bc, h // 2, w // 2, k_c)
        return _yuv_to_rgb_traced(y, u, v)

    return _cpu_run(jax.jit(dec))


def _yuv_to_rgb_traced(y, u, v):
    """Traced mirror of animate.yuv420_to_rgb (uint8 planes in, uint8 RGB
    out; nearest chroma upsample, BT.601 full range) - same op order, so
    outputs are pinned equal to the numpy reference in tests."""
    yf = y.astype(jnp.float32)
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32) - 128.0, 2, axis=1),
                    2, axis=2)
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32) - 128.0, 2, axis=1),
                    2, axis=2)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1) + 0.5, 0, 255
                    ).astype(jnp.uint8)


def _cpu_run(jitted):
    """Wrap a jitted host-side program so it always places on the CPU
    backend (present under both the cpu and axon platforms)."""
    cpu = jax.devices("cpu")[0]

    def run(arr: np.ndarray) -> np.ndarray:
        with jax.default_device(cpu):
            return np.asarray(jitted(jnp.asarray(arr)))

    return run


@functools.lru_cache(maxsize=8)
def _cpu_i420_to_rgb(h: int, w: int):
    def conv(i420):
        B = i420.shape[0]
        q = (h // 2) * (w // 2)
        y = i420[:, :h * w].reshape(B, h, w)
        u = i420[:, h * w:h * w + q].reshape(B, h // 2, w // 2)
        v = i420[:, h * w + q:].reshape(B, h // 2, w // 2)
        return _yuv_to_rgb_traced(y, u, v)

    return _cpu_run(jax.jit(conv))


def i420_to_rgb(i420: np.ndarray, h: int, w: int) -> np.ndarray:
    """[B, h*w*3/2] planar I420 uint8 -> [B, h, w, 3] uint8 RGB as one
    fused CPU-XLA program (~60x the numpy path on this host's one core;
    bitwise-pinned to animate.yuv420_to_rgb in tests/test_compress.py).

    Stays on CPU-XLA by measurement: the native C++ conversion reads
    5.4 ms/frame vs XLA's 1.6 at 512^2 on this host (XLA vectorizes the
    pure-elementwise kernel better than the scalar interleaved-RGB
    loop); native.i420_to_rgb exists for the decoders, where it runs on
    cache-hot planes, and is pinned bitwise-equal in
    tests/test_native_codec.py."""
    return _cpu_i420_to_rgb(h, w)(np.asarray(i420))


def decode_to_rgb(packed: np.ndarray, h: int, w: int, quality: int = None,
                  k_y: int = None, k_c: int = None) -> np.ndarray:
    """Host: packed code -> [B, h, w, 3] uint8 RGB - native C++ when
    available, else one fused CPU-XLA program (dequantize + zigzag
    scatter + iDCT + color conversion); the numpy reference path is
    decode_to_yuv + animate.yuv420_to_rgb, pinned equal in
    tests/test_compress.py and tests/test_native_codec.py."""
    quality, k_y, k_c = _defaults(quality, k_y, k_c)
    if _native.get_lib() is not None:
        return _native.decode_zonal(
            np.asarray(packed), h, w, k_y, k_c,
            _dequant_idct_basis_cached(True, quality, k_y),
            _dequant_idct_basis_cached(False, quality, k_c))
    return _cpu_decoder(h, w, quality, k_y, k_c)(np.asarray(packed))

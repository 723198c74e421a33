"""Native (C++) host-side kernels for the serving pipeline.

The compute path of this framework is JAX/XLA/Pallas on the TPU; this
package is the native *runtime* side: host kernels on the frame-egress
path, where the reference leaned on libjpeg/OpenCV C code
(/root/reference/demo.py:35-45, util/visualizer.py:120-143) and where a
fused CPU-XLA program pays dispatch overhead, framework buffer copies,
and single-core contention with the fetch/dispatch threads.

`framecodec.cpp` is compiled on first use with the system g++ into a
content-addressed cache (env ``LSP_NATIVE_CACHE``, default
``/tmp/lsp_native``) and loaded through ctypes — no pybind11 in this
image, and ctypes releases the GIL for the duration of each decode,
which is exactly what the fetch/decode thread split needs.  Set
``LSP_NATIVE=0`` to force the CPU-XLA fallback (pipeline/compress.py
keeps both paths; equality is pinned in tests/test_native_codec.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import warnings
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("framecodec.cpp")
_CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-fPIC", "-shared"]
_LIB = None
_TRIED = False


def _build(so_path: Path) -> None:
    so_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = so_path.with_suffix(".so.tmp%d" % os.getpid())
    cmd = ["g++", *_CXXFLAGS, str(_SRC), "-o", str(tmp)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, so_path)  # atomic vs concurrent builders


def get_lib():
    """The loaded ctypes library, building it on first call.

    Returns None (and warns once) when disabled via LSP_NATIVE=0 or when
    the toolchain/build is unavailable — callers fall back to the fused
    CPU-XLA decoders in pipeline/compress.py.
    """
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LSP_NATIVE", "1") == "0":
        return None
    digest = hashlib.sha256(
        _SRC.read_bytes() + " ".join(_CXXFLAGS).encode()).hexdigest()[:16]
    so_path = Path(os.environ.get("LSP_NATIVE_CACHE",
                                  "/tmp/lsp_native")) / f"framecodec_{digest}.so"
    try:
        if not so_path.exists():
            _build(so_path)
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        warnings.warn(f"native framecodec unavailable, using CPU-XLA "
                      f"decode: {detail[:500]}")
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    ci = ctypes.c_int
    lib.lsp_decode_p4.argtypes = [u8p, ci, ci, ci, ci, ci,
                                  f32p, f32p, u8p, u8p]
    lib.lsp_decode_p4.restype = None
    lib.lsp_decode_zonal.argtypes = [i8p, ci, ci, ci, ci, ci,
                                     f32p, f32p, u8p, u8p]
    lib.lsp_decode_zonal.restype = None
    lib.lsp_i420_to_rgb.argtypes = [u8p, ci, ci, ci, u8p]
    lib.lsp_i420_to_rgb.restype = None
    lib.lsp_decode_p4e.argtypes = [u8p, ctypes.c_long, ci, ci, ci, ci, ci,
                                   f32p, f32p, u8p, u8p]
    lib.lsp_decode_p4e.restype = ctypes.c_long
    _LIB = lib
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_p4(packed: np.ndarray, h: int, w: int, k_y: int, k_c: int,
              basis_y: np.ndarray, basis_c: np.ndarray) -> np.ndarray:
    """pack4 code [B, bytes] uint8 -> [B, h, w, 3] uint8 RGB."""
    lib = get_lib()
    packed = np.ascontiguousarray(packed, np.uint8)
    B = packed.shape[0]
    out = np.empty((B, h, w, 3), np.uint8)
    scratch = np.empty(h * w + 2 * (h // 2) * (w // 2), np.uint8)
    lib.lsp_decode_p4(_ptr(packed, ctypes.c_uint8), B, h, w, k_y, k_c,
                      _ptr(basis_y, ctypes.c_float),
                      _ptr(basis_c, ctypes.c_float),
                      _ptr(scratch, ctypes.c_uint8),
                      _ptr(out, ctypes.c_uint8))
    return out


def decode_zonal(packed: np.ndarray, h: int, w: int, k_y: int, k_c: int,
                 basis_y: np.ndarray, basis_c: np.ndarray) -> np.ndarray:
    """int8 zonal code [B, bytes] -> [B, h, w, 3] uint8 RGB."""
    lib = get_lib()
    packed = np.ascontiguousarray(packed).view(np.int8)
    B = packed.shape[0]
    out = np.empty((B, h, w, 3), np.uint8)
    scratch = np.empty(h * w + 2 * (h // 2) * (w // 2), np.uint8)
    lib.lsp_decode_zonal(_ptr(packed, ctypes.c_int8), B, h, w, k_y, k_c,
                         _ptr(basis_y, ctypes.c_float),
                         _ptr(basis_c, ctypes.c_float),
                         _ptr(scratch, ctypes.c_uint8),
                         _ptr(out, ctypes.c_uint8))
    return out


def decode_p4e(flat: np.ndarray, B: int, h: int, w: int, k_y: int, k_c: int,
               basis_y: np.ndarray, basis_c: np.ndarray):
    """pack4e stream prefix [n] uint8 -> ([B, h, w, 3] uint8 RGB, consumed).

    Raises IndexError when the prefix is truncated (the stream is
    self-delimiting; the caller refetches a larger prefix)."""
    lib = get_lib()
    flat = np.ascontiguousarray(flat, np.uint8)
    out = np.empty((B, h, w, 3), np.uint8)
    scratch = np.empty(h * w + 2 * (h // 2) * (w // 2), np.uint8)
    consumed = lib.lsp_decode_p4e(
        _ptr(flat, ctypes.c_uint8), ctypes.c_long(flat.shape[0]),
        B, h, w, k_y, k_c,
        _ptr(basis_y, ctypes.c_float), _ptr(basis_c, ctypes.c_float),
        _ptr(scratch, ctypes.c_uint8), _ptr(out, ctypes.c_uint8))
    if consumed < 0:
        raise IndexError("pack4e stream truncated")
    return out, int(consumed)


def i420_to_rgb(i420: np.ndarray, h: int, w: int) -> np.ndarray:
    """Planar I420 [B, h*w*3/2] uint8 -> [B, h, w, 3] uint8 RGB."""
    lib = get_lib()
    i420 = np.ascontiguousarray(i420, np.uint8)
    B = i420.shape[0]
    out = np.empty((B, h, w, 3), np.uint8)
    lib.lsp_i420_to_rgb(_ptr(i420, ctypes.c_uint8), B, h, w,
                        _ptr(out, ctypes.c_uint8))
    return out

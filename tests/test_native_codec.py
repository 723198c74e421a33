"""Native C++ frame decoder (livespeechportraits_tpu/native).

Pins the ctypes-loaded decoder equal to the CPU-XLA/numpy decoders in
pipeline/compress.py.  The plane decoders share everything except the
float32 summation order inside the k-term basis dot, so the gate is
<= 1 LSB on the decoded planes (which the YUV->RGB conversion can
amplify to 2 on the final RGB) on a vanishing fraction of pixels; the
I420->RGB conversion uses identical per-pixel expressions and must be
bitwise equal.  When the toolchain is missing the module must degrade
to the CPU-XLA path, not fail — also covered here.
"""

import numpy as np
import pytest

from livespeechportraits_tpu import native
from livespeechportraits_tpu.pipeline import compress as C

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable")


def _rand_frames(b=3, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)


def _assert_rgb_close(a, b, frac=2e-4):
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.max() <= 2, d.max()
    assert (d > 0).mean() < frac, (d > 0).mean()


@pytest.mark.parametrize("h,w", [(64, 64), (128, 96)])
def test_p4_matches_cpu_xla(h, w):
    img = _rand_frames(h=h, w=w)
    code = np.asarray(C.encode_rgb_frames_p4(img))
    want = C._cpu_decoder_p4(h, w, C.DEFAULT_QUALITY, C.DEFAULT_P4_K_Y,
                             C.DEFAULT_P4_K_C)(code)
    got = native.decode_p4(
        code, h, w, C.DEFAULT_P4_K_Y, C.DEFAULT_P4_K_C,
        C._dequant_idct_basis_cached(True, C.DEFAULT_QUALITY,
                                     C.DEFAULT_P4_K_Y),
        C._dequant_idct_basis_cached(False, C.DEFAULT_QUALITY,
                                     C.DEFAULT_P4_K_C))
    _assert_rgb_close(want, got)


def test_p4_public_entry_dispatches_native(monkeypatch):
    """decode_to_rgb_p4 routes through the native decoder when present
    and the result stays pinned to the numpy reference path."""
    img = _rand_frames(seed=3)
    h, w = img.shape[1:3]
    code = np.asarray(C.encode_rgb_frames_p4(img))
    called = {}
    orig = native.decode_p4

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native, "decode_p4", spy)
    got = C.decode_to_rgb_p4(code, h, w)
    assert called.get("yes")
    y, u, v = C.decode_to_yuv_p4(code, h, w)
    i420 = np.concatenate([y.reshape(len(y), -1), u.reshape(len(u), -1),
                           v.reshape(len(v), -1)], axis=1)
    want = C.i420_to_rgb(i420, h, w)
    _assert_rgb_close(want, got)


def test_zonal_matches_cpu_xla():
    img = _rand_frames(seed=1)
    h, w = img.shape[1:3]
    code = np.asarray(C.encode_rgb_frames(img))
    want = C._cpu_decoder(h, w, C.DEFAULT_QUALITY, C.DEFAULT_K_Y,
                          C.DEFAULT_K_C)(code)
    got = native.decode_zonal(
        code, h, w, C.DEFAULT_K_Y, C.DEFAULT_K_C,
        C._dequant_idct_basis_cached(True, C.DEFAULT_QUALITY, C.DEFAULT_K_Y),
        C._dequant_idct_basis_cached(False, C.DEFAULT_QUALITY,
                                     C.DEFAULT_K_C))
    _assert_rgb_close(want, got)


def test_i420_bitwise_equal():
    rng = np.random.default_rng(2)
    h, w = 64, 96
    i420 = rng.integers(0, 256, (4, h * w * 3 // 2), dtype=np.uint8)
    want = C._cpu_i420_to_rgb(h, w)(i420)
    got = native.i420_to_rgb(i420, h, w)
    assert np.array_equal(want, got)


def test_noncontiguous_input_ok():
    """Fetched arrays can arrive as slices; the wrapper must copy."""
    img = _rand_frames(seed=4)
    h, w = img.shape[1:3]
    code = np.asarray(C.encode_rgb_frames_p4(img))
    wide = np.zeros((code.shape[0], code.shape[1] + 8), code.dtype)
    wide[:, :code.shape[1]] = code
    got = C.decode_to_rgb_p4(wide[:, :code.shape[1]], h, w)
    want = C.decode_to_rgb_p4(code, h, w)
    assert np.array_equal(want, got)


def test_disable_env_falls_back(monkeypatch):
    """LSP_NATIVE=0 forces the CPU-XLA path (fresh module state)."""
    monkeypatch.setenv("LSP_NATIVE", "0")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    assert native.get_lib() is None
    img = _rand_frames(seed=5)
    h, w = img.shape[1:3]
    code = np.asarray(C.encode_rgb_frames_p4(img))
    out = C.decode_to_rgb_p4(code, h, w)  # must not raise
    assert out.shape == (img.shape[0], h, w, 3)
    # monkeypatch teardown restores _LIB/_TRIED for later tests

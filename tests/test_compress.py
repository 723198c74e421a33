"""Device-side JPEG-class frame compression (pipeline/compress.py).

The reference ships compressed frames too (per-frame jpgs,
/root/reference/demo.py:35-45, util/visualizer.py:120-143); ours encodes
on DEVICE so the compressed code - not raw pixels - crosses the host
link.  Gates: exact spec plumbing (zigzag, DCT orthonormality, DC-range
fit), round-trip quality on real generator output (>30 dB, the same bar
the yuv420 path ships under), and e2e equivalence through animate() and
the streaming pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from livespeechportraits_tpu.config import (
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    PersonConfig,
    WaveNetConfig,
)
from livespeechportraits_tpu.pipeline import animate as animate_mod
from livespeechportraits_tpu.pipeline import assets as assets_mod
from livespeechportraits_tpu.pipeline import compress as C
from livespeechportraits_tpu.utils.metrics import psnr


@pytest.fixture(scope="module")
def person():
    wn = WaveNetConfig(residual_layers=3, residual_blocks=2,
                       dilation_channels=16, residual_channels=16,
                       skip_channels=32, cond_channels=512)
    cfg = PersonConfig(
        name="Synthetic",
        audio2headpose=Audio2HeadposeConfig(wavenet=wn, frame_future=5),
        feature2face=Feature2FaceConfig(size="normal", ngf=8,
                                        n_downsample=6, load_size=64),
    )
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    return cfg, a, m


def _sine_audio(seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_zigzag_is_the_jpeg_order():
    zz = C.zigzag_order()
    assert sorted(zz.tolist()) == list(range(64))
    # ISO/IEC 10918-1 Figure 5 prefix
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_dct_matrix_orthonormal():
    d = C.dct_matrix()
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-6)


def test_quant_table_dc_never_clips_int8():
    # centered DC range is [-1024, 1016]; with the step-8 floor it maps
    # exactly onto int8 at ANY quality
    for q in (10, 50, 75, 90, 100):
        t = C.quant_table(C._Q_LUMA, q)
        assert t.flat[0] >= 8.0
        assert (t >= 1).all() and (t <= 255).all()
    # boundary blocks: all-255 and all-0
    for fill in (255.0, 0.0):
        plane = jnp.full((1, 16, 16), fill, jnp.float32)
        code = np.asarray(C.encode_yuv420(
            plane, jnp.full((1, 8, 8), fill), jnp.full((1, 8, 8), fill),
            quality=100))
        y, _, _ = C.decode_to_yuv(code, 16, 16, quality=100)
        assert abs(float(y.mean()) - fill) < 1.0


def test_bytes_per_frame_accounting():
    b = C.encoded_bytes_per_frame(512, 512, k_y=16, k_c=6)
    assert b == 64 * 64 * 16 + 2 * 32 * 32 * 6
    # vs raw RGB (786 KB) and yuv420 (384 KB)
    assert 512 * 512 * 3 / b > 10.0
    assert 512 * 512 * 1.5 / b > 5.0


def test_roundtrip_quality_on_smooth_content():
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.linspace(-1, 1, 128), np.linspace(-1, 1, 128))
    img = np.stack([np.stack([
        np.clip(np.tanh(3 * np.exp(-((xx - dx) ** 2 + (yy - dy) ** 2) / 0.1)
                        - 0.5 + 0.2 * np.sin(8 * xx * c)), -1, 1)
        for c, (dx, dy) in enumerate(rng.uniform(-0.5, 0.5, (3, 2)))], -1)
        for _ in range(2)]).astype(np.float32)
    code = np.asarray(C.encode_rgb_frames(jnp.asarray(img)))
    assert code.dtype == np.int8
    rgb = C.decode_to_rgb(code, 128, 128)
    exact = np.clip((img + 1) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    assert psnr(rgb, exact) > 38.0


def test_fast_decode_matches_numpy_reference():
    """The fused CPU-XLA decoder (basis-GEMM iDCT + traced color
    conversion) must reproduce the numpy reference path (decode_to_yuv +
    animate.yuv420_to_rgb) to within 2 LSB (float-association flips at
    clip/round boundaries)."""
    from livespeechportraits_tpu.pipeline.animate import yuv420_to_rgb

    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    code = np.asarray(C.encode_rgb_frames(jnp.asarray(img)))
    fast = C.decode_to_rgb(code, 64, 64)
    ref = yuv420_to_rgb(*C.decode_to_yuv(code, 64, 64))
    assert np.abs(fast.astype(int) - ref.astype(int)).max() <= 2


def test_i420_fast_conversion_bitwise():
    """i420_to_rgb (the fused converter the yuv420 transfer path now
    uses) is bitwise-equal to the numpy yuv420_to_rgb reference."""
    from livespeechportraits_tpu.pipeline.animate import (
        yuv420_to_rgb, yuv420_unpack,
    )

    rng = np.random.default_rng(3)
    packed = rng.integers(0, 256, (4, 64 * 64 * 3 // 2), dtype=np.uint8)
    fast = C.i420_to_rgb(packed, 64, 64)
    ref = yuv420_to_rgb(*yuv420_unpack(packed, 64, 64))
    np.testing.assert_array_equal(fast, ref)


def test_pack4_bytes_per_frame_accounting():
    # per plane: nb DC bytes + nb/2 shift bytes + nb*(K-1)/2 AC nibbles
    b = C.encoded_bytes_per_frame_p4(512, 512, k_y=13, k_c=5)
    assert b == (4096 + 2048 + 4096 * 6) + 2 * (1024 + 512 + 1024 * 2)
    # ~2x under the int8 zonal code, >10x under yuv420, toward the
    # ~30 KB/frame target a ~2 MB/s link needs for 60 fps
    assert C.encoded_bytes_per_frame(512, 512) / b > 2.0
    assert 512 * 512 * 1.5 / b > 10.0
    assert b < 40_000


def test_pack4_rejects_even_k():
    plane = jnp.zeros((1, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="odd"):
        C._encode_plane_p4(plane, jnp.ones((8, 8)), 4)


def test_pack4_roundtrip_quality_on_smooth_content():
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.linspace(-1, 1, 128), np.linspace(-1, 1, 128))
    img = np.stack([np.stack([
        np.clip(np.tanh(3 * np.exp(-((xx - dx) ** 2 + (yy - dy) ** 2) / 0.1)
                        - 0.5 + 0.2 * np.sin(8 * xx * c)), -1, 1)
        for c, (dx, dy) in enumerate(rng.uniform(-0.5, 0.5, (3, 2)))], -1)
        for _ in range(2)]).astype(np.float32)
    code = np.asarray(C.encode_rgb_frames_p4(jnp.asarray(img)))
    assert code.dtype == np.uint8
    assert code.shape == (2, C.encoded_bytes_per_frame_p4(128, 128))
    rgb = C.decode_to_rgb_p4(code, 128, 128)
    exact = np.clip((img + 1) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    assert psnr(rgb, exact) > 33.0


def test_pack4_flat_blocks_lossless_shift():
    """Blocks whose quantized ACs already fit 4 bits must take shift 0 and
    reproduce the plain zonal code's output exactly (same K): the adaptive
    shift only spends precision where the block needs range."""
    rng = np.random.default_rng(5)
    # low-amplitude smooth content -> small quantized ACs everywhere
    xx = np.linspace(0, np.pi, 64)
    img = (0.1 * np.outer(np.sin(xx), np.cos(xx)))[None, ..., None]
    img = np.repeat(img, 3, axis=-1).astype(np.float32)
    k_y, k_c = 13, 5
    p4 = np.asarray(C.encode_rgb_frames_p4(jnp.asarray(img),
                                           k_y=k_y, k_c=k_c))
    zon = np.asarray(C.encode_rgb_frames(jnp.asarray(img),
                                         k_y=k_y, k_c=k_c))
    a = C.decode_to_rgb_p4(p4, 64, 64, k_y=k_y, k_c=k_c)
    b = C.decode_to_rgb(zon, 64, 64, k_y=k_y, k_c=k_c)
    nb = 64
    shifts = p4[:, nb:nb + nb // 2]
    assert (shifts == 0).all()
    np.testing.assert_array_equal(a, b)


def test_pack4_fast_decode_matches_numpy_reference():
    from livespeechportraits_tpu.pipeline.animate import yuv420_to_rgb

    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    code = np.asarray(C.encode_rgb_frames_p4(jnp.asarray(img)))
    fast = C.decode_to_rgb_p4(code, 64, 64)
    ref = yuv420_to_rgb(*C.decode_to_yuv_p4(code, 64, 64))
    assert np.abs(fast.astype(int) - ref.astype(int)).max() <= 2


def test_jpeg4_transfer_end_to_end_fidelity(person):
    """animate(transfer='jpeg4') ships under the same >30 dB gate as the
    jpeg and yuv420 serving paths, at ~half the jpeg egress bytes."""
    cfg, a, m = person
    audio = _sine_audio(0.6)
    rgb = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4)
    j4 = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                             transfer="jpeg4")
    assert j4.frames.shape == rgb.frames.shape
    assert j4.frames.dtype == np.uint8
    assert psnr(j4.frames, rgb.frames) > 30.0


def test_jpeg_transfer_end_to_end_fidelity(person):
    """animate(transfer='jpeg') must look like the exact RGB render: the
    >30 dB gate the yuv420 serving path already ships under."""
    cfg, a, m = person
    audio = _sine_audio(0.6)
    rgb = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4)
    jpg = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                              transfer="jpeg")
    assert jpg.frames.shape == rgb.frames.shape
    assert jpg.frames.dtype == np.uint8
    assert psnr(jpg.frames, rgb.frames) > 30.0


def test_jpeg_transfer_streaming_matches_offline(person):
    """The streaming pipeline with transfer='jpeg' produces the same
    frames as the offline animate(transfer='jpeg') (identical programs,
    chunked dispatch)."""
    from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

    cfg, a, m = person
    audio = _sine_audio(1.0)
    offline = animate_mod.animate(cfg, a, m, audio, seed=3, render_batch=4,
                                  transfer="jpeg")
    s = StreamingAnimator(cfg, a, m, seed=3, chunk=16, render_batch=4,
                          transfer="jpeg")
    frames = []
    for i in range(0, len(audio), 4000):
        out = s.push_audio(audio[i:i + 4000])
        if len(out):
            frames.append(out)
    tail = s.flush()
    if len(tail):
        frames.append(tail)
    got = np.concatenate(frames)
    assert got.shape[0] >= offline.nframe - 8
    # streaming smooths with a bounded window, so compare loosely: same
    # subject, same motion, high correlation frame-by-frame
    n = min(got.shape[0], offline.nframe)
    assert psnr(got[:n], offline.frames[:n]) > 20.0


# ---------------------------------------------------------------------------
# pack4e: device-side entropy coding of the pack4 stream
# ---------------------------------------------------------------------------


def _mixed_frames(b=3, h=64, w=64, seed=0):
    """Smooth + noisy + hard-edge content: exercises EOB truncation, the
    dc-delta skip and the worst-case (no-savings) path together."""
    rng = np.random.default_rng(seed)
    img = np.zeros((b, h, w, 3), np.float32)
    xx, yy = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    img[0] = np.stack([xx * 0.5, yy * 0.5, (xx + yy) * 0.25], -1)
    img[1 % b] = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    img[2 % b, h // 4: h // 2, w // 4: w // 2] = 0.8
    return np.clip(img, -1, 1)


def test_pack4e_is_a_lossless_recoding_of_pack4():
    """pack4e decode == pack4 decode BITWISE: it stores the exact same
    quantized coefficients, only entropy-coded (shared accum path)."""
    img = _mixed_frames()
    b, h, w = img.shape[:3]
    code4 = np.asarray(C.encode_rgb_frames_p4(jnp.asarray(img)))
    rgb4 = C.decode_to_rgb_p4(code4, h, w)
    flat, total = C.encode_rgb_frames_p4e(jnp.asarray(img))
    flat, total = np.asarray(flat), int(total)
    rgbe, consumed = C.decode_to_rgb_p4e(flat[:total], b, h, w,
                                         return_consumed=True)
    assert consumed == total
    np.testing.assert_array_equal(rgbe, rgb4)


def test_pack4e_truncated_prefix_raises():
    img = _mixed_frames(seed=1)
    b, h, w = img.shape[:3]
    flat, total = C.encode_rgb_frames_p4e(jnp.asarray(img))
    flat, total = np.asarray(flat), int(total)
    with pytest.raises(IndexError):
        C.decode_to_rgb_p4e(flat[:total - 3], b, h, w)
    # a LONGER prefix than needed decodes identically (steady-state
    # bucketed fetches always overshoot a little)
    a = C.decode_to_rgb_p4e(flat[:total], b, h, w)
    bb = C.decode_to_rgb_p4e(flat, b, h, w)
    np.testing.assert_array_equal(a, bb)


def test_pack4e_beats_static_size_on_rendered_content(person):
    """On real generator output the coded size must be well under the
    static pack4 size (that IS the point); the worst-case cap bounds it
    on any content."""
    cfg, a, m = person
    audio = _sine_audio(0.6)
    rgb = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4)
    x = jnp.asarray(rgb.frames.astype(np.float32) / 127.5 - 1.0)
    flat, total = C.encode_rgb_frames_p4e(x)
    total = int(total)
    n = rgb.frames.shape[0]
    static = n * C.encoded_bytes_per_frame_p4(*rgb.frames.shape[1:3])
    cap = n * C.p4e_bytes_per_frame_cap(*rgb.frames.shape[1:3])
    assert total < 0.6 * static, (total, static)
    assert total <= cap
    assert int(np.asarray(flat).shape[0]) == cap


def test_pack4e_transfer_matches_jpeg4_bitwise(person):
    """animate(transfer='pack4e') returns the SAME frames as 'jpeg4'
    (lossless recoding), across multiple batches and the split_cand
    variant, while fetching fewer bytes."""
    cfg, a, m = person
    audio = _sine_audio(0.8)
    j4 = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                             transfer="jpeg4")
    pe = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                             transfer="pack4e")
    np.testing.assert_array_equal(pe.frames, j4.frames)
    assert pe.link_ms["fetch_bytes"] < j4.link_ms["fetch_bytes"]
    ps = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                             transfer="pack4e", split_cand=True)
    np.testing.assert_array_equal(ps.frames, j4.frames)


def test_pack4e_numpy_oracle_matches_native(person, monkeypatch):
    """The numpy reference parser reconstructs the same frames as the
    native C++ parser (identical coefficients; <=1 LSB RGB slack from
    float accumulation order is NOT allowed here because both use the
    same basis matmul per block - require exact equality)."""
    from livespeechportraits_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    img = _mixed_frames(seed=2)
    b, h, w = img.shape[:3]
    flat, total = C.encode_rgb_frames_p4e(jnp.asarray(img))
    flat = np.asarray(flat)[:int(total)]
    want = C.decode_to_rgb_p4e(flat, b, h, w)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    got, consumed = C.decode_to_rgb_p4e(flat, b, h, w, return_consumed=True)
    assert consumed == int(total)
    d = np.abs(want.astype(np.int16) - got.astype(np.int16))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_pack4e_streaming_matches_jpeg4_streaming(person):
    """Streaming with transfer='pack4e' emits the SAME frames as
    'jpeg4' streaming (lossless recoding through the live path,
    incl. the bucketed prefix fetch + pipeline_depth buffering)."""
    from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

    cfg, a, m = person
    audio = _sine_audio(1.0)

    def run(transfer, depth):
        s = StreamingAnimator(cfg, a, m, seed=3, chunk=16, render_batch=4,
                              transfer=transfer, pipeline_depth=depth)
        frames = []
        for i in range(0, len(audio), 4000):
            out = s.push_audio(audio[i:i + 4000])
            if len(out):
                frames.append(out)
        tail = s.flush()
        if len(tail):
            frames.append(tail)
        return np.concatenate(frames)

    j4 = run("jpeg4", 0)
    pe = run("pack4e", 0)
    np.testing.assert_array_equal(pe, j4)
    pe1 = run("pack4e", 1)
    np.testing.assert_array_equal(pe1, j4)

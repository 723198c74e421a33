import numpy as np
import jax.numpy as jnp

from livespeechportraits_tpu.ops import rasterize


def _fake_landmarks(rng, n=73, size=512):
    return rng.uniform(80, size - 80, size=(n, 2)).astype(np.float32)


def test_segment_tables():
    segs = rasterize.face_segments()
    assert segs.shape[1] == 2
    assert segs.min() >= 0 and segs.max() < 73
    sh = rasterize.shoulder_segments(18)
    assert sh.shape == (16, 2)


def test_device_rasterizer_matches_cv2_iou():
    rng = np.random.default_rng(0)
    lm = _fake_landmarks(rng)
    sh = rng.uniform(100, 400, size=(18, 2)).astype(np.float32)

    host = rasterize.rasterize_feature_map_host(lm, sh) > 0
    dev = np.asarray(rasterize.rasterize_feature_maps(jnp.asarray(lm)[None], jnp.asarray(sh)[None])[0]) > 0.5

    inter = (host & dev).sum()
    union = (host | dev).sum()
    assert union > 0
    iou = inter / union
    assert iou > 0.90, f"IoU {iou:.3f} too low vs cv2 oracle"


def test_rasterizer_batched_and_bounded():
    rng = np.random.default_rng(1)
    lm = np.stack([_fake_landmarks(rng) for _ in range(3)])
    out = np.asarray(rasterize.rasterize_feature_maps(jnp.asarray(lm)))
    assert out.shape == (3, 512, 512)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert out.sum(axis=(1, 2)).min() > 100  # something was drawn per frame


def test_endpoints_are_drawn():
    lm = np.full((73, 2), 256.0, np.float32)
    lm[0] = [100.0, 100.0]
    lm[1] = [150.0, 120.0]
    out = np.asarray(rasterize.rasterize_feature_maps(jnp.asarray(lm)[None])[0])
    assert out[100, 100] == 1.0  # (y, x) of endpoint 0
    assert out[120, 150] == 1.0


def test_facial_weight_mask():
    rng = np.random.default_rng(2)
    pts = rng.uniform(200, 300, size=(73, 2)).astype(np.float32)
    mask = rasterize.facial_weight_mask(pts)
    assert mask.max() <= 1.0 and mask.min() >= 0.0
    assert mask.sum() > 0


def test_segment_endpoints_truncate_toward_zero():
    """cv2/int() truncate toward zero: a -0.5 endpoint must rasterise as 0,
    not -1 (host/device parity when landmarks go slightly off-canvas)."""
    import jax.numpy as jnp

    lm = np.zeros((1, 73, 2), np.float32)
    lm[0, :, 0] = -0.5  # x just off-canvas
    lm[0, :, 1] = np.linspace(1, 30, 73)
    dev = np.asarray(rasterize.rasterize_feature_maps(jnp.asarray(lm), None,
                                                      (64, 64))[0]) > 0.5
    host = rasterize.rasterize_feature_map_host(lm[0], None, (64, 64)) > 127
    inter = float(np.logical_and(dev, host).sum())
    union = float(np.logical_or(dev, host).sum())
    assert union > 0 and inter / union > 0.90, inter / union
    # with floor() instead of trunc(), the whole line shifted a pixel and
    # column 0 (where int(-0.5) lands) lost coverage entirely
    assert dev[:, 0].sum() > 0


def test_facial_weight_mask_off_canvas_polygon():
    """A fully off-canvas mouth polygon must weight (almost) nothing, not
    wrap negative slice ends around the whole image (numpy fallback)."""
    pts = np.full((73, 2), -40.0, np.float32)
    m = rasterize.facial_weight_mask(pts, 64, 64)
    assert np.asarray(m).sum() <= 64 * 22 * 3  # tiny corner at most


def test_shoulder_segments_tiny_counts():
    for n in (0, 1, 2, 3):
        segs = rasterize.shoulder_segments(n)
        assert segs.shape[1] == 2  # indexable even when empty

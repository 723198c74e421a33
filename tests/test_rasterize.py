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

"""Reference-format data ingestion tests on fabricated clip directories."""

import os

import numpy as np
import jax
import pytest

from livespeechportraits_tpu.config import APCConfig, Audio2FeatureConfig
from livespeechportraits_tpu.models import apc, audio2feature
from livespeechportraits_tpu.train import data_io


@pytest.fixture()
def clip_dir(tmp_path):
    """Fabricate a reference-format clip directory."""
    from scipy.io import wavfile

    root = tmp_path / "subject" / "clip1"
    root.mkdir(parents=True)
    T = 120  # 2 s at 60 fps
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavfile.write(str(root / "clip1.wav"), sr, (wav * 32767).astype(np.int16))
    np.savez(
        str(root / "3d_fit_data.npz"),
        pts_3d=np.random.default_rng(0).normal(size=(T, 73, 3)).astype(np.float32),
        rot_angles=np.random.default_rng(1).uniform(-170, 170, (T, 3)).astype(np.float32),
        trans=np.random.default_rng(2).normal(size=(T, 3, 1)).astype(np.float32),
    )
    np.save(str(tmp_path / "subject" / "mean_pts3d.npy"),
            np.zeros((73, 3), np.float32))
    return root


def test_prepare_clip_caches_apc(clip_dir):
    cfg = APCConfig(mel_dim=80, hidden_size=16, num_layers=2)
    params = apc.init_apc(jax.random.PRNGKey(0), cfg)
    clip = data_io.prepare_clip(str(clip_dir), "clip1", params, cfg)
    assert clip.audio_features.shape == (240, 16)  # 2 s * 120 Hz
    assert clip.pts3d.shape[1:] == (73, 3)
    assert clip.headpose.shape[1] == 6 and clip.velocity.shape[1] == 6
    # cache name carries a digest of the encoder params (switching
    # --apc_ckpt must not reuse another encoder's features)
    caches = list(clip_dir.glob("clip1_APC_feature_tpu_*.npy"))
    assert len(caches) == 1
    cache = caches[0]
    # second load hits the cache (same values)
    clip2 = data_io.prepare_clip(str(clip_dir), "clip1", params, cfg)
    np.testing.assert_array_equal(clip.audio_features, clip2.audio_features)
    # a DIFFERENT encoder writes a new cache instead of reusing the old
    params2 = apc.init_apc(jax.random.PRNGKey(1), cfg)
    clip3 = data_io.prepare_clip(str(clip_dir), "clip1", params2, cfg)
    assert len(list(clip_dir.glob("clip1_APC_feature_tpu_*.npy"))) == 2
    assert np.abs(clip3.audio_features - clip.audio_features).max() > 0


def _make_face_clip_dir(tmp_path, name="c", N=8, H=64, seed=0):
    import h5py
    from PIL import Image

    root = tmp_path / "face" / name
    (root / "candidates").mkdir(parents=True)
    rng = np.random.default_rng(seed)
    with h5py.File(str(root / f"{name}.h5"), "w") as f:
        dt = h5py.vlen_dtype(np.dtype("uint8"))
        ds = f.create_dataset(name, (N,), dtype=dt)
        import io as _io

        for i in range(N):
            buf = _io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (H, H, 3), dtype=np.uint8)).save(
                buf, format="JPEG")
            ds[i] = np.frombuffer(buf.getvalue(), np.uint8)
    np.savez(str(root / "change_paras.npz"), scale=np.float32(8.0),
             xc=np.int32(256), yc=np.int32(256))
    np.save(str(root / "tracked2D_normalized_pts_fix_contour.npy"),
            rng.uniform(100, 400, (N, 73, 2)).astype(np.float32))
    np.save(str(root / "normalized_shoulder_points.npy"),
            rng.uniform(100, 400, (18, 2)).astype(np.float32))
    for j in range(4):
        Image.fromarray(rng.integers(0, 255, (H, H, 3), dtype=np.uint8)).save(
            str(root / "candidates" / f"full_{j}.jpg"))
    return root


def test_load_face_clip(tmp_path):
    N = 8
    root = _make_face_clip_dir(tmp_path, N=N)

    sampler = data_io.load_face_clip(str(root), "c", load_size=512)
    assert sampler.images.shape == (N, 512, 512, 3)
    assert sampler.candidates.shape == (4, 512, 512, 3)
    # candidates were normalised and cached
    assert os.path.exists(root / "candidates" / "normalized_full_0.jpg")
    item = sampler.sample(0)
    assert item["feature_map"].shape == (512, 512, 1)


def test_lazy_frames_match_eager_and_bound_memory(tmp_path):
    """Default (lazy) decode yields identical samples to eager=True without
    materialising the clip: the LRU holds at most cache_frames decoded
    frames (face_dataset.py:190-193 reads h5 lazily per item)."""
    N = 12
    # two identical clip dirs: loading the same dir twice would compare a
    # first-run candidate cache against its lossy jpg re-read (by design,
    # face_dataset.py:119-129)
    root = _make_face_clip_dir(tmp_path / "a", N=N, seed=3)
    root2 = _make_face_clip_dir(tmp_path / "b", N=N, seed=3)
    lazy = data_io.load_face_clip(str(root), "c", load_size=512, cache_frames=2)
    eager = data_io.load_face_clip(str(root2), "c", load_size=512, eager=True)
    assert isinstance(lazy.images, data_io.LazyH5Frames)
    assert len(lazy.images) == N and lazy.images.shape == (N, 512, 512, 3)
    for i in (0, 5, N - 2):
        a = lazy.sample(i)
        b = eager.sample(i)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    assert len(lazy.images._cache) <= 2  # bounded: whole clip never resident


def test_concat_face_sampler(tmp_path):
    from livespeechportraits_tpu.train import datasets

    r1 = _make_face_clip_dir(tmp_path, name="c1", N=7, seed=1)
    r2 = _make_face_clip_dir(tmp_path, name="c2", N=9, seed=2)
    s1 = data_io.load_face_clip(str(r1), "c1", load_size=512)
    s2 = data_io.load_face_clip(str(r2), "c2", load_size=512)
    cat = datasets.ConcatFaceSampler([s1, s2])
    assert len(cat) == len(s1) + len(s2)
    # indices map through the cumulative boundary to the right clip
    np.testing.assert_array_equal(
        cat.sample(0)["tgt_image"], s1.sample(0)["tgt_image"])
    np.testing.assert_array_equal(
        cat.sample(len(s1))["tgt_image"], s2.sample(0)["tgt_image"])
    n_batches = 0
    for b in cat.batches(4, np.random.default_rng(0)):
        assert b["tgt_image"].shape == (4, 512, 512, 3)
        n_batches += 1
    assert n_batches == len(cat) // 4


def test_a2f_wavenet_variant():
    import jax.numpy as jnp

    cfg = Audio2FeatureConfig(apc_hidden_size=8, output_dim=6)
    # shrink the wavenet for the test by monkey-layering via config defaults
    params = audio2feature.init_audio2feature_wavenet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 8))
    out = audio2feature.apply_audio2feature_wavenet(params, cfg, x, output_length=5)
    assert out.shape == (2, 5, 6)


def test_profiling_stopwatch():
    from livespeechportraits_tpu.utils.profiling import Stopwatch

    sw = Stopwatch()
    with sw.stage("a"):
        pass
    with sw.stage("b"):
        pass
    assert set(sw.ms) == {"a", "b"}
    assert "total" in sw.report()

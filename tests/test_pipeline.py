"""End-to-end pipeline test: synthetic person, sine audio -> valid frames.

SURVEY.md §4: deterministic fake-data end-to-end - frame count must be
int(len(audio)/sr*60) (minus the head-pose frame_future tail), all outputs
finite, video muxes.
"""

import os

import numpy as np
import jax
import pytest

from livespeechportraits_tpu.config import (
    Audio2FeatureConfig,
    Audio2HeadposeConfig,
    Feature2FaceConfig,
    PersonConfig,
    WaveNetConfig,
    replace,
)
from livespeechportraits_tpu.pipeline import animate as animate_mod
from livespeechportraits_tpu.pipeline import assets as assets_mod
from livespeechportraits_tpu.pipeline import video as video_mod


def tiny_person() -> PersonConfig:
    """Full-architecture person at test scale: RF=15 WaveNet, 64px renderer."""
    wn = WaveNetConfig(residual_layers=3, residual_blocks=2, dilation_channels=16,
                       residual_channels=16, skip_channels=32, cond_channels=512)
    return PersonConfig(
        name="Synthetic",
        audio2headpose=Audio2HeadposeConfig(wavenet=wn, frame_future=5),
        feature2face=Feature2FaceConfig(size="normal", ngf=8, n_downsample=6, load_size=64),
    )


@pytest.fixture(scope="module")
def person():
    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(0),
                                            image_size=64, bank_size=64)
    return cfg, a, m


def _sine_audio(seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_animate_end_to_end(person, tmp_path):
    cfg, a, m = person
    audio = _sine_audio(1.0)
    res = animate_mod.animate(cfg, a, m, audio, seed=0, render_batch=4,
                              keep_feature_maps=True)
    expected_total = int(len(audio) / 16000 * 60)  # demo.py:180
    assert res.nframe == expected_total - cfg.audio2headpose.frame_future
    assert res.frames.shape == (res.nframe, 64, 64, 3)
    assert res.frames.dtype == np.uint8
    assert np.isfinite(res.landmarks).all()
    assert np.isfinite(res.headpose).all()
    assert res.feature_maps is not None and res.feature_maps.max() > 0
    # landmarks should fall inside the (synthetic) camera frame
    assert (res.landmarks > -64).all() and (res.landmarks < 128).all()
    # per-stage timings recorded for all six stages
    assert set(res.stage_ms) == {"mel_apc", "lle", "audio2mouth", "headpose", "post",
                                 "render_device", "render"}

    out = video_mod.write_video(res.frames, str(tmp_path / "out.avi"), audio)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_animate_deterministic_given_seed(person):
    cfg, a, m = person
    audio = _sine_audio(0.5)
    r1 = animate_mod.animate(cfg, a, m, audio, seed=3, render_batch=4)
    r2 = animate_mod.animate(cfg, a, m, audio, seed=3, render_batch=4)
    np.testing.assert_array_equal(r1.frames, r2.frames)
    r3 = animate_mod.animate(cfg, a, m, audio, seed=4, render_batch=4)
    assert np.abs(r3.headpose - r1.headpose).max() > 0  # GMM sampling differs


def test_wav_roundtrip(tmp_path):
    audio = _sine_audio(0.3)
    p = str(tmp_path / "t.wav")
    video_mod.save_wav(p, audio)
    back = video_mod.load_wav(p)
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=1e-3)


def test_wav_resample(tmp_path):
    sr_in = 44100
    t = np.arange(int(0.25 * sr_in)) / sr_in
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t44.wav")
    from scipy.io import wavfile
    wavfile.write(p, sr_in, (audio * 32767).astype(np.int16))
    out = video_mod.load_wav(p, 16000)
    assert abs(out.shape[0] - int(0.25 * 16000)) <= 2


def test_write_video_mp4(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    out = video_mod.write_video(frames, str(tmp_path / "o.mp4"), _sine_audio(10 / 60))
    assert os.path.exists(out) and out.endswith(".mp4")
    import cv2

    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10


def test_yuv420_transfer_visually_identical(person):
    cfg, a, m = person
    audio = _sine_audio(0.6)
    rgb = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4)
    yuv = animate_mod.animate(cfg, a, m, audio, seed=1, render_batch=4,
                              transfer="yuv420")
    assert yuv.frames.shape == rgb.frames.shape
    # chroma subsampling is lossy but visually transparent: high PSNR
    from livespeechportraits_tpu.utils.metrics import psnr

    assert psnr(yuv.frames, rgb.frames) > 30.0


def test_bucket_padded_animate_bit_exact(person):
    """Bucket padding (serve.py length bucketing) must not change outputs:
    every pre-post stage is prefix-causal over zero-padded audio, and post
    reflect-remaps its padded tail (animate._jit_post valid_len), so the
    padded run trimmed to valid_frames is bit-identical to the exact run."""
    cfg, a, m = person
    audio = _sine_audio(0.8)  # not a bucket multiple
    exact = animate_mod.animate(cfg, a, m, audio, seed=7, render_batch=4)

    bucket = 16000  # 1 s bucket
    padded_audio = np.pad(audio, (0, bucket - len(audio) % bucket))
    true_total = int(len(audio) / 16000 * 60)
    bucketed = animate_mod.animate(cfg, a, m, padded_audio, seed=7,
                                   render_batch=4, valid_frames=true_total)
    assert bucketed.nframe == exact.nframe
    np.testing.assert_array_equal(bucketed.landmarks, exact.landmarks)
    np.testing.assert_array_equal(bucketed.headpose, exact.headpose)
    np.testing.assert_array_equal(bucketed.pts3d, exact.pts3d)
    np.testing.assert_array_equal(bucketed.frames, exact.frames)


def test_fused_motion_matches_staged(person):
    """The one-dispatch motion program (serving fast path) must match the
    staged pipeline."""
    cfg, a, m = person
    audio = _sine_audio(0.9)
    staged = animate_mod.animate(cfg, a, m, audio, seed=11, render_batch=4)
    fused = animate_mod.animate(cfg, a, m, audio, seed=11, render_batch=4,
                                fused=True)
    assert fused.nframe == staged.nframe
    np.testing.assert_allclose(fused.landmarks, staged.landmarks,
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(fused.headpose, staged.headpose,
                               atol=1e-4, rtol=0)
    # frames may differ by float summation order inside the fused program;
    # require near-identity
    diff = np.abs(fused.frames.astype(np.int16) - staged.frames.astype(np.int16))
    assert diff.max() <= 1
    assert "motion" in fused.stage_ms

    # fused + bucket padding still reproduces the exact run.  Use a CHIRP,
    # not the stationary sine: a wrong feature repeat-pad clamp (e.g. at
    # the post-stage count instead of the frame count, freezing the last
    # 2*frame_future real rows) is invisible on stationary audio
    chirp = (0.3 * np.sin(2 * np.pi * (120 + 400 * np.linspace(0, 0.9, len(audio)))
                          * np.arange(len(audio)) / 16000)).astype(np.float32)
    f_exact = animate_mod.animate(cfg, a, m, chirp, seed=11, render_batch=4,
                                  fused=True)
    padded = np.pad(chirp, (0, 16000 - len(chirp) % 16000))
    true_total = int(len(chirp) / 16000 * 60)
    fb = animate_mod.animate(cfg, a, m, padded, seed=11, render_batch=4,
                             fused=True, valid_frames=true_total)
    np.testing.assert_allclose(fb.landmarks, f_exact.landmarks,
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(fb.headpose, f_exact.headpose,
                               atol=1e-5, rtol=0)
    assert fb.nframe == f_exact.nframe


def test_demo_cli_bucketed_fused(tmp_path, monkeypatch):
    """demo.py CLI surface with --bucket_seconds/--fused: the bucketed+fused
    run writes a video with the same frame count as the exact-length rule
    (demo.py:180 of the reference).  Model sizes are pinned to the test
    scale by patching PersonConfig (the reference YAML carries no
    architecture knobs to shrink)."""
    import importlib.util
    import sys

    # load OUR demo.py by explicit path: earlier oracle tests leave
    # /root/reference on sys.path, where a different demo.py shadows it
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "lsp_demo_cli", os.path.join(repo, "demo.py"))
    demo_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo_cli)
    from livespeechportraits_tpu import config as config_mod

    monkeypatch.setattr(config_mod, "PersonConfig",
                        lambda name="Synthetic", **kw: tiny_person())
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--id", "Synthetic", "--driving_audio", "missing.wav",
        "--duration", "0.7", "--render_batch", "4",
        "--bucket_seconds", "1", "--fused",
        "--results_dir", str(tmp_path / "results"),
    ])
    demo_cli.main()
    out = tmp_path / "results" / "Synthetic" / "missing" / "missing.avi"
    assert out.exists() and out.stat().st_size > 1000
    import cv2

    cap = cv2.VideoCapture(str(out))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    cfg = tiny_person()
    assert n == int(0.7 * 60) - cfg.audio2headpose.frame_future


def test_quantized_renderer_end_to_end(person):
    """animate() with an int8-quantized renderer: same motion outputs,
    visually-equivalent frames (high PSNR vs the float pipeline)."""
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.utils.metrics import psnr

    cfg, a, m = person
    audio = _sine_audio(0.8)
    ref = animate_mod.animate(cfg, a, m, audio, seed=3, render_batch=4)
    mq = assets_mod.quantize_person_models(m)
    out = animate_mod.animate(cfg, a, mq, audio, seed=3, render_batch=4)
    np.testing.assert_array_equal(out.landmarks, ref.landmarks)
    assert out.frames.shape == ref.frames.shape
    p = psnr(out.frames, ref.frames)
    assert p > 30.0, p
    assert np.any(out.frames != ref.frames)  # actually quantized


def test_calibrated_quantized_renderer_end_to_end(person):
    """Static-scale int8 serving path: calibrate on real rasterised
    renderer inputs (animate.build_render_inputs), then animate() stays
    visually equivalent to the float pipeline and near-identical to the
    dynamic-int8 pipeline."""
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.utils.metrics import psnr

    cfg, a, m = person
    audio = _sine_audio(0.8)
    ref = animate_mod.animate(cfg, a, m, audio, seed=3, render_batch=4)

    calib = animate_mod.build_render_inputs(cfg, a, m, audio, seed=3,
                                            max_frames=8)
    assert calib.shape[0] == 8 and calib.shape[-1] == cfg.feature2face.input_nc
    mq = assets_mod.quantize_person_models(m, calibrate_inputs=calib)
    # the quantized interior carries static activation scales
    assert "x_scale" in mq.feature2face["net"]["sub"]["down"]
    out = animate_mod.animate(cfg, a, mq, audio, seed=3, render_batch=4)
    np.testing.assert_array_equal(out.landmarks, ref.landmarks)
    p = psnr(out.frames, ref.frames)
    assert p > 30.0, p
    assert np.any(out.frames != ref.frames)

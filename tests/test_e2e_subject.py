"""From-scratch-subject loop: the synthetic raw-clip subject
(pipeline/synth_subject.py) is structurally valid reference-format data
AND the serving pipeline can reproduce it exactly given oracle stage
outputs - the consistency guarantees tools/e2e_subject.py's trained run
relies on (docs/E2E_SUBJECT.md).  The reference has no counterpart: it
ships pre-baked packs and no way to make one (demo.py:80-108)."""

import os

import numpy as np
import pytest

from livespeechportraits_tpu.pipeline import synth_subject as ss


@pytest.fixture(scope="module")
def subject(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e") / "E2ETest"
    os.makedirs(root, exist_ok=True)
    gt = ss.write_raw_clip(str(root), "clip1", 240, seed=0)
    return str(root), gt


def test_clip_structure_and_learnability(subject):
    root, gt = subject
    clip = os.path.join(root, "clip1")
    for f in ("clip1.wav", "3d_fit_data.npz",
              "tracked3D_normalized_pts_fix_contour.npy",
              "tracked2D_normalized_pts_fix_contour.npy", "clip1.h5",
              "change_paras.npz", "normalized_shoulder_points.npy",
              "camera_intrinsic.npy"):
        assert os.path.exists(os.path.join(clip, f)), f

    lm = gt["landmarks2d"]
    assert lm.shape == (240, 73, 2)
    # face inside the frame with margin, and spanning more than half of it
    # (so FaceFrameSampler's face crop clamps to the whole frame - the
    # train-serve framing consistency the module docstring promises)
    assert lm.min() > 4 and lm.max() < 508
    width = lm[..., 0].max(1) - lm[..., 0].min(1)
    assert (width * 2 > 512).all()
    from livespeechportraits_tpu.train.datasets import FaceFrameSampler

    assert FaceFrameSampler.crop_coords(lm[0], (512, 512)) == (0, 0, 512, 512)

    # the audio -> mouth mapping is real signal: frame energy of the wav
    # correlates near-perfectly with mouth opening
    wav = gt["wav"]
    spf = ss.SR // ss.FPS
    energy = np.sqrt((wav[: 240 * spf].reshape(240, spf) ** 2).mean(1))
    opening = lm[:, 46:64, 1].max(1) - lm[:, 46:64, 1].min(1)
    assert np.corrcoef(energy, opening)[0, 1] > 0.95

    # only the serving-reconstructable rows animate (46:64); jaw, brows,
    # contour static - so a perfect pipeline can reproduce the clip
    p = gt["pts3d"]
    static = np.ones(73, bool)
    static[46:64] = False
    assert np.ptp(p[:, static], axis=0).max() < 1e-6
    assert np.ptp(p[:, 46:64], axis=0).max() > 0.01


def test_oracle_motion_reproduces_gt_landmarks(subject):
    """Feeding GROUND-TRUTH mouth deltas + head pose through the real
    serving post stage (pipeline/animate._jit_post: smoothing, AMP,
    eyebrow cycling, projection) must land on the GT 2D landmarks - the
    convention proof (remapped rot +180, trans centring vs
    mean_translation, static brows/shoulders) behind every E2E metric."""
    import jax.numpy as jnp
    from dataclasses import replace

    from livespeechportraits_tpu.config import (
        MOUTH_INDICES, APCConfig, PersonConfig,
    )
    from livespeechportraits_tpu.models import apc as apc_mod
    import jax

    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from livespeechportraits_tpu.pipeline import build_person
    from livespeechportraits_tpu.train import datasets

    root, gt = subject
    enc = apc_mod.init_apc(jax.random.PRNGKey(0), APCConfig())
    build_person.build_person_pack(root, ["clip1"], apc_params=enc,
                                   bank_stride=8)
    cfg = PersonConfig(name="E2ETest", data_root=root)
    cfg = replace(
        cfg,
        audio2feature=replace(cfg.audio2feature, amp_params=(1.0, 1.0, 1.0)),
        audio2headpose=replace(cfg.audio2headpose, rot_amp=1.0,
                               trans_amp=1.0),
    )
    a = assets_mod.load_person(cfg)

    T = 240
    pred_feat = (gt["pts3d"] - a.mean_pts3d)[:, list(MOUTH_INDICES)]
    pred_feat = pred_feat.reshape(T, 75).astype(np.float32)
    clip = datasets.make_clip(  # the SAME remap/centring the A2H targets use
        audio_features=np.zeros((2 * T, 512), np.float32),
        pts3d=gt["pts3d"], rot_angles=gt["rot"], trans=gt["trans"][:, :, 0])
    pred_head = np.concatenate(
        [clip.headpose, clip.velocity], axis=1).astype(np.float32)

    brow_idx = jnp.asarray(np.arange(T) % a.candidate_eye_brow.shape[0])
    lm2d, sh2d, head, final = animate_mod._jit_post(
        cfg, jnp.asarray(pred_feat), jnp.asarray(pred_head),
        a.device("mean_pts3d"), a.device("std_mean_pts3d"),
        a.device("mean_translation"), a.device("candidate_eye_brow"),
        brow_idx, a.device("camera_intrinsic"), a.device("shoulder3D"),
        a.device("ref_trans"), a.scale)

    err = np.linalg.norm(np.asarray(lm2d) - gt["landmarks2d"], axis=-1)
    # smoothing (mouth sigma 1.5, pose sigmas 5/10) is the only distortion
    # of an already-smooth GT trajectory: sub-pixel on average
    assert err.mean() < 1.0, err.mean()
    assert err.max() < 6.0, err.max()
    # shoulders exactly static and equal to the GT rows (trans constant ->
    # the deduction term vanishes)
    sh_err = np.abs(np.asarray(sh2d) - gt["shoulders"][None]).max()
    assert sh_err < 0.35, sh_err


def test_stylisation_matches_h5_frames(subject):
    """The h5 target frames ARE the deterministic stylisation of the
    device-rasterised GT landmarks (up to JPEG q95): what a perfectly
    trained renderer would reproduce, and what PSNR is scored against."""
    import io as _io

    import h5py
    from PIL import Image

    root, gt = subject
    idx = [0, 60, 150]
    frames = ss.render_clip_frames(gt["landmarks2d"][idx], gt["shoulders"])
    with h5py.File(os.path.join(root, "clip1", "clip1.h5")) as f:
        stored = np.stack([
            np.asarray(Image.open(_io.BytesIO(f["clip1"][i]))) for i in idx])
    mse = ((frames.astype(np.float64) - stored) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 35.0, psnr


def test_multi_clip_corpus_phases(tmp_path):
    """The corpus-scale lever (e2e_subject --train_clips N): clips author
    with distinct dynamics, and the multi-clip sampler paths accept them
    (APC window sampler + audiovisual samplers over N clips)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import e2e_subject as e2e

    root = str(tmp_path / "MC")
    os.makedirs(root, exist_ok=True)
    e2e.phase_clips(root, train_frames=600, val_frames=60, n_clips=2)
    for name in ("clip1", "clip2", "val1"):
        assert os.path.exists(os.path.join(root, name, name + ".wav")), name
    g1 = dict(np.load(os.path.join(root, "gt_clip1.npz")))
    g2 = dict(np.load(os.path.join(root, "gt_clip2.npz")))
    # different seeds -> different prosody/pose dynamics (the point of
    # scaling the corpus)
    assert not np.allclose(g1["rot"], g2["rot"])
    assert not np.allclose(g1["env"], g2["env"])

    from livespeechportraits_tpu.config import (
        APCConfig, Audio2HeadposeConfig, WaveNetConfig,
    )
    from livespeechportraits_tpu.models import apc as apc_model
    from livespeechportraits_tpu.train import data_io, datasets

    import jax

    enc = apc_model.init_apc(jax.random.PRNGKey(0), APCConfig())
    # prepare_clip reads the pack-level mean (phase_pack runs first in
    # the real flow); provide it directly here
    np.save(os.path.join(root, "mean_pts3d.npy"),
            g1["pts3d"].mean(axis=0).astype(np.float32))
    clips = [data_io.prepare_clip(os.path.join(root, n), n, enc, APCConfig())
             for n in e2e.train_clip_names(2)]
    wn = WaveNetConfig(residual_layers=2, residual_blocks=1,
                       dilation_channels=8, residual_channels=8,
                       skip_channels=16, cond_channels=512)
    cfg = Audio2HeadposeConfig(wavenet=wn, frame_future=5)
    s = datasets.AudioVisualSampler(
        clips, task="audio2headpose", target_length=24,
        receptive_field=cfg.wavenet.receptive_field,
        frame_future=cfg.frame_future, start_point=28)
    batches = list(s.batches(batch_size=4, rng=np.random.default_rng(0)))
    assert len(batches) > 0
    # the two-clip sampler indexes ~twice the single-clip windows
    s1 = datasets.AudioVisualSampler(
        clips[:1], task="audio2headpose", target_length=24,
        receptive_field=cfg.wavenet.receptive_field,
        frame_future=cfg.frame_future, start_point=28)
    assert len(s) == 2 * len(s1)

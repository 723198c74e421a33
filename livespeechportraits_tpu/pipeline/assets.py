"""Per-person asset packs: the data surface of a released subject.

Mirrors what demo.py:80-108 loads for a subject id (May, Obama1, ...):
mean/std 3D landmarks, the 3D fit track (for mean translation + eyebrow
candidates), 4 candidate images, shoulder points, camera intrinsics, the
APC feature bank for LLE, and the reconstruction scale - plus the four
model checkpoints.  `load_person` reads a reference-format data directory;
`make_synthetic_person` fabricates a geometrically plausible pack with
random-init models so the full pipeline runs end-to-end without any
released checkpoint (SURVEY.md §7 'minimum end-to-end slice').
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np
import jax

from livespeechportraits_tpu.config import EYE_BROW_INDICES, PersonConfig
from livespeechportraits_tpu.models import apc, audio2feature, audio2headpose, feature2face
from livespeechportraits_tpu.utils import torch_convert


@dataclass
class PersonAssets:
    """Numpy-side per-subject data (device transfer happens in animate)."""

    mean_pts3d: np.ndarray  # [73, 3]
    std_mean_pts3d: np.ndarray  # [73, 3] mean of tracked pts3d
    mean_translation: np.ndarray  # [3]
    candidate_eye_brow: np.ndarray  # [Ncand, 16, 3] (pts3d[10:] eyebrow rows)
    candidate_images: np.ndarray  # [4, H, W, 3] float32 in [-1, 1]
    shoulders: np.ndarray  # [18, 2] 2D shoulder points (normalized frame)
    shoulder3D: np.ndarray  # [18, 3]
    ref_trans: np.ndarray  # [3] (trans[1], demo.py:100)
    camera_intrinsic: np.ndarray  # [3, 3]
    apc_feature_base: np.ndarray  # [N, 512] LLE bank
    scale: float  # id_scale
    image_pad: Optional[tuple] = None  # (top, bottom, left, right) or None

    def device(self, name: str):
        """Device-resident view of an array field, uploaded once and cached
        (the LLE bank and candidate images are MBs; re-uploading them per
        animate() call would dominate several pipeline stages)."""
        import jax.numpy as jnp

        cache = self.__dict__.setdefault("_device_cache", {})
        if name not in cache:
            cache[name] = jnp.asarray(getattr(self, name))
        return cache[name]


@dataclass
class PersonModels:
    """Param pytrees for the four learned stages."""

    apc: Dict[str, Any]
    audio2feature: Dict[str, Any]
    audio2headpose: Dict[str, Any]
    feature2face: Dict[str, Any]


def load_person(cfg: PersonConfig, data_root: Optional[str] = None) -> PersonAssets:
    """Load a reference-format subject data directory (demo.py:80-108)."""
    root = data_root or cfg.data_root
    mean_pts3d = np.load(os.path.join(root, "mean_pts3d.npy"))
    fit_data = np.load(cfg.fit_data_path or os.path.join(root, "3d_fit_data.npz"))
    tracked = np.load(
        cfg.pts3d_path or os.path.join(root, "tracked3D_normalized_pts_fix_contour.npy")
    )
    pts3d = tracked - mean_pts3d
    trans = fit_data["trans"][:, :, 0].astype(np.float32)

    cands = []
    for j in range(4):
        from PIL import Image

        img = np.asarray(
            Image.open(os.path.join(root, "candidates", f"normalized_full_{j}.jpg"))
        ).astype(np.float32)
        cands.append((img / 255.0 - 0.5) / 0.5)
    candidate_images = np.stack(cands)

    try:
        import scipy.io as sio

        scale = float(sio.loadmat(os.path.join(root, "id_scale.mat"))["scale"][0, 0])
    except FileNotFoundError:
        scale = 1.0

    return PersonAssets(
        mean_pts3d=mean_pts3d.astype(np.float32),
        std_mean_pts3d=tracked.mean(axis=0).astype(np.float32),
        mean_translation=trans.mean(axis=0),
        candidate_eye_brow=pts3d[10:, list(EYE_BROW_INDICES)].astype(np.float32),
        candidate_images=candidate_images,
        shoulders=np.load(os.path.join(root, "normalized_shoulder_points.npy")).astype(np.float32),
        shoulder3D=np.load(os.path.join(root, "shoulder_points3D.npy"))[1].astype(np.float32),
        ref_trans=trans[1],
        camera_intrinsic=np.load(os.path.join(root, "camera_intrinsic.npy")).astype(np.float32),
        apc_feature_base=np.load(os.path.join(root, "APC_feature_base.npy")).astype(np.float32),
        scale=scale,
    )


def quantize_person_models(models: PersonModels,
                           fold_bn: bool = True,
                           calibrate_inputs=None,
                           calibrate_dtype=None,
                           calibrate_margin: float = 1.0,
                           subpixel: bool = False,
                           s2d_input: bool = False,
                           split_skip: bool = False) -> PersonModels:
    """Return a copy with the renderer int8-quantized for inference
    (models.feature2face.quantize_generator; 'normal'/'large' only).
    The motion-stage models are unchanged - their cost is negligible
    next to the 512^2 U-Net.  fold_bn additionally folds the BN running
    stats into the conv scales (exact algebraic rewrite, eval-only -
    feature2face.fold_bn_generator).

    calibrate_inputs (a [B, H, W, input_nc] renderer batch or a list of
    them, e.g. animate.build_render_inputs) switches the activations to
    STATIC quantization: per-conv scales recorded once here, so serving
    skips every dynamic amax reduction (feature2face.calibrate_generator).
    calibrate_dtype should match the serving compute dtype (bf16)."""
    from dataclasses import replace as _replace

    from livespeechportraits_tpu.models import feature2face as _f2f

    f2f_params = _f2f.quantize_generator(models.feature2face)
    if fold_bn:
        f2f_params = _f2f.fold_bn_generator(f2f_params)
    if calibrate_inputs is not None:
        f2f_params = _f2f.calibrate_generator(
            f2f_params, calibrate_inputs, compute_dtype=calibrate_dtype,
            margin=calibrate_margin)
    return transform_person_models(
        _replace(models, feature2face=f2f_params),
        subpixel=subpixel, s2d_input=s2d_input, split_skip=split_skip)


def transform_person_models(models: PersonModels,
                            subpixel: bool = False,
                            s2d_input: bool = False,
                            split_skip: bool = False) -> PersonModels:
    """Structural rewrites of the renderer that are math-exact on float
    AND int8 trees (nn_core's *_from_conv3x3 handle both 'w' and 'w_q'
    layers), so the rewrites can be benchmarked on the exact bf16 path
    without quantization.

    subpixel: rewrite upsample+3x3 up convs into a subpixel form - with a
    quantized tree this must come after calibration.  True/'four' = 4x
    2x2 convs; 'single' = one 3x3 conv with 4x output channels;
    'single_outermost' = only the to-RGB conv; 'dilated' = one transposed
    conv (see feature2face.subpixel_generator).
    s2d_input: pack the 13-channel input conv into space-to-depth form
    (incompatible with the split-candidate fast path; render raises).
    split_skip: concat-free split up convs (feature2face.
    split_skip_generator) - no stage materialises its skip concat;
    mutually exclusive with subpixel (same 'up' convs)."""
    from dataclasses import replace as _replace

    from livespeechportraits_tpu.models import feature2face as _f2f

    f2f_params = models.feature2face
    if subpixel:
        mode = "four" if subpixel is True else str(subpixel)
        base = mode.replace("_outermost", "")
        f2f_params = _f2f.subpixel_generator(
            f2f_params, mode=base,
            outermost_only=mode.endswith("_outermost"))
    if s2d_input:
        f2f_params = _f2f.s2d_input_generator(f2f_params)
    if split_skip:
        f2f_params = _f2f.split_skip_generator(f2f_params)
    return _replace(models, feature2face=f2f_params)


def load_person_models(cfg: PersonConfig) -> PersonModels:
    """Convert the subject's reference .pkl checkpoints (demo.py:144-171).

    A stage whose ``ckp_path`` is empty falls back to random init (with a
    printed note) instead of crashing: a person pack built from scratch
    by pipeline/build_person.py has data files but no torch checkpoints -
    its trained weights arrive via ``load_trained_person_models`` (the
    --*_ckpt demo flags), which this random-init base composes with.  A
    NON-empty path that fails to load still raises."""
    missing = []

    def _sd(path: str, what: str):
        if not path:
            missing.append(what)
            return None
        return torch_convert.load_state_dict_numpy(path)

    sd_apc = _sd(cfg.apc.ckpt_path, "APC")
    sd_a2f = _sd(cfg.audio2feature.ckpt_path, "Audio2Feature")
    sd_a2h = _sd(cfg.audio2headpose.ckpt_path, "Audio2Headpose")
    sd_f2f = _sd(cfg.feature2face.ckpt_path, "Feature2Face")
    if missing:
        print(f"no torch checkpoint configured for {', '.join(missing)}; "
              "random-init (override with --apc_ckpt/--a2f_ckpt/--a2h_ckpt/"
              "--f2f_ckpt trainer checkpoints)")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    return PersonModels(
        apc=torch_convert.convert_apc(sd_apc, cfg.apc)
        if sd_apc is not None else apc.init_apc(k1, cfg.apc),
        audio2feature=torch_convert.convert_audio2feature(sd_a2f, cfg.audio2feature)
        if sd_a2f is not None else audio2feature.init_audio2feature(
            k2, cfg.audio2feature),
        audio2headpose=torch_convert.convert_audio2headpose(sd_a2h, cfg.audio2headpose)
        if sd_a2h is not None else audio2headpose.init_audio2headpose(
            k3, cfg.audio2headpose),
        feature2face=torch_convert.convert_feature2face_g(
            sd_f2f, cfg.feature2face.size,
            num_downs=cfg.feature2face.n_downsample)
        if sd_f2f is not None else feature2face.init_generator(
            k4, cfg.feature2face),
    )


def load_trained_person_models(
    cfg: PersonConfig,
    base: Optional[PersonModels] = None,
    f2f_ckpt: str = "",
    a2f_ckpt: str = "",
    a2h_ckpt: str = "",
    apc_ckpt: str = "",
    step: Optional[int] = None,
) -> PersonModels:
    """Slot orbax checkpoints produced by THIS framework's trainers into
    a serving PersonModels - the train->serve loop the reference leaves
    manual (its demo reads released torch .pkl files only,
    demo.py:144-171; it ships no trainer at all).

    Each ``*_ckpt`` is a trainer run's ``<checkpoints_dir>/<name>/ckpt``
    directory (train.py / trainer.py layout); ``step`` picks an epoch
    (default: the best-validation save ``<dir>_best`` when the trainer
    kept one, else the latest epoch of ``<dir>``).  ``base`` supplies the stages not overridden
    (default: random-init from ``cfg``).  A QAT-trained generator
    (trainer ``qat=True``) restores through a tagged template and is
    stripped to the plain float tree; trainer-baked activation scales
    are not carried - serving re-quantizes and recalibrates via
    ``quantize_person_models``, which records equally valid scales on
    real render inputs."""
    from dataclasses import replace as _replace

    from livespeechportraits_tpu.utils import checkpoint as ckpt_mod

    if step is None:
        # serve the best-validation epoch when the trainer kept one
        # (<dir>_best, TrainLoopConfig.save_best); an explicit step
        # always refers to the given directory
        f2f_ckpt = ckpt_mod.prefer_best(f2f_ckpt)
        a2f_ckpt = ckpt_mod.prefer_best(a2f_ckpt)
        a2h_ckpt = ckpt_mod.prefer_best(a2h_ckpt)
        apc_ckpt = ckpt_mod.prefer_best(apc_ckpt)

    if base is None:
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        base = PersonModels(
            apc=apc.init_apc(k1, cfg.apc),
            audio2feature=audio2feature.init_audio2feature(k2, cfg.audio2feature),
            audio2headpose=audio2headpose.init_audio2headpose(k3, cfg.audio2headpose),
            feature2face=feature2face.init_generator(k4, cfg.feature2face),
        )
    def _restore_into(tmpl, raw, what: str):
        """rebuild + validate: a checkpoint trained under a different
        config fails HERE with the mismatching leaves named, not at
        apply time with an opaque shape error."""
        try:
            got = ckpt_mod.rebuild(tmpl, raw)
        except (KeyError, IndexError, TypeError, ValueError) as e:
            raise ValueError(
                f"{what} checkpoint does not match the person config's "
                f"architecture (missing piece: {e!r}); pass the cfg the "
                "model was trained with") from e
        bad = [
            (jax.tree_util.keystr(kp), np.shape(t), np.shape(g))
            for (kp, t), (_, g) in zip(
                jax.tree_util.tree_flatten_with_path(tmpl)[0],
                jax.tree_util.tree_flatten_with_path(got)[0])
            if np.shape(t) != np.shape(g)
        ]
        if bad:
            raise ValueError(
                f"{what} checkpoint shapes do not match the person config "
                f"(first mismatches, template vs checkpoint: {bad[:3]}); "
                "pass the cfg the model was trained with")
        return got

    models = base
    if f2f_ckpt:
        # restores the full dual-state checkpoint (G+D+opt moments) and
        # keeps only G params - a one-time boot cost; production boots
        # use the serving artifact (save_models_artifact), which stores
        # exactly the serving trees
        raw = ckpt_mod.restore_checkpoint(f2f_ckpt, step)
        g_raw = raw["G"]["params"]
        tmpl = feature2face.init_generator(jax.random.PRNGKey(0), cfg.feature2face)
        if feature2face.is_qat_generator({"net": g_raw}):
            tmpl = feature2face.qat_generator(tmpl)
        g = {"net": _restore_into(tmpl["net"], g_raw, "feature2face"),
             "size": cfg.feature2face.size}
        if feature2face.is_qat_generator(g):
            g = feature2face.strip_qat_generator(g)
        models = _replace(models, feature2face=g)
    if a2f_ckpt:
        raw = ckpt_mod.restore_checkpoint(a2f_ckpt, step)
        tmpl = audio2feature.init_audio2feature(jax.random.PRNGKey(0),
                                                cfg.audio2feature)
        models = _replace(models, audio2feature=_restore_into(
            tmpl, raw["params"], "audio2feature"))
    if a2h_ckpt:
        raw = ckpt_mod.restore_checkpoint(a2h_ckpt, step)
        tmpl = audio2headpose.init_audio2headpose(jax.random.PRNGKey(0),
                                                  cfg.audio2headpose)
        models = _replace(models, audio2headpose=_restore_into(
            tmpl, raw["params"], "audio2headpose"))
    if apc_ckpt:
        # A trainer (`train.py --task apc`) checkpoint: {"encoder","head"};
        # serving keeps the encoder only.  NOTE: the person's LLE feature
        # bank (assets.apc_feature_base) must have been computed with the
        # SAME encoder, or manifold projection maps into the wrong space.
        raw = ckpt_mod.restore_checkpoint(apc_ckpt, step)
        tmpl = apc.init_apc_pretrain(jax.random.PRNGKey(0), cfg.apc)
        models = _replace(models, apc=_restore_into(
            tmpl, raw["params"], "apc")["encoder"])
    return models


def load_trained_discriminator(cfg: PersonConfig, f2f_ckpt: str,
                               step: Optional[int] = None):
    """The trained multiscale-PatchGAN discriminator params from a
    Feature2Face trainer checkpoint ({"G","D"} dual state).

    Used as the learned backbone of utils/metrics.d_feature_distance -
    the GAN's own FM feature space (the reference's FM loss measures
    distances in exactly this space, feature2face_model.py:129-156),
    available for any subject trained in-framework with no external
    weights."""
    from livespeechportraits_tpu.utils import checkpoint as ckpt_mod

    raw = ckpt_mod.restore_checkpoint(f2f_ckpt, step)
    tmpl = feature2face.init_discriminator(jax.random.PRNGKey(0),
                                           cfg.feature2face)
    try:
        got = ckpt_mod.rebuild(tmpl, raw["D"]["params"])
    except (KeyError, IndexError, TypeError, ValueError) as e:
        raise ValueError(
            "discriminator checkpoint does not match the person config's "
            f"architecture (missing piece: {e!r}); pass the cfg it was "
            "trained with (ndf/num_D/n_layers_D)") from e
    bad = [
        (jax.tree_util.keystr(kp), np.shape(t), np.shape(g))
        for (kp, t), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(tmpl)[0],
            jax.tree_util.tree_flatten_with_path(got)[0])
        if np.shape(t) != np.shape(g)
    ]
    if bad:
        raise ValueError(
            "discriminator checkpoint shapes do not match the person "
            f"config (first mismatches, template vs checkpoint: {bad[:3]}); "
            "pass the cfg it was trained with")
    return got


# ---------------------------------------------------------------------------
# Synthetic person (runs the full pipeline with no released data)
# ---------------------------------------------------------------------------


def _synthetic_face_landmarks() -> np.ndarray:
    """A plausible 73-point 3D face in the tracker's coordinate frame:
    roughly centred at the origin, ~0.2 units across, mouth around rows
    46-63, eyebrows at their reference indices."""
    rng = np.random.default_rng(1234)
    pts = np.zeros((73, 3), np.float32)
    # contour 0-14: ellipse
    ang = np.linspace(-np.pi * 0.8, np.pi * 0.8, 15)
    pts[0:15] = np.stack([0.1 * np.sin(ang), -0.1 * np.cos(ang), np.zeros(15)], 1)
    # brows 15-26
    pts[15:21] = [[0.02 + 0.008 * i, 0.06, 0.01] for i in range(6)]
    pts[21:27] = [[-0.02 - 0.008 * i, 0.06, 0.01] for i in range(6)]
    # eyes 27-34 + 65-72
    pts[27:31] = [[0.04 - 0.005 * i, 0.03, 0.012] for i in range(4)]
    pts[31:35] = [[-0.04 + 0.005 * i, 0.03, 0.012] for i in range(4)]
    pts[65:73] = pts[27:35] + np.array([0.0, 0.005, 0.0], np.float32)
    # nose 35-45
    pts[35:46] = [[0.0, 0.02 - 0.006 * i, 0.02] for i in range(11)]
    # mouth 46-64
    mang = np.linspace(0, 2 * np.pi, 18, endpoint=False)
    pts[46:64] = np.stack(
        [0.03 * np.cos(mang), -0.05 + 0.015 * np.sin(mang), np.full(18, 0.015)], 1
    )
    pts[64] = [0.0, -0.05, 0.015]
    pts += rng.normal(0, 1e-3, pts.shape)
    return pts


def make_synthetic_person(
    cfg: PersonConfig, key: Optional[jax.Array] = None, image_size: int = 512,
    bank_size: int = 256, skip_models: bool = False,
) -> tuple[PersonAssets, Optional[PersonModels]]:
    """Fabricate an asset pack + random-init models.

    The geometry is arranged so the projected face lands inside the image:
    camera at fx=fy=image_size*2.4, cx=cy=image_size/2, face at z ~ 1.
    skip_models=True returns (assets, None) - for artifact-first serving
    boots where the model trees come from a saved .npz and the init here
    would be discarded work (a 512^2 generator init is not free).
    """
    if key is None:
        # deterministic per-name seed: Python's hash() is salted per
        # process (and `x and 0 or y` always takes y), which made every
        # keyless synthetic boot nondeterministic across runs
        import zlib

        seed = 0 if cfg.name == "Synthetic" else \
            zlib.crc32(cfg.name.encode()) % 2**31
        key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(0)

    mean_pts3d = _synthetic_face_landmarks()
    tracked = mean_pts3d[None] + rng.normal(0, 2e-3, (40, 73, 3)).astype(np.float32)

    f = image_size * 2.4
    K = np.array(
        [[f, 0, image_size / 2], [0, f, image_size / 2], [0, 0, 1]], np.float32
    )
    mean_translation = np.array([0.0, 0.05, 1.0], np.float32)

    cands = rng.uniform(-0.3, 0.3, (4, image_size, image_size, 3)).astype(np.float32)
    shoulder_y = image_size * 0.8
    xs = np.linspace(image_size * 0.2, image_size * 0.8, 9, dtype=np.float32)
    shoulders2d = np.concatenate(
        [np.stack([xs, np.full(9, shoulder_y)], 1), np.stack([xs, np.full(9, shoulder_y + 14)], 1)]
    )
    # 3D shoulders placed so K-projection lands near shoulders2d at z=1
    sh3 = np.concatenate(
        [
            np.stack([(xs - image_size / 2) / f, np.full(9, (shoulder_y - image_size / 2) / f), np.ones(9)], 1),
            np.stack([(xs - image_size / 2) / f, np.full(9, (shoulder_y + 14 - image_size / 2) / f), np.ones(9)], 1),
        ]
    ).astype(np.float32)

    assets = PersonAssets(
        mean_pts3d=mean_pts3d,
        std_mean_pts3d=tracked.mean(axis=0),
        mean_translation=mean_translation,
        candidate_eye_brow=(tracked - mean_pts3d)[10:, list(EYE_BROW_INDICES)],
        candidate_images=cands,
        shoulders=shoulders2d,
        shoulder3D=sh3,
        ref_trans=mean_translation.copy(),
        camera_intrinsic=K,
        apc_feature_base=rng.normal(0, 1, (bank_size, cfg.apc.hidden_size)).astype(np.float32),
        scale=1.0,
    )

    if skip_models:
        return assets, None
    k1, k2, k3, k4 = jax.random.split(key, 4)
    models = PersonModels(
        apc=apc.init_apc(k1, cfg.apc),
        audio2feature=audio2feature.init_audio2feature(k2, cfg.audio2feature),
        audio2headpose=audio2headpose.init_audio2headpose(k3, cfg.audio2headpose),
        feature2face=feature2face.init_generator(k4, cfg.feature2face),
    )
    return assets, models


# ---------------------------------------------------------------------------
# Serving artifact: one-file save/load of the (possibly quantized +
# calibrated) model trees, so a server boot is a file read instead of a
# re-quantize/re-calibrate.  The reference has no deployment artifact at
# all (demo.py re-reads four torch .pkl files per run, demo.py:144-171).
# ---------------------------------------------------------------------------


def _flatten_tree(tree, prefix: str, out: dict):
    if isinstance(tree, dict):
        return {"t": "d",
                "k": {k: _flatten_tree(v, f"{prefix}.{k}", out)
                      for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"t": "l" if isinstance(tree, list) else "u",
                "i": [_flatten_tree(v, f"{prefix}.{n}", out)
                      for n, v in enumerate(tree)]}
    if isinstance(tree, (str, int, float, bool)) or tree is None:
        return {"t": "p", "v": tree}
    arr = np.asarray(tree)
    spec = {"t": "a", "key": prefix}
    if arr.dtype.name == "bfloat16":
        # npz has no bf16: store as f32 but record the dtype so the load
        # restores bit-identical bf16 leaves (f32 is a superset of bf16).
        spec["dt"] = "bfloat16"
        arr = arr.astype(np.float32)
    out[prefix] = arr
    return spec


def _unflatten_tree(spec, arrays):
    t = spec["t"]
    if t == "d":
        return {k: _unflatten_tree(v, arrays) for k, v in spec["k"].items()}
    if t in ("l", "u"):
        seq = [_unflatten_tree(v, arrays) for v in spec["i"]]
        return seq if t == "l" else tuple(seq)
    if t == "p":
        return spec["v"]
    arr = arrays[spec["key"]]
    if spec.get("dt") == "bfloat16":
        import ml_dtypes

        arr = arr.astype(ml_dtypes.bfloat16)
    return arr


def save_models_artifact(models: PersonModels, path: str) -> str:
    """Serialise all four model trees (int8 weights, calibrated scales,
    subpixel forms - whatever the trees hold) into ONE .npz with a JSON
    structure manifest.  Returns the path written."""
    import json

    arrays: dict = {}
    manifest = {
        field: _flatten_tree(getattr(models, field), field, arrays)
        for field in ("apc", "audio2feature", "audio2headpose", "feature2face")
    }
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    with open(path, "wb") as f:  # exact name: np.savez on a handle does
        np.savez(f, **arrays)    # not append .npz
    return path


def load_models_artifact(path: str) -> PersonModels:
    """Inverse of save_models_artifact (arrays land on the default device
    lazily, at first use, like any host constant)."""
    import json

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    manifest = json.loads(bytes(arrays.pop("__manifest__")).decode())
    return PersonModels(**{
        field: _unflatten_tree(spec, arrays)
        for field, spec in manifest.items()
    })

"""Reference-format training-data ingestion.

Capability parity with the data-loading halves of
datasets/audiovisual_dataset.py:114-208 and datasets/face_dataset.py:70-159:

* `prepare_clip` - load a clip's wav (denoised preferred), compute 120 Hz
  mel + APC features **once and cache them to .npy** exactly like the
  reference's `*_APC_feature_*.npy` flow (audiovisual_dataset.py:176-198),
  read its `3d_fit_data.npz` / tracked pts, and assemble a
  train.datasets.ClipData.
* `load_face_clip` - read an h5-packed jpg frame store + 2D landmarks +
  crop parameters (`change_paras.npz`) + candidate images (normalising
  and caching `normalized_full_*.jpg` on first run like
  face_dataset.py:119-129) and return a FaceFrameSampler.
"""

from __future__ import annotations

import io
import os
from collections import OrderedDict
from typing import Optional

import numpy as np

from livespeechportraits_tpu.config import APCConfig
from livespeechportraits_tpu.models import apc as apc_model
from livespeechportraits_tpu.ops import mel as mel_ops
from livespeechportraits_tpu.pipeline import video as video_mod
from livespeechportraits_tpu.train import datasets


def compute_apc_features(audio: np.ndarray, apc_params,
                         residual: bool = False) -> np.ndarray:
    """wav [-1,1] -> [2T, hidden] APC features (one mel jit + one GRU jit).

    `residual` must match the encoder's training flag (cfg.apc.residual)."""
    import jax.numpy as jnp

    mel80 = mel_ops.compute_mel_sequence(audio)
    return np.asarray(apc_model.encode(apc_params, jnp.asarray(mel80)[None],
                                       residual=residual)[0])


def _params_digest(params) -> str:
    """Cheap stable digest of a param pytree (crc32 over leaf bytes)."""
    import zlib

    import jax

    crc = 0
    for leaf in jax.tree.leaves(params):
        crc = zlib.crc32(np.ascontiguousarray(np.asarray(leaf)).tobytes(), crc)
    return f"{crc:08x}"


def prepare_clip(
    clip_root: str,
    clip_name: str,
    apc_params,
    apc_cfg: APCConfig,
    use_delta_pts: bool = True,
    mean_pts3d: Optional[np.ndarray] = None,
    cache_tag: str = "tpu",
) -> datasets.ClipData:
    """Load one reference-format clip directory into a ClipData.

    Expects <clip_root>/<clip_name>{_denoise,}.wav, 3d_fit_data.npz and
    (for normalised points) tracked3D_normalized_pts_fix_contour.npy; APC
    features are cached next to the wav.
    """
    den = os.path.join(clip_root, clip_name + "_denoise.wav")
    wav_path = den if os.path.exists(den) else os.path.join(clip_root, clip_name + ".wav")
    # the cache key carries a digest of the encoder params: switching
    # --apc_ckpt must not silently reuse features another encoder produced
    cache = os.path.join(
        clip_root,
        f"{clip_name}_APC_feature_{cache_tag}_{_params_digest(apc_params)}.npy")
    if os.path.exists(cache):
        feats = np.load(cache).astype(np.float32)
    else:
        audio = video_mod.load_wav(wav_path)
        feats = compute_apc_features(audio, apc_params,
                                     residual=apc_cfg.residual)
        np.save(cache, feats)

    fit = np.load(os.path.join(clip_root, "3d_fit_data.npz"))
    tracked_path = os.path.join(clip_root, "tracked3D_normalized_pts_fix_contour.npy")
    if os.path.exists(tracked_path):
        pts3d = np.load(tracked_path).astype(np.float32)
    else:
        pts3d = fit["pts_3d"].astype(np.float32)
    if use_delta_pts:
        if mean_pts3d is None:
            mean_path = os.path.join(
                os.path.dirname(os.path.normpath(clip_root)), "mean_pts3d.npy")
            mean_pts3d = np.load(mean_path)
        pts3d = pts3d - mean_pts3d

    return datasets.make_clip(
        audio_features=feats,
        pts3d=pts3d,
        rot_angles=fit["rot_angles"].astype(np.float32),
        trans=fit["trans"][:, :, 0].astype(np.float32),
    )


class LazyH5Frames:
    """Per-index lazy decode of an h5-packed jpg frame store.

    The reference reads h5 bytes and jpg-decodes per `__getitem__`
    (face_dataset.py:190-193); a real subject clip is ~18k frames of 512^2
    RGB (~14 GB decoded), far too large to materialise.  This holds only
    the h5 path + crop normalisation; frames decode on access with a small
    LRU cache.  `len()`, `[i]` and `.shape` mirror an [N, 512, 512, 3]
    uint8 ndarray so FaceFrameSampler accepts either form.
    """

    def __init__(self, h5_path: str, key: str, normalise, cache_frames: int = 64):
        import h5py

        self._path = h5_path
        self._key = key
        self._normalise = normalise
        self._file = None  # opened lazily (h5 handles don't survive fork)
        with h5py.File(h5_path, "r") as f:
            self._n = len(f[key])
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cap = int(cache_frames)
        self.shape = (self._n, 512, 512, 3)

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i) -> np.ndarray:
        from PIL import Image

        i = int(i)
        if i < 0:
            i += self._n
        if i in self._cache:
            self._cache.move_to_end(i)
            return self._cache[i]
        if self._file is None:
            import h5py

            self._file = h5py.File(self._path, "r")
        raw = np.asarray(Image.open(io.BytesIO(self._file[self._key][i])))
        img = self._normalise(raw)
        if self._cap > 0:
            self._cache[i] = img
            while len(self._cache) > self._cap:
                self._cache.popitem(last=False)
        return img


def make_change_paras_normalise(clip_root: str):
    """The clip's resize/centre-crop normalisation (change_paras.npz scale
    + 512-crop around (xc, yc), zero-padding when the crop exceeds the
    frame, face_dataset.py:83-95), as a reusable closure."""
    from PIL import Image

    paras = np.load(os.path.join(clip_root, "change_paras.npz"))
    scale, xc, yc = float(paras["scale"]), int(paras["xc"]), int(paras["yc"])

    def normalise(img: np.ndarray) -> np.ndarray:
        im = Image.fromarray(img)
        w, h = im.size
        im = im.resize((int(w * scale), int(h * scale)))
        arr = np.asarray(im)
        x0, x1 = xc - 256, xc + 256
        y0, y1 = yc - 256, yc + 256
        out = np.zeros((512, 512, 3), arr.dtype)
        sx0, sx1 = max(x0, 0), min(x1, arr.shape[1])
        sy0, sy1 = max(y0, 0), min(y1, arr.shape[0])
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = arr[sy0:sy1, sx0:sx1]
        return out

    return normalise


def load_face_clip(
    clip_root: str,
    clip_name: str,
    load_size: int = 512,
    frame_jump: int = 1,
    eager: bool = False,
    cache_frames: int = 64,
    emit_weight_mask: bool = False,
) -> datasets.FaceFrameSampler:
    """Load a reference-format renderer-training clip (h5 frames).

    Frames decode lazily per sampled index (LazyH5Frames) by default,
    matching the reference's per-item h5 read (face_dataset.py:190-193);
    `eager=True` materialises the whole clip (only sane for short clips).
    Candidate images are normalised and cached to disk on first run.
    """
    from PIL import Image

    h5_path = os.path.join(clip_root, clip_name + ".h5")
    normalise = make_change_paras_normalise(clip_root)

    images = LazyH5Frames(h5_path, clip_name, normalise, cache_frames=cache_frames)
    if eager:
        images = np.stack([images[i] for i in range(len(images))])
    landmarks = np.load(
        os.path.join(clip_root, "tracked2D_normalized_pts_fix_contour.npy")
    ).astype(np.float32)
    shoulders = np.load(os.path.join(clip_root, "normalized_shoulder_points.npy")).astype(np.float32)

    cands = []
    for j in range(4):
        norm_path = os.path.join(clip_root, "candidates", f"normalized_full_{j}.jpg")
        if os.path.exists(norm_path):
            img = np.asarray(Image.open(norm_path))
        else:  # normalise + cache on first run (face_dataset.py:119-129)
            raw = np.asarray(Image.open(os.path.join(clip_root, "candidates", f"full_{j}.jpg")))
            Image.fromarray(normalise(raw)).save(norm_path)
            # read the JPEG back so the FIRST run trains on the same
            # (lossily cached) pixels every later run - and serve-time
            # assets.load_person - will read
            img = np.asarray(Image.open(norm_path))
        cands.append((img.astype(np.float32) / 255.0 - 0.5) / 0.5)

    return datasets.FaceFrameSampler(
        images=images, landmarks=landmarks, shoulders=shoulders,
        candidates=np.stack(cands), load_size=load_size, frame_jump=frame_jump,
        # no training step consumes the mask (the reference's own MaskedL1
        # call is commented out, feature2face_model.py:139) - skipping it
        # saves a 1 MB/sample host fillPoly+upload; opt back in for
        # analysis paths that want it
        emit_weight_mask=emit_weight_mask,
    )

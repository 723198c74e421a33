"""The six-stage audio->video inference pipeline.

Capability parity with demo.py:176-272, re-designed so each stage is one
(or a few) jitted device programs instead of per-frame Python loops:

    1. mel + APC features      - one fused framing jit + one GRU-stack jit
    2. LLE manifold projection - one matmul-KNN + batched solve jit
    3. Audio2Mouth             - one whole-sequence LSTM jit
    4. Audio2Headpose          - ONE lax.scan (streaming WaveNet + on-device
                                 GMM sampling; the reference loops frames
                                 with CPU sampling)
    5. post-processing         - smoothing/AMP/projection, all batched jnp
    6. rendering               - device rasteriser + U-Net in bf16, frames
                                 batched to fill the MXU

Per-stage wall-clock is collected in `AnimateResult.stage_ms` (the
reference has no profiling at all - SURVEY.md §5).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from livespeechportraits_tpu.config import (
    EYE_BROW_INDICES,
    MOUTH_INDICES,
    PersonConfig,
)
from livespeechportraits_tpu.models import apc as apc_model
from livespeechportraits_tpu.models import audio2feature as a2f_model
from livespeechportraits_tpu.models import audio2headpose as a2h_model
from livespeechportraits_tpu.models import feature2face as f2f_model
from livespeechportraits_tpu.ops import (
    geometry,
    manifold,
    mel,
    rasterize,
    rasterize_pallas,
    smoothing,
)
from livespeechportraits_tpu.pipeline.assets import PersonAssets, PersonModels


@dataclass
class AnimateResult:
    frames: np.ndarray  # [T, H, W, 3] uint8
    feature_maps: Optional[np.ndarray]  # [T, H, W] uint8 edge maps (if kept)
    landmarks: np.ndarray  # [T, 73, 2]
    headpose: np.ndarray  # [T, 6]
    pts3d: np.ndarray  # [T, 73, 3]
    nframe: int
    # Wall-clock per stage.  Keys mel_apc/lle/audio2mouth/headpose/post/
    # render_device cover device work (truthful only with profile=True);
    # 'render' is the host fetch of the finished uint8 frames.
    stage_ms: Dict[str, float] = field(default_factory=dict)
    # Host-link attribution for the frame egress: cumulative thread-time
    # of the fetch stage (device->host transfer IO wait) and the decode
    # stage (fused CPU-XLA decode of compressed transfers), plus whether
    # the two-thread fetch/decode split was engaged (non-passthrough
    # decode).  Lets a bench artifact separate link speed from pipeline
    # behaviour.
    link_ms: Dict[str, float] = field(default_factory=dict)

    @property
    def fps_audio_to_video(self) -> float:
        total_s = sum(self.stage_ms.values()) / 1e3
        return self.nframe / total_s if total_s > 0 else float("inf")


# Process-level pack4e prefix-size memory, keyed by (H, W, render_batch):
# the true coded bytes of the last decoded batch x safety margin.  Content
# is temporally stable within a subject; a stale value only costs one
# over- or under-fetch (the stream is self-delimiting and refetches).
_P4E_NEED: Dict[Any, int] = {}


def _sync(x: jnp.ndarray) -> None:
    """Force completion of everything queued before x.

    block_until_ready is unreliable on tunnelled backends (it can return
    before remote execution finishes); fetching one scalar derived from x
    is a true barrier on the in-order device stream.
    """
    np.asarray(jnp.sum(x.ravel()[:1]))


def compute_motion(
    cfg: PersonConfig,
    assets: PersonAssets,
    models: PersonModels,
    audio: np.ndarray,
    key: jax.Array,
    stage_ms: Optional[Dict[str, float]] = None,
    profile: bool = False,
    valid_frames: Optional[int] = None,
    fused: bool = False,
):
    """Stages 1-5: audio -> (projected landmarks, shoulders, headpose, pts3d).

    Returns device arrays; `stage_ms` (if given) collects per-stage
    timings.  With profile=False the stages are dispatched asynchronously
    (fastest); profile=True inserts a device barrier per stage so the
    attribution is truthful.

    fused=True runs stages 1-5 as ONE device program (_jit_motion) -
    identical math, ~6x fewer dispatches; per-stage timings collapse to a
    single 'motion' entry, so it is skipped when profile=True.

    valid_frames: the unpadded audio's video-frame count
    (len(true_audio)/sr*60) when `audio` carries bucket padding (serve.py).
    Three dynamic-value (never dynamic-shape) adjustments make the result
    bit-identical to running on the unpadded audio while compiles are
    shared per bucket: features past the true end are repeat-padded with
    the last true row (what a2f.generate_sequence's tail handling sees on
    the unpadded run), the non-causal post stage reflect-remaps its padded
    tail, and the frame count is trimmed to valid_frames - frame_future.
    Every other stage is prefix-causal over the padded audio.
    """
    sm = stage_ms if stage_ms is not None else {}

    if valid_frames is not None and \
            int(valid_frames) <= cfg.audio2headpose.frame_future:
        # a negative valid_len would wrap Python negative indexing through
        # the padded tail and silently corrupt every downstream stage
        raise ValueError(
            f"valid_frames={valid_frames} must exceed the head-pose "
            f"lookahead frame_future={cfg.audio2headpose.frame_future} "
            "(audio too short for the bucket)")

    if fused and not profile:
        t0 = time.perf_counter()
        n_mel = 2 * int(np.asarray(audio).shape[0] / 16000 * 60)
        t_frames = n_mel // 2
        nframe = t_frames - cfg.audio2headpose.frame_future
        post_valid = None
        valid_len = None
        feat_valid = None
        if valid_frames is not None:
            post_valid = int(valid_frames) - cfg.audio2headpose.frame_future
            if post_valid < nframe:
                valid_len = jnp.asarray(post_valid, jnp.int32)
                # the feature repeat-pad clamps at the true FRAME count,
                # not the post-stage count - the staged path's 2*valid_frames-1
                feat_valid = jnp.asarray(int(valid_frames), jnp.int32)
        aa = {k: assets.device(k) for k in _MOTION_ASSET_KEYS}
        aa["scale"] = assets.scale
        brow_idx = jnp.asarray(
            np.arange(nframe) % assets.candidate_eye_brow.shape[0])
        landmarks2d, shoulders2d, head, final = _jit_motion(
            cfg, models.apc, models.audio2feature, models.audio2headpose,
            aa, jnp.asarray(audio), key, n_mel, brow_idx, valid_len,
            feat_valid)
        sm["motion"] = (time.perf_counter() - t0) * 1e3
        if post_valid is not None:
            nframe = min(nframe, post_valid)
        return landmarks2d, shoulders2d, head, final, nframe

    # ---- 1. deep audio features (demo.py:183-192)
    t0 = time.perf_counter()
    mel80 = mel.compute_mel_sequence(audio)  # [2T, 80]
    feats = apc_model.encode_fast(models.apc, mel80,
                                  residual=cfg.apc.residual)  # [2T, 512]
    if profile:
        _sync(feats)
    sm["mel_apc"] = (time.perf_counter() - t0) * 1e3

    # ---- 2. manifold projection (demo.py:196-200)
    t0 = time.perf_counter()
    if cfg.apc.use_LLE:
        feats = manifold.lle_project(
            feats, assets.device("apc_feature_base"),
            K=cfg.apc.Knear, percent=cfg.apc.LLE_percent,
        )
        if profile:
            _sync(feats)
    sm["lle"] = (time.perf_counter() - t0) * 1e3

    if valid_frames is not None:
        # Rows at or past the true end all become the last true row, which
        # is exactly the repeat-pad the unpadded run's A2F tail sees
        # (a2f.generate_sequence) - dynamic values, static shape.
        last = jnp.asarray(2 * valid_frames - 1, jnp.int32)
        feats = feats[jnp.minimum(jnp.arange(feats.shape[0]), last)]

    # ---- 3. mouth landmarks (demo.py:203-205)
    t0 = time.perf_counter()
    pred_feat = a2f_model.generate_sequence(
        models.audio2feature, feats, frame_future=cfg.audio2feature.frame_future,
        cfg=cfg.audio2feature,  # GMM-trained heads decode to component means
    )  # [T, 75]
    if profile:
        _sync(pred_feat)
    sm["audio2mouth"] = (time.perf_counter() - t0) * 1e3

    # ---- 4. head pose (demo.py:208-212)
    t0 = time.perf_counter()
    a2h_cfg = cfg.audio2headpose
    pre_headpose = jnp.zeros(a2h_cfg.wavenet.input_channels, jnp.float32)
    pred_head = a2h_model.generate_sequence(
        models.audio2headpose, a2h_cfg, feats, pre_headpose, key,
        sigma_scale=a2h_cfg.sample_sigma_scale,
    )  # [T - frame_future, 12]
    if profile:
        _sync(pred_head)
    sm["headpose"] = (time.perf_counter() - t0) * 1e3

    # ---- 5. post-processing (demo.py:215-255), ONE fused jit
    t0 = time.perf_counter()
    nframe = int(min(pred_feat.shape[0], pred_head.shape[0]))
    brow_idx = np.arange(nframe) % assets.candidate_eye_brow.shape[0]
    valid_len = None
    post_valid = None
    if valid_frames is not None:
        post_valid = int(valid_frames) - cfg.audio2headpose.frame_future
        if post_valid < nframe:
            valid_len = jnp.asarray(post_valid, jnp.int32)  # dynamic: no recompile per length
    landmarks2d, shoulders2d, head, final = _jit_post(
        cfg,
        pred_feat[:nframe],
        pred_head[:nframe],
        assets.device("mean_pts3d"),
        assets.device("std_mean_pts3d"),
        assets.device("mean_translation"),
        assets.device("candidate_eye_brow"),
        jnp.asarray(brow_idx),
        assets.device("camera_intrinsic"),
        assets.device("shoulder3D"),
        assets.device("ref_trans"),
        assets.scale,
        valid_len,
    )
    if post_valid is not None:
        nframe = min(nframe, post_valid)
    if profile:
        _sync(landmarks2d)
    sm["post"] = (time.perf_counter() - t0) * 1e3

    return landmarks2d, shoulders2d, head, final, nframe


@functools.partial(jax.jit, static_argnames=("cfg", "n_mel"))
def _jit_motion(cfg, apc_p, a2f_p, a2h_p, aa, audio, key, n_mel, brow_idx,
                valid_len=None, feat_valid=None):
    """Stages 1-5 as ONE device program (serving fast path).

    The staged path (compute_motion with profile semantics) dispatches
    >= 6 programs per request; each dispatch costs a host round-trip
    (~30 ms over this harness's relay).  This fuses mel -> APC -> LLE ->
    A2F -> A2H decode -> post into a single executable with identical
    math.  `aa` is the dict of subject asset arrays; valid_len is the
    dynamic bucket-padding length (see compute_motion).
    """
    mel80 = mel._mel_sequence_impl(audio, n_mel)
    feats = apc_model.apply_apc(apc_p, mel80[None],
                                residual=cfg.apc.residual)[0]
    if cfg.apc.use_LLE:
        feats = manifold.lle_project(
            feats, aa["apc_feature_base"], K=cfg.apc.Knear,
            percent=cfg.apc.LLE_percent)
    if feat_valid is not None:
        # repeat-pad features past the true end at the FRAME count (the
        # staged path's 2*valid_frames-1); clamping at the post-stage
        # valid_len would freeze the last 2*frame_future real rows early
        last = 2 * feat_valid - 1
        feats = feats[jnp.minimum(jnp.arange(feats.shape[0]), last)]
    pred_feat = a2f_model.generate_sequence(
        a2f_p, feats, frame_future=cfg.audio2feature.frame_future,
        cfg=cfg.audio2feature)
    a2h_cfg = cfg.audio2headpose
    pre_headpose = jnp.zeros(a2h_cfg.wavenet.input_channels, jnp.float32)
    pred_head = a2h_model.generate_sequence(
        a2h_p, a2h_cfg, feats, pre_headpose, key,
        sigma_scale=a2h_cfg.sample_sigma_scale)
    nframe = int(min(pred_feat.shape[0], pred_head.shape[0]))
    return _jit_post(
        cfg, pred_feat[:nframe], pred_head[:nframe], aa["mean_pts3d"],
        aa["std_mean_pts3d"], aa["mean_translation"], aa["candidate_eye_brow"],
        brow_idx, aa["camera_intrinsic"], aa["shoulder3D"], aa["ref_trans"],
        aa["scale"], valid_len,
    )


_MOTION_ASSET_KEYS = ("apc_feature_base", "mean_pts3d", "std_mean_pts3d",
                      "mean_translation", "candidate_eye_brow",
                      "camera_intrinsic", "shoulder3D", "ref_trans")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_post(cfg, pred_feat, pred_head, mean_pts3d, std_mean_pts3d,
              mean_translation, candidate_eye_brow, brow_idx, K, shoulder3D,
              ref_trans, scale, valid_len=None):
    """Fused stage-5 device program: smoothing, AMP, de-intersection,
    head-pose conditioning, eyebrow cycling, landmark + shoulder projection
    (demo.py:215-255) in one dispatch.

    valid_len (traced int scalar, optional): true sequence length when the
    inputs carry bucket padding (serve.py).  Every Gaussian smoothing pass
    builds its reflect extension from the valid rows only
    (ops/smoothing.gaussian_filter1d valid_len) and the global lip-flip
    statistic is masked to the valid rows, so outputs [0, valid_len) are
    bit-identical to running on the unpadded sequence while the compiled
    shape stays the bucket's.
    """
    a2f_cfg = cfg.audio2feature
    a2h_cfg = cfg.audio2headpose
    nframe = pred_feat.shape[0]

    valid = None
    if valid_len is not None:
        valid = jnp.arange(nframe) < valid_len

    pred_pts3d = jnp.zeros((nframe, 73, 3), jnp.float32)
    mouth = pred_feat.reshape(nframe, 25, 3)
    pred_pts3d = pred_pts3d.at[:, jnp.asarray(np.asarray(MOUTH_INDICES))].set(mouth)

    pred_pts3d = smoothing.landmark_smooth_3d(pred_pts3d, a2f_cfg.smooth_sigma,
                                              "only_mouth", valid_len=valid_len)
    pred_pts3d = smoothing.mouth_amp(pred_pts3d, True, a2f_cfg.amp_method, a2f_cfg.amp_params)
    pred_pts3d = pred_pts3d + mean_pts3d
    pred_pts3d = smoothing.solve_intersect_mouth(pred_pts3d, valid)

    head = pred_head[:, :6]
    head = head.at[:, :3].multiply(a2h_cfg.rot_amp)
    head = head.at[:, 3:].multiply(a2h_cfg.trans_amp)
    head = smoothing.headpose_smooth(head, a2h_cfg.smooth_sigmas, valid_len=valid_len)
    head = head.at[:, 3:].add(mean_translation)
    head = head.at[:, 0].add(180.0)  # x-axis convention flip (demo.py:232)

    final = jnp.broadcast_to(std_mean_pts3d, (nframe, 73, 3))
    final = final.at[:, 46:64].set(pred_pts3d[:, 46:64])
    brows = candidate_eye_brow[brow_idx] + mean_pts3d[jnp.asarray(np.asarray(EYE_BROW_INDICES))]
    final = final.at[:, jnp.asarray(np.asarray(EYE_BROW_INDICES))].set(brows)

    landmarks2d = geometry.project_landmarks(K, jnp.eye(3), jnp.zeros(3), scale, head, final)
    shoulders2d, _ = geometry.project_shoulders(
        K, shoulder3D, head[:, 3:], ref_trans, a2h_cfg.shoulder_amp
    )
    return landmarks2d, shoulders2d, head, final


def render_frames(
    cfg: PersonConfig,
    assets: PersonAssets,
    models: PersonModels,
    landmarks2d: jnp.ndarray,
    shoulders2d: jnp.ndarray,
    render_batch: int = 8,
    keep_feature_maps: bool = False,
    stage_ms: Optional[Dict[str, float]] = None,
    mesh=None,
    transfer: str = "rgb",
    split_cand: bool = False,
    link_ms: Optional[Dict[str, float]] = None,
):
    """Stage 6 (demo.py:258-272): rasterise + U-Net, batched over frames.

    transfer='yuv420' fetches frames as planar 4:2:0 (half the host-link
    bytes; chroma subsampled like any video encoding) and reassembles RGB
    on the host; 'jpeg' encodes a zonal-DCT code on device (~5.5x fewer
    bytes than yuv420, >30 dB fidelity-gated - pipeline/compress.py);
    'rgb' (default) is exact.

    With a `jax.sharding.Mesh`, each render batch is sharded over the
    mesh's `data` axis (frames are independent, so rendering scales
    near-linearly across chips over ICI; params are replicated).
    render_batch must then be a multiple of the data-axis size.
    """
    sm = stage_ms if stage_ms is not None else {}
    t0 = time.perf_counter()

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data", None, None))
        data_size = mesh.shape["data"]
        if render_batch % data_size != 0:
            raise ValueError(
                f"render_batch {render_batch} must divide over the data axis "
                f"({data_size} devices)")

    nframe = landmarks2d.shape[0]
    H = W = cfg.feature2face.load_size
    if assets.image_pad is not None:
        top, bottom, left, right = assets.image_pad
        shoulders2d = shoulders2d + jnp.asarray(
            [right - left, top - bottom], jnp.float32
        )

    cand = assets.device("candidate_images")  # [4, H, W, 3]
    cand_stack = jnp.concatenate(list(cand), axis=-1)  # [H, W, 12]
    compute_dtype = (
        jnp.bfloat16 if cfg.feature2face.precision == "bfloat16" else None
    )
    cand_down = None
    if split_cand:
        # the static candidate channels' outermost-conv contribution,
        # computed once per call instead of per frame
        cand_down = f2f_model.precompute_cand_down(
            models.feature2face, cand_stack, compute_dtype=compute_dtype)

    pad_to = -(-nframe // render_batch) * render_batch
    lm = jnp.concatenate(
        [landmarks2d, jnp.broadcast_to(landmarks2d[-1:], (pad_to - nframe, 73, 2))]
    )
    sh = jnp.concatenate(
        [shoulders2d, jnp.broadcast_to(shoulders2d[-1:], (pad_to - nframe,) + shoulders2d.shape[1:])]
    )

    # Dispatch every batch asynchronously (rasterise + render + uint8
    # conversion all on device), then fetch - host<->device transfer
    # overlaps with compute and each frame crosses the link once as uint8
    # (4x smaller than f32).
    # Pallas rasteriser on TPU (one VMEM-resident tile per grid step,
    # ~2.6x the XLA scan); XLA path elsewhere.
    if rasterize_pallas.supports_pallas():
        rasterize_fn = rasterize_pallas.rasterize_feature_maps_pallas
    else:
        rasterize_fn = rasterize.rasterize_feature_maps

    from concurrent.futures import ThreadPoolExecutor

    from livespeechportraits_tpu.pipeline import compress

    if transfer == "yuv420":
        decode = lambda p: compress.i420_to_rgb(p, H, W)  # noqa: E731
    elif transfer == "jpeg":
        decode = lambda p: compress.decode_to_rgb(p, H, W)  # noqa: E731
    elif transfer == "jpeg4":
        decode = lambda p: compress.decode_to_rgb_p4(p, H, W)  # noqa: E731
    elif transfer == "pack4e":
        decode = None  # handled by the prefix-fetch/decode pair below
    else:
        decode = lambda p: p  # noqa: E731

    # Fetch and decode run on TWO single-thread stages: the fetch thread
    # blocks on the device->host transfer (IO wait - the GIL is released
    # inside the transport), the decode thread runs the fused CPU-XLA
    # decode, and both overlap the device compute of later batches.  For
    # the jpeg transfer the two stages cost about the same (~155 ms
    # transfer + ~140 ms decode per 16-frame 512^2 batch on this host),
    # so pipelining them nearly halves the post-barrier fetch wall; for
    # raw transfers the decode stage is a passthrough and the extra
    # thread is idle.  (An earlier note here claimed a fetch/decode
    # split measured slower - that was measured on the raw-RGB path,
    # where decode is a memcpy and the split is pure churn.)  The main
    # thread keeps the device barrier for truthful render_device
    # attribution.
    link = link_ms if link_ms is not None else {}
    link["fetch_io_ms"] = 0.0
    link["decode_ms"] = 0.0
    link["fetch_bytes"] = 0
    link["split_engaged"] = transfer in ("yuv420", "jpeg", "jpeg4", "pack4e")

    def _timed_fetch(x):
        t = time.perf_counter()
        out = np.asarray(x)
        link["fetch_io_ms"] += (time.perf_counter() - t) * 1e3
        link["fetch_bytes"] += out.nbytes
        return out

    def _timed_decode(fut):
        raw = fut.result()
        t = time.perf_counter()
        out = decode(raw)
        link["decode_ms"] += (time.perf_counter() - t) * 1e3
        return out

    if transfer == "pack4e":
        # pack4e: the device packs each batch's entropy-coded frames
        # back-to-back in a static worst-case buffer; only a PREFIX of it
        # crosses the link.  The prefix size comes from the PREVIOUS
        # batch's true coded size (x safety margin; frame content is
        # temporally stable), snapped to one of N_BUCKETS linear bucket
        # sizes so only a handful of tiny device slice programs are ever
        # compiled (persistent-cached).  The stream is self-delimiting -
        # no length fetch, no extra round-trip; a too-short prefix is
        # detected by the decoder and refetched in full (rare, and only
        # after an abrupt content change).  The need estimate seeds from
        # the process-level cache (_P4E_NEED) so only the very first
        # batch of a process - not of every call - pays a full-cap fetch.
        cap_total = render_batch * compress.p4e_bytes_per_frame_cap(H, W)
        n_buckets = 32
        step = -(-cap_total // n_buckets)
        fetch_state = {"need": _P4E_NEED.get((H, W, render_batch),
                                             cap_total)}

        def _fetch_p4e(pair):
            flat, _total = pair
            want = max(1, min(fetch_state["need"], cap_total))
            bucket = min(cap_total, -(-want // step) * step)
            t = time.perf_counter()
            out = np.asarray(flat[:bucket])
            link["fetch_io_ms"] += (time.perf_counter() - t) * 1e3
            link["fetch_bytes"] += out.nbytes
            return out, flat

        def _decode_p4e(fut):
            prefix, flat = fut.result()
            t = time.perf_counter()
            try:
                rgb, consumed = compress.decode_to_rgb_p4e(
                    prefix, render_batch, H, W, return_consumed=True)
            except IndexError:
                t_re = time.perf_counter()
                prefix = np.asarray(flat)  # full refetch (rare)
                re_ms = (time.perf_counter() - t_re) * 1e3
                link["fetch_io_ms"] += re_ms
                link["fetch_bytes"] += prefix.nbytes
                t += re_ms / 1e3  # keep the refetch out of decode_ms
                rgb, consumed = compress.decode_to_rgb_p4e(
                    prefix, render_batch, H, W, return_consumed=True)
            fetch_state["need"] = int(consumed * 1.15)
            _P4E_NEED[(H, W, render_batch)] = fetch_state["need"]
            link["decode_ms"] += (time.perf_counter() - t) * 1e3
            return rgb

    pending: List[Any] = []
    maps_pending: List[Any] = []
    with ThreadPoolExecutor(1) as ex_fetch, ThreadPoolExecutor(1) as ex_dec:
        futs = []
        for start in range(0, pad_to, render_batch):
            lm_b = lm[start : start + render_batch]
            sh_b = sh[start : start + render_batch]
            if mesh is not None:
                lm_b = jax.device_put(lm_b, batch_sh)
                sh_b = jax.device_put(sh_b, batch_sh)
            edge = rasterize_fn(lm_b, sh_b, (H, W))  # [B, H, W]
            if split_cand:
                fn = {"yuv420": _jit_render_yuv420_edge,
                      "jpeg": _jit_render_jpeg_edge,
                      "jpeg4": _jit_render_jpeg4_edge,
                      "pack4e": _jit_render_pack4e_edge}.get(
                          transfer, _jit_render_edge)
                fake_u8 = fn(models.feature2face["net"], models.feature2face["size"],
                             edge[..., None], cand_down, compute_dtype)
            else:
                inp = jnp.concatenate(
                    [edge[..., None], jnp.broadcast_to(cand_stack, (render_batch, H, W, 12))],
                    axis=-1,
                )
                fn = {"yuv420": _jit_render_yuv420,
                      "jpeg": _jit_render_jpeg,
                      "jpeg4": _jit_render_jpeg4,
                      "pack4e": _jit_render_pack4e}.get(transfer, _jit_render)
                fake_u8 = fn(models.feature2face["net"], models.feature2face["size"],
                             inp, compute_dtype)
            if transfer == "pack4e":
                pending.append(fake_u8[0])
                fetched = ex_fetch.submit(_fetch_p4e, fake_u8)
                futs.append(ex_dec.submit(_decode_p4e, fetched))
            else:
                pending.append(fake_u8)
                fetched = ex_fetch.submit(_timed_fetch, fake_u8)
                futs.append(ex_dec.submit(_timed_decode, fetched))
            if keep_feature_maps:
                maps_pending.append(edge)
        if pending:
            _sync(pending[-1])  # true barrier: device stream is in-order
        sm["render_device"] = (time.perf_counter() - t0) * 1e3

        frames_u8 = np.concatenate([f.result() for f in futs])[:nframe]
    sm["render"] = (time.perf_counter() - t0) * 1e3 - sm["render_device"]

    fmap_u8 = None
    if keep_feature_maps:
        fmap_u8 = (np.concatenate([np.asarray(m) for m in maps_pending])[:nframe] * 255).astype(np.uint8)
    return frames_u8, fmap_u8



def build_render_inputs(
    cfg: PersonConfig,
    assets: PersonAssets,
    models: PersonModels,
    audio: np.ndarray,
    seed: int = 0,
    max_frames: int = 16,
) -> jnp.ndarray:
    """Run the motion stages on `audio` and return the first `max_frames`
    renderer input frames [N, H, W, 13] (edge channel + candidate stack),
    exactly as render_frames would feed the U-Net.

    Purpose: representative batches for int8 activation calibration
    (assets.quantize_person_models(calibrate_inputs=...)) - the scales
    must be measured on real rasterised edges + the subject's candidate
    images, not synthetic noise."""
    key = jax.random.PRNGKey(seed)
    landmarks2d, shoulders2d, _, _, nframe = compute_motion(
        cfg, assets, models, audio, key)
    n = min(nframe, max_frames)
    landmarks2d, shoulders2d = landmarks2d[:n], shoulders2d[:n]
    H = W = cfg.feature2face.load_size
    if assets.image_pad is not None:
        top, bottom, left, right = assets.image_pad
        shoulders2d = shoulders2d + jnp.asarray(
            [right - left, top - bottom], jnp.float32)
    rasterize_fn = (rasterize_pallas.rasterize_feature_maps_pallas
                    if rasterize_pallas.supports_pallas()
                    else rasterize.rasterize_feature_maps)
    edge = rasterize_fn(landmarks2d, shoulders2d, (H, W))
    cand = assets.device("candidate_images")
    cand_stack = jnp.concatenate(list(cand), axis=-1)
    return jnp.concatenate(
        [edge[..., None], jnp.broadcast_to(cand_stack, (n, H, W, 12))],
        axis=-1)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_edge(net, size, edge, cand_down, compute_dtype):
    """Split-candidate render: per-frame input is the edge channel only;
    the 12 static candidate channels enter as a precomputed conv output
    (f2f_model.precompute_cand_down) instead of being broadcast, re-read
    and re-convolved every frame."""
    y = f2f_model.apply_generator_edge(
        {"net": net, "size": size}, edge, cand_down, training=False,
        compute_dtype=compute_dtype,
    )
    return ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_yuv420_edge(net, size, edge, cand_down, compute_dtype):
    y = f2f_model.apply_generator_edge(
        {"net": net, "size": size}, edge, cand_down, training=False,
        compute_dtype=compute_dtype,
    )
    return _rgb_to_yuv420_packed(y)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render(net, size, inp, compute_dtype):
    """Render a frame batch and convert to uint8 on device (tensor2im
    parity, util/util.py:19-42) so each frame crosses the host link once,
    4x smaller than f32."""
    y, _ = f2f_model.apply_generator(
        {"net": net, "size": size}, inp, training=False, compute_dtype=compute_dtype
    )
    return ((y + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_jpeg(net, size, inp, compute_dtype):
    """Render and emit the JPEG-class zonal-DCT code on device (~5.5x
    fewer egress bytes than yuv420 at the default quality; fidelity-gated
    >30 dB like the yuv420 path - see pipeline/compress.py).  The DCT is
    two batched 8x8 matmuls, so the whole encoder fuses into the render
    program's epilogue."""
    from livespeechportraits_tpu.pipeline import compress

    img, _ = f2f_model.apply_generator(
        {"net": net, "size": size}, inp, training=False, compute_dtype=compute_dtype
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_jpeg_edge(net, size, edge, cand_down, compute_dtype):
    from livespeechportraits_tpu.pipeline import compress

    img = f2f_model.apply_generator_edge(
        {"net": net, "size": size}, edge, cand_down, training=False,
        compute_dtype=compute_dtype,
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_jpeg4(net, size, inp, compute_dtype):
    """Render and emit the pack4 code on device: the zonal-DCT coder's
    AC coefficients as 4-bit nibbles under a per-block shift exponent
    (compress.encode_rgb_frames_p4) - ~2.1x fewer egress bytes than the
    int8 zonal code (0.145 B/px at 512^2), same >30 dB serving gate."""
    from livespeechportraits_tpu.pipeline import compress

    img, _ = f2f_model.apply_generator(
        {"net": net, "size": size}, inp, training=False,
        compute_dtype=compute_dtype
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420_p4(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_jpeg4_edge(net, size, edge, cand_down, compute_dtype):
    from livespeechportraits_tpu.pipeline import compress

    img = f2f_model.apply_generator_edge(
        {"net": net, "size": size}, edge, cand_down, training=False,
        compute_dtype=compute_dtype,
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420_p4(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_pack4e(net, size, inp, compute_dtype):
    """Render and emit the pack4e entropy-coded stream on device: true
    variable-length coding (EOB-truncated ACs, delta-skipped DCs) packed
    back-to-back by a prefix-sum + scatter epilogue, so the host fetches
    only a prefix ~ the coded size (compress.encode_yuv420_p4e).  Returns
    (flat stream, total coded bytes)."""
    from livespeechportraits_tpu.pipeline import compress

    img, _ = f2f_model.apply_generator(
        {"net": net, "size": size}, inp, training=False,
        compute_dtype=compute_dtype
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420_p4e(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_pack4e_edge(net, size, edge, cand_down, compute_dtype):
    from livespeechportraits_tpu.pipeline import compress

    img = f2f_model.apply_generator_edge(
        {"net": net, "size": size}, edge, cand_down, training=False,
        compute_dtype=compute_dtype,
    )
    y, u, v = compress.rgb_to_yuv_planes(img.astype(jnp.float32))
    return compress.encode_yuv420_p4e(y, u, v)


@functools.partial(jax.jit, static_argnames=("size", "compute_dtype"))
def _jit_render_yuv420(net, size, inp, compute_dtype):
    """Render and emit planar YUV 4:2:0 (BT.601 full range) on device.

    Halves host-link traffic vs uint8 RGB (12 vs 24 bits/px); video
    encoders consume 4:2:0 anyway, so for serving this is free.  Returns
    (Y [B,H,W], U [B,H/2,W/2], V [B,H/2,W/2]) uint8.
    """
    img, _ = f2f_model.apply_generator(
        {"net": net, "size": size}, inp, training=False, compute_dtype=compute_dtype
    )
    return _rgb_to_yuv420_packed(img)


def _rgb_to_yuv420_packed(img: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] in [-1, 1] -> packed planar YUV 4:2:0 uint8."""
    rgb = (img + 1.0) * 127.5  # float [0, 255]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def down2(c):  # 2x2 chroma average
        B, H, W = c.shape
        return c.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))

    to_u8 = lambda c: jnp.clip(c + 0.5, 0, 255).astype(jnp.uint8)  # noqa: E731
    B, H, W = y.shape
    # Pack planes into ONE contiguous buffer per batch: a single host fetch
    # (per-fetch link latency dominates multi-plane transfers).
    return jnp.concatenate(
        [to_u8(y).reshape(B, -1), to_u8(down2(u)).reshape(B, -1),
         to_u8(down2(v)).reshape(B, -1)], axis=1)


def yuv420_unpack(packed: np.ndarray, h: int, w: int):
    """[B, h*w*3/2] packed planes -> (Y [B,h,w], U, V [B,h/2,w/2])."""
    B = packed.shape[0]
    y = packed[:, : h * w].reshape(B, h, w)
    q = (h // 2) * (w // 2)
    u = packed[:, h * w : h * w + q].reshape(B, h // 2, w // 2)
    v = packed[:, h * w + q :].reshape(B, h // 2, w // 2)
    return y, u, v


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Host-side inverse of _jit_render_yuv420 ([B,H,W]+2x[B,H/2,W/2] u8
    -> [B,H,W,3] u8; nearest chroma upsampling)."""
    yf = y.astype(np.float32)
    uf = np.repeat(np.repeat(u.astype(np.float32) - 128.0, 2, axis=1), 2, axis=2)
    vf = np.repeat(np.repeat(v.astype(np.float32) - 128.0, 2, axis=1), 2, axis=2)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def animate(
    cfg: PersonConfig,
    assets: PersonAssets,
    models: PersonModels,
    audio: np.ndarray,
    seed: int = 0,
    render_batch: int = 8,
    keep_feature_maps: bool = False,
    profile: bool = False,
    mesh=None,
    transfer: str = "rgb",
    valid_frames: Optional[int] = None,
    split_cand: bool = False,
    fused: bool = False,
) -> AnimateResult:
    """audio [-1,1] float32 @16 kHz -> photorealistic frames @60 FPS.

    mesh: optional jax.sharding.Mesh; rendering (the dominant stage) is
    then frame-sharded over its `data` axis.
    transfer: 'rgb' (exact), 'yuv420' (half the host-link bytes) or
    'jpeg' (on-device zonal-DCT code, ~11x fewer bytes than RGB).
    valid_frames: the unpadded audio's video-frame count when `audio` is
    bucket-padded (serve.py); outputs are bit-identical to the unpadded
    run, trimmed to valid_frames - frame_future, and only the needed
    render batches are dispatched (see compute_motion).
    """
    stage_ms: Dict[str, float] = {}
    key = jax.random.PRNGKey(seed)
    landmarks2d, shoulders2d, head, final_pts3d, nframe = compute_motion(
        cfg, assets, models, audio, key, stage_ms, profile=profile,
        valid_frames=valid_frames, fused=fused,
    )
    landmarks2d = landmarks2d[:nframe]
    shoulders2d = shoulders2d[:nframe]
    link_ms: Dict[str, float] = {}
    frames, fmaps = render_frames(
        cfg, assets, models, landmarks2d, shoulders2d,
        render_batch=render_batch, keep_feature_maps=keep_feature_maps,
        stage_ms=stage_ms, mesh=mesh, transfer=transfer, split_cand=split_cand,
        link_ms=link_ms,
    )
    return AnimateResult(
        frames=frames,
        feature_maps=fmaps,
        landmarks=np.asarray(landmarks2d),
        headpose=np.asarray(head)[:nframe],
        pts3d=np.asarray(final_pts3d)[:nframe],
        nframe=nframe,
        stage_ms=stage_ms,
        link_ms=link_ms,
    )

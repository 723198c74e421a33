"""Serving wrapper: the predict.py / Replicate-cog surface of the reference.

Capability parity with predict.py:33-308: a Predictor with setup() that
loads a subject once and predict(audio, ...) that caps the driving audio
(10 s in the reference, predict.py:145-153), runs the full pipeline, muxes
a video, and cleans its results directory per request.  No cog dependency:
the class is framework-agnostic and easy to mount behind any HTTP server.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from livespeechportraits_tpu.config import PersonConfig, load_person_config
from livespeechportraits_tpu.pipeline import animate as animate_mod
from livespeechportraits_tpu.pipeline import assets as assets_mod
from livespeechportraits_tpu.pipeline import video as video_mod


@dataclass
class PredictResult:
    video_path: str
    nframe: int
    wall_s: float
    stage_ms: dict


class Predictor:
    """Load-once / predict-many serving object (predict.py Predictor parity)."""

    def __init__(self, max_audio_seconds: float = 10.0,
                 results_dir: Optional[str] = None,
                 bucket_seconds: float = 1.0):
        """bucket_seconds > 0 pads each request's audio up to the next
        bucket so every pipeline program compiles once per bucket instead
        of once per audio length (XLA shapes are static).  Outputs are
        bit-identical to the unbucketed run: every stage before
        post-processing is prefix-causal (causal GRU/LSTM/AR decode over
        zero-padded audio, position-stable per-frame sample keys), and the
        non-causal post stage gets the true length as a dynamic scalar so
        its smoothing sees the exact reflect boundary of the unpadded
        sequence (animate.compute_motion valid_frames).  bucket_seconds=0
        compiles per distinct audio length instead."""
        self.max_audio_seconds = max_audio_seconds
        self.bucket_seconds = bucket_seconds
        self.results_dir = results_dir or tempfile.mkdtemp(prefix="lsp_serve_")
        self._person: Optional[str] = None
        self._cfg: Optional[PersonConfig] = None
        self._assets = None
        self._models = None
        self._mesh = None

    def setup(self, person_id: str = "Synthetic",
              config_dir: str = "./config", image_size: int = 512,
              quantize: bool = False, calibrate: bool = True,
              artifact: Optional[str] = None,
              f2f_ckpt: str = "", a2f_ckpt: str = "",
              a2h_ckpt: str = "", apc_ckpt: str = "",
              data_parallel: bool = False) -> None:
        """Load the subject's config, assets and checkpoints once.

        quantize=True int8-quantizes the renderer for inference (frames
        within PSNR>30 dB of the float path - see
        assets.quantize_person_models); default stays exact.  calibrate
        (with quantize) additionally bakes STATIC activation scales,
        measured on renderer inputs generated from a one-second test
        sweep for this subject, so every request skips the per-conv
        dynamic amax reductions (257 -> 275 fps at 512^2 on v5e).

        data_parallel=True shards each predict() render batch over every
        visible chip (frames are independent; zero steady-state
        communication); stream() stays single-chip - it is latency-bound,
        not throughput-bound.

        artifact: path to a serving-model .npz
        (assets.save_models_artifact).  If the file exists the model
        trees - already quantized/calibrated/whatever was saved - load
        from it and quantize/calibrate are ignored; otherwise the trees
        built here are written to it, so the NEXT boot is one file
        read."""
        from livespeechportraits_tpu.utils import compile_cache

        compile_cache.enable()  # server restarts reuse the 512^2 compiles
        cfg_path = os.path.join(config_dir, person_id + ".yaml")
        if os.path.exists(cfg_path):
            cfg = load_person_config(cfg_path, name=person_id)
        else:
            cfg = PersonConfig(name=person_id)
        if person_id == "Synthetic" or not cfg.data_root:
            import math

            from livespeechportraits_tpu.config import replace

            n_down = min(8, int(math.log2(image_size)))
            cfg = replace(cfg, feature2face=replace(
                cfg.feature2face, load_size=image_size, n_downsample=n_down))
            self._assets, models = assets_mod.make_synthetic_person(
                cfg, image_size=image_size,
                # artifact-first boot skips the model init here too (the
                # trees would be discarded for the .npz below)
                skip_models=bool(artifact and os.path.exists(artifact)))
            if models is not None:
                self._models = models
        else:
            self._assets = assets_mod.load_person(cfg)
            # With a saved artifact, boot is assets + one .npz read: the
            # checkpoint load/convert the artifact exists to skip must not
            # run first (its output would be discarded below).
            if not (artifact and os.path.exists(artifact)):
                self._models = assets_mod.load_person_models(cfg)
        # Frame-sharded data-parallel rendering: frames are independent
        # given the motion outputs, so N chips render N x render_batch
        # frames per dispatch with zero steady-state communication
        # (docs/SCALING.md; 1==N equivalence tested in test_parallel.py).
        # On a single chip the mesh is the identity.
        self._mesh = None
        if data_parallel:
            from livespeechportraits_tpu.parallel import mesh as mesh_mod

            self._mesh = mesh_mod.make_mesh(1)
        if artifact and os.path.exists(artifact):
            if f2f_ckpt or a2f_ckpt or a2h_ckpt or apc_ckpt:
                # never silently serve stale artifact weights over a
                # freshly named checkpoint
                raise ValueError(
                    f"artifact {artifact!r} already exists and would "
                    "shadow the *_ckpt weights; delete it (it will be "
                    "rebuilt from the checkpoints) or drop the ckpt args")
            self._models = assets_mod.load_models_artifact(artifact)
            self._cfg = cfg
            self._person = person_id
            return
        if f2f_ckpt or a2f_ckpt or a2h_ckpt or apc_ckpt:
            # train->serve loop: this framework's own trainer checkpoints
            # (orbax dirs) override the converted/synthetic stages before
            # quantization and artifact save
            self._models = assets_mod.load_trained_person_models(
                cfg, base=self._models, f2f_ckpt=f2f_ckpt,
                a2f_ckpt=a2f_ckpt, a2h_ckpt=a2h_ckpt, apc_ckpt=apc_ckpt)
        if quantize:
            calib = None
            calib_dtype = None
            if calibrate:
                import jax.numpy as jnp

                from livespeechportraits_tpu.pipeline import video as _video

                tone = _video.make_test_tone(1.0)  # 1 s AM sweep
                calib = animate_mod.build_render_inputs(
                    cfg, self._assets, self._models, tone, max_frames=16)
                if cfg.feature2face.precision == "bfloat16":
                    calib_dtype = jnp.bfloat16
            self._models = assets_mod.quantize_person_models(
                self._models, calibrate_inputs=calib,
                calibrate_dtype=calib_dtype)
        if artifact:
            assets_mod.save_models_artifact(self._models, artifact)
        self._cfg = cfg
        self._person = person_id

    def predict(self, driving_audio: str | np.ndarray, seed: int = 0,
                render_batch: int = 16, transfer: str = "yuv420",
                write_video: bool = True) -> PredictResult:
        """audio (path or float32 [-1,1] @16k) -> muxed video path.

        write_video=False skips the host-side mux (video_path '');
        used by tools/prewarm_serving.py, which only needs the device
        programs compiled."""
        if self._cfg is None:
            raise RuntimeError("call setup() first")
        # clean the per-request results dir (predict.py:299-308)
        shutil.rmtree(self.results_dir, ignore_errors=True)
        os.makedirs(self.results_dir, exist_ok=True)

        if isinstance(driving_audio, str):
            audio = video_mod.load_wav(driving_audio)
            name = os.path.splitext(os.path.basename(driving_audio))[0]
        else:
            audio = np.asarray(driving_audio, np.float32)
            name = "request"
        cap = int(self.max_audio_seconds * 16000)
        if audio.shape[0] > cap:  # trim like predict.py:145-153
            audio = audio[:cap]

        true_audio = audio
        true_frames = int(len(true_audio) / 16000 * 60) - \
            self._cfg.audio2headpose.frame_future
        if true_frames <= 0:
            # bucket padding would let animate() run, then frames[:<=0]
            # and a negative valid_len would silently corrupt the output
            ff = self._cfg.audio2headpose.frame_future
            raise ValueError(
                f"audio too short: {len(true_audio) / 16000:.2f}s yields "
                f"{true_frames} frames after the head-pose decoder's "
                f"{ff}-frame lookahead; send > {(ff + 1) / 60:.2f}s")
        valid_frames = None
        if self.bucket_seconds > 0:
            bucket = int(self.bucket_seconds * 16000)
            padded = -(-len(audio) // bucket) * bucket
            audio = np.pad(audio, (0, padded - len(audio)))
            valid_frames = int(len(true_audio) / 16000 * 60)

        if self._mesh is not None:
            # the render batch shards over `data`; round up so any
            # requested batch works on any device count
            n = int(self._mesh.shape["data"])
            render_batch = -(-render_batch // n) * n
        t0 = time.perf_counter()
        # frames leave the device as packed YUV 4:2:0 by default (half the
        # host-link bytes; the video encoder consumes 4:2:0 anyway), and
        # the whole motion half runs as ONE device program (fused=True:
        # ~6x fewer dispatch round-trips per request)
        result = animate_mod.animate(self._cfg, self._assets, self._models,
                                     audio, seed=seed, render_batch=render_batch,
                                     transfer=transfer, valid_frames=valid_frames,
                                     fused=True, mesh=self._mesh)
        wall = time.perf_counter() - t0
        frames = result.frames[:true_frames]
        out_path = ""
        if write_video:
            out_path = os.path.join(self.results_dir, f"{name}.avi")
            video_mod.write_video(frames, out_path, true_audio)
        return PredictResult(video_path=out_path, nframe=len(frames),
                             wall_s=wall, stage_ms=result.stage_ms)

    def stream(self, driving_audio: str | np.ndarray, seed: int = 0,
               render_batch: int = 8, push_samples: int = 1600,
               pipeline_depth: int = 1, transfer: str = "rgb",
               smooth_latency_cap: Optional[int] = None):
        """Incremental serving: yields [n, H, W, 3] uint8 frame batches as
        they are determined while the audio is still being consumed (the
        reference's cog surface, predict.py, only returns whole clips).

        Pushes `push_samples` (default 100 ms) of audio at a time through
        StreamingAnimator - offline-identical outputs, first frames after
        the algorithmic latency (~0.92 s at May settings, or less with
        smooth_latency_cap) rather than after the whole clip renders."""
        if self._cfg is None:
            raise RuntimeError("call setup() first")
        from livespeechportraits_tpu.pipeline.streaming import StreamingAnimator

        if isinstance(driving_audio, str):
            audio = video_mod.load_wav(driving_audio)
        else:
            audio = np.asarray(driving_audio, np.float32)
        cap = int(self.max_audio_seconds * 16000)
        if audio.shape[0] > cap:
            audio = audio[:cap]

        st = StreamingAnimator(self._cfg, self._assets, self._models,
                               seed=seed, render_batch=render_batch,
                               pipeline_depth=pipeline_depth,
                               transfer=transfer,
                               smooth_latency_cap=smooth_latency_cap)
        try:
            for lo in range(0, len(audio), push_samples):
                out = st.push_audio(audio[lo : lo + push_samples])
                if len(out):
                    yield out
            out = st.flush()
            if len(out):
                yield out
        finally:
            # a consumer that abandons the generator mid-stream (client
            # disconnect) must still release the per-stream worker threads
            st.close()

"""Host-side audio/video IO: wav loading, frame dumping, muxing.

Capability parity with demo.py:35-45 (write_video_with_audio: cv2
VideoWriter DIVX @60fps + ffmpeg audio mux) and the librosa wav IO, with
librosa/ffmpeg absent from this image: wav IO uses scipy, muxing uses
ffmpeg when available on PATH and otherwise leaves the .avi + .wav pair
side by side (documented fallback).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from scipy.io import wavfile
from scipy.signal import resample_poly

from livespeechportraits_tpu.config import FPS, SAMPLE_RATE


def load_wav(path: str, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Read a wav file -> float32 mono [-1, 1] at target_sr (librosa.load
    parity for the demo's inputs)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    if sr != target_sr:
        from math import gcd

        g = gcd(sr, target_sr)
        audio = resample_poly(audio, target_sr // g, sr // g).astype(np.float32)
    return audio


def save_wav(path: str, audio: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    wavfile.write(path, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16))


def write_video(
    frames: np.ndarray,
    output_path: str,
    audio: Optional[np.ndarray] = None,
    fps: int = FPS,
    sr: int = SAMPLE_RATE,
) -> str:
    """frames [T, H, W, 3] uint8 RGB -> .avi (+ audio mux when ffmpeg is
    present; else audio saved next to the video).  Returns the video path.
    """
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable; cannot write video")
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    T, H, W, _ = frames.shape
    # container follows the extension: DIVX avi (reference demo.py:36) or
    # mp4v mp4 (the reference's predict.py re-encodes to mp4, 274-281)
    fourcc = "mp4v" if output_path.lower().endswith(".mp4") else "DIVX"
    tmp_path = output_path + ".tmp" + os.path.splitext(output_path)[1]
    out = cv2.VideoWriter(tmp_path, cv2.VideoWriter_fourcc(*fourcc), fps, (W, H))
    for t in range(T):
        out.write(cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
    out.release()

    if audio is not None:
        audio_clip = audio[: int(T * sr / fps)]
        wav_path = os.path.splitext(output_path)[0] + ".wav"
        save_wav(wav_path, audio_clip, sr)
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is not None:
            # mp4 cannot carry pcm_s16le under '-codec copy' - transcode
            # the audio to aac there; avi keeps the straight copy
            acodec = ["-c:a", "aac"] if output_path.lower().endswith(".mp4") \
                else ["-c:a", "copy"]
            rc = subprocess.call(
                [ffmpeg, "-y", "-i", tmp_path, "-i", wav_path, "-c:v", "copy",
                 *acodec, "-shortest", output_path],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if rc == 0 and os.path.getsize(output_path) > 0:
                os.remove(tmp_path)
                os.remove(wav_path)
                return output_path
            # mux failed: NEVER destroy the rendered video - ship it
            # un-muxed with the wav beside it, like the no-ffmpeg path
            print(f"ffmpeg mux failed (rc={rc}); writing video without "
                  f"embedded audio, wav kept at {wav_path}")
    os.replace(tmp_path, output_path)
    return output_path


def make_test_tone(seconds: float = 3.0, sr: int = SAMPLE_RATE) -> np.ndarray:
    """220 Hz AM test tone - the shared no-audio fallback (demo/bench)."""
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)


def save_frames(frames: np.ndarray, save_root: str, prefix: str = "pred_") -> None:
    """Dump numbered jpgs like Visualizer.save_images (demo.py:268-272)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("cv2 unavailable")
    os.makedirs(save_root, exist_ok=True)
    for i, frame in enumerate(frames):
        img = frame if frame.ndim == 3 else np.repeat(frame[..., None], 3, axis=-1)
        cv2.imwrite(os.path.join(save_root, f"{prefix}{i + 1}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

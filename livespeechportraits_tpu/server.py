"""Minimal HTTP serving front-end over serve.Predictor.

The reference's web surface is a Replicate cog container (predict.py,
cog.yaml); this is the dependency-free equivalent: a stdlib http.server
that accepts a wav upload and streams back the rendered video.

    python -m livespeechportraits_tpu.server --id Synthetic --port 8080

    curl -X POST --data-binary @input.wav \
         -H 'Content-Type: audio/wav' \
         http://localhost:8080/animate -o out.avi

POST /stream returns the frames as a live multipart MJPEG stream
(multipart/x-mixed-replace) while the clip is still being generated -
any browser <img> tag or MJPEG client renders it as it arrives.
GET /healthz returns pipeline/device status.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from livespeechportraits_tpu.serve import Predictor


def make_handler(predictor: Predictor):
    # One request renders at a time (a single chip is one in-order queue);
    # the lock serialises /animate and /stream while /healthz stays
    # instant on its own thread (ThreadingHTTPServer).
    device_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default logging
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                info = {
                    "status": "ok",
                    "person": predictor._person,
                    "device": str(jax.devices()[0]),
                    "max_audio_seconds": predictor.max_audio_seconds,
                }
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def _read_wav_body(self):
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send(400, b"empty body", "text/plain")
                return None
            return self.rfile.read(length)

        def _do_stream(self, payload: bytes) -> None:
            """POST /stream[?latency_cap=N]: frames leave as a multipart
            MJPEG stream (multipart/x-mixed-replace) WHILE the clip is
            still being generated - first parts arrive after the
            pipeline's algorithmic latency (truncatable to N frames via
            latency_cap), not after the whole clip renders.  The stream
            end is delimited by the closing boundary + connection close
            (no Content-Length).  Device frames cross as YUV 4:2:0 - the
            JPEG re-encode subsamples chroma anyway, so the halved
            transfer is free."""
            import os
            import tempfile
            from urllib.parse import parse_qs, urlparse

            import cv2
            import numpy as np
            from scipy.io import wavfile

            qs = parse_qs(urlparse(self.path).query)
            cap = (int(qs["latency_cap"][0])
                   if qs.get("latency_cap") else None)
            sr, data = wavfile.read(io.BytesIO(payload))  # validate first
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(payload)
                wav_path = f.name
            try:
                gen = predictor.stream(wav_path, transfer="yuv420",
                                       smooth_latency_cap=cap)
                # A stalled client must not wedge the render path: the
                # device lock is held only while ADVANCING the generator
                # (device work); socket writes happen outside it, and the
                # connection gets a timeout so dead peers error out.
                self.connection.settimeout(60.0)
                self.send_response(200)
                self.send_header(
                    "Content-Type", "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                while True:
                    with device_lock:
                        batch = next(gen, None)
                    if batch is None:
                        break
                    for frame in batch:
                        ok, jpg = cv2.imencode(
                            ".jpg", np.asarray(frame)[..., ::-1])  # RGB->BGR
                        if not ok:
                            raise RuntimeError("jpeg encode failed")
                        part = jpg.tobytes()
                        self.wfile.write(b"--frame\r\n"
                                         b"Content-Type: image/jpeg\r\n"
                                         + f"Content-Length: {len(part)}\r\n\r\n".encode()
                                         + part + b"\r\n")
                self.wfile.write(b"--frame--\r\n")
            finally:
                os.unlink(wav_path)

        def do_POST(self):
            if self.path.split("?")[0] == "/stream":
                payload = self._read_wav_body()
                if payload is None:
                    return
                try:
                    self._do_stream(payload)
                except Exception as e:
                    try:  # headers may already be out; best-effort error
                        self._send(400, f"error: {e}".encode(), "text/plain")
                    except Exception:
                        pass
                return
            if self.path.split("?")[0] != "/animate":  # match /stream's
                self._send(404, b"not found", "text/plain")  # query handling
                return
            payload = self._read_wav_body()
            if payload is None:
                return
            try:
                import os
                import tempfile

                from scipy.io import wavfile

                wavfile.read(io.BytesIO(payload))  # validate before rendering
                with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                    f.write(payload)
                    wav_path = f.name
                try:
                    with device_lock:
                        result = predictor.predict(wav_path)
                        # read INSIDE the lock: the next request's
                        # predict() starts by rmtree-ing the shared
                        # results_dir, which would race this open()
                        with open(result.video_path, "rb") as f:
                            body = f.read()
                finally:
                    os.unlink(wav_path)
                self.send_response(200)
                self.send_header("Content-Type", "video/x-msvideo")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("X-Frames", str(result.nframe))
                self.send_header("X-Wall-Seconds", f"{result.wall_s:.3f}")
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # surface errors as 400s with the message
                self._send(400, f"error: {e}".encode(), "text/plain")

    return Handler


def serve_forever(person_id: str = "Synthetic", port: int = 8080,
                  image_size: int = 512, config_dir: str = "./config",
                  max_audio_seconds: float = 10.0,
                  quantize: bool = False,
                  artifact: str = "",
                  f2f_ckpt: str = "", a2f_ckpt: str = "",
                  a2h_ckpt: str = "", apc_ckpt: str = "",
                  data_parallel: bool = False) -> None:
    predictor = Predictor(max_audio_seconds=max_audio_seconds)
    predictor.setup(person_id, config_dir=config_dir, image_size=image_size,
                    quantize=quantize, artifact=artifact or None,
                    f2f_ckpt=f2f_ckpt, a2f_ckpt=a2f_ckpt, a2h_ckpt=a2h_ckpt,
                    apc_ckpt=apc_ckpt, data_parallel=data_parallel)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(predictor))
    print(f"serving '{person_id}' on :{port} (POST /animate, GET /healthz)")
    server.serve_forever()  # blocks until shutdown()/KeyboardInterrupt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--id", default="Synthetic")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--config_dir", default="./config")
    p.add_argument("--max_audio_seconds", type=float, default=10.0)
    p.add_argument("--quantize", action="store_true",
                   help="int8 renderer (calibrated static scales; frames "
                        "within PSNR>30dB of the float path)")
    p.add_argument("--artifact", default="",
                   help="serving-model .npz: load the model trees from it "
                        "if it exists, else build (honouring --quantize) "
                        "and save to it so the next boot is one file read")
    p.add_argument("--f2f_ckpt", default="",
                   help="orbax ckpt dir of a train.py feature2face run "
                        "(serve this framework's own trained renderer)")
    p.add_argument("--a2f_ckpt", default="",
                   help="orbax ckpt dir of a train.py audio2feature run")
    p.add_argument("--a2h_ckpt", default="",
                   help="orbax ckpt dir of a train.py audio2headpose run")
    p.add_argument("--apc_ckpt", default="",
                   help="orbax ckpt dir of a train.py apc pretraining run")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each request's render batch over all "
                        "visible chips (frames are independent; zero "
                        "steady-state communication)")
    args = p.parse_args()
    serve_forever(args.id, args.port, args.image_size, args.config_dir,
                  args.max_audio_seconds, quantize=args.quantize,
                  artifact=args.artifact,
                  f2f_ckpt=args.f2f_ckpt, a2f_ckpt=args.a2f_ckpt,
                  a2h_ckpt=args.a2h_ckpt, apc_ckpt=args.apc_ckpt,
                  data_parallel=args.data_parallel)


if __name__ == "__main__":
    main()

"""HTTP serving front-end: health check + wav upload -> video response."""

import io
import os
import threading
import urllib.request

import numpy as np
import pytest
from http.server import ThreadingHTTPServer
from scipy.io import wavfile

from livespeechportraits_tpu.serve import Predictor
from livespeechportraits_tpu.server import make_handler


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    predictor = Predictor(max_audio_seconds=1.0,
                          results_dir=str(tmp_path_factory.mktemp("srv")))
    predictor.setup("Synthetic", image_size=64)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def test_healthz(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/healthz") as r:
        assert r.status == 200
        import json

        info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["person"] == "Synthetic"


def test_animate_roundtrip(server_port, tmp_path):
    t = np.arange(int(0.6 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, audio)

    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/animate", data=buf.getvalue(),
        headers={"Content-Type": "audio/wav"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        nframes = int(r.headers["X-Frames"])
        body = r.read()
    assert nframes == int(0.6 * 60) - 15
    assert len(body) > 1000  # a real video came back

    # decodable
    import cv2

    p = tmp_path / "resp.avi"
    p.write_bytes(body)
    cap = cv2.VideoCapture(str(p))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == nframes


def test_bad_requests(server_port):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/animate", data=b"not audio",
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"http://127.0.0.1:{server_port}/nope", timeout=60)
    assert exc.value.code == 404


def test_predictor_quantize_calibrates_static_scales(tmp_path):
    """Predictor.setup(quantize=True) self-calibrates static int8
    activation scales on a synthetic sweep and still serves requests."""
    predictor = Predictor(max_audio_seconds=1.0, results_dir=str(tmp_path / "q"))
    predictor.setup("Synthetic", image_size=64, quantize=True)
    f2f = predictor._models.feature2face
    assert "w_q" in f2f["net"]["sub"]["down"]
    assert "x_scale" in f2f["net"]["sub"]["down"]

    t = np.arange(int(0.6 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    res = predictor.predict(audio, render_batch=4)
    assert res.nframe == int(0.6 * 60) - 15
    import os

    assert os.path.exists(res.video_path)


def test_stream_endpoint_mjpeg(server_port):
    """POST /stream returns a multipart MJPEG stream of the full clip,
    each part a decodable JPEG frame."""
    t = np.arange(int(0.6 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, audio)

    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/stream", data=buf.getvalue(),
        headers={"Content-Type": "audio/wav"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
        body = r.read()  # until the server closes the stream

    import cv2

    parts = body.split(b"--frame\r\n")
    frames = []
    for part in parts:
        if not part or part.startswith(b"--frame--"):
            continue
        head, _, rest = part.partition(b"\r\n\r\n")
        n = int([l for l in head.split(b"\r\n") if b"Content-Length" in l][0]
                .split(b":")[1])
        jpg = rest[:n]
        img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
        assert img is not None and img.shape[2] == 3
        frames.append(img)
    assert body.rstrip().endswith(b"--frame--")
    assert len(frames) == int(0.6 * 60) - 15


def test_stream_endpoint_latency_cap(server_port):
    """/stream?latency_cap=N truncates the smoothing look-ahead; the
    stream still delivers the full frame count."""
    t = np.arange(int(0.6 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, audio)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/stream?latency_cap=6",
        data=buf.getvalue(), headers={"Content-Type": "audio/wav"},
        method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        body = r.read()
    assert body.count(b"Content-Type: image/jpeg") == int(0.6 * 60) - 15


def test_serving_artifact_roundtrip(tmp_path):
    """save_models_artifact/load_models_artifact: the full quantized +
    calibrated + subpixel model trees survive one .npz bit-for-bit, and
    Predictor.setup(artifact=...) builds-then-saves on first boot and
    loads on the second."""
    import jax
    import jax.numpy as jnp

    from livespeechportraits_tpu.pipeline import animate as animate_mod
    from livespeechportraits_tpu.pipeline import assets as assets_mod
    from tests.test_pipeline import tiny_person, _sine_audio

    cfg = tiny_person()
    a, m = assets_mod.make_synthetic_person(cfg, key=jax.random.PRNGKey(5),
                                            image_size=64, bank_size=64)
    calib = animate_mod.build_render_inputs(cfg, a, m, _sine_audio(0.7),
                                            max_frames=4)
    mq = assets_mod.quantize_person_models(m, calibrate_inputs=calib,
                                           subpixel="single")
    path = str(tmp_path / "model.npz")
    assets_mod.save_models_artifact(mq, path)
    loaded = assets_mod.load_models_artifact(path)
    for field in ("apc", "audio2feature", "audio2headpose", "feature2face"):
        ref_t = getattr(mq, field)
        got_t = getattr(loaded, field)
        ref_leaves = jax.tree.leaves(ref_t)
        got_leaves = jax.tree.leaves(got_t)
        assert len(ref_leaves) == len(got_leaves)
        for r, g in zip(ref_leaves, got_leaves):
            if hasattr(r, "dtype"):
                assert np.asarray(r).dtype == np.asarray(g).dtype
                np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
            else:
                assert r == g
    # int8 + scales survived
    assert loaded.feature2face["net"]["sub"]["down"]["w_q"].dtype == np.int8
    assert "x_scale" in loaded.feature2face["net"]["sub"]["down"]
    assert "w_sp1_q" in loaded.feature2face["net"]["sub"]["up"]

    # Predictor boot cycle: first setup saves, second loads
    art = str(tmp_path / "srv.npz")
    p1 = Predictor(max_audio_seconds=1.0, results_dir=str(tmp_path / "r1"))
    p1.setup("Synthetic", image_size=64, quantize=True, artifact=art)
    assert os.path.exists(art)
    p2 = Predictor(max_audio_seconds=1.0, results_dir=str(tmp_path / "r2"))
    p2.setup("Synthetic", image_size=64, artifact=art)
    assert "w_q" in p2._models.feature2face["net"]["sub"]["down"]
    r = p2.predict(_sine_audio(0.6), render_batch=4)
    assert r.nframe == int(0.6 * 60) - 15


def test_healthz_responds_during_render(server_port):
    """The threaded server answers /healthz while an /animate request is
    rendering (the device lock serialises renders, not health checks)."""
    import json
    import threading

    t = np.arange(int(0.6 * 16000)) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, audio)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/animate", data=buf.getvalue(),
        headers={"Content-Type": "audio/wav"}, method="POST")
    result = {}

    def animate():
        with urllib.request.urlopen(req, timeout=600) as r:
            result["frames"] = int(r.headers["X-Frames"])

    th = threading.Thread(target=animate)
    th.start()
    # health check while the render is (very likely) in flight
    ok = 0
    for _ in range(5):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server_port}/healthz", timeout=30) as r:
            ok += json.loads(r.read())["status"] == "ok"
    th.join()
    assert ok == 5
    assert result["frames"] == int(0.6 * 60) - 15


def test_predictor_synthetic_artifact_boot(tmp_path):
    """Synthetic artifact-first boot: the first setup builds + saves the
    serving trees; a second Predictor boots from the .npz WITHOUT
    re-initialising the synthetic models (make_synthetic_person
    skip_models) and predicts identical frame counts."""
    from livespeechportraits_tpu.serve import Predictor

    art = str(tmp_path / "synth_models.npz")
    p1 = Predictor(max_audio_seconds=1.0, results_dir=str(tmp_path / "r1"))
    p1.setup("Synthetic", image_size=64, artifact=art)
    assert os.path.exists(art)
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    r1 = p1.predict(audio, render_batch=4)

    p2 = Predictor(max_audio_seconds=1.0, results_dir=str(tmp_path / "r2"))
    p2.setup("Synthetic", image_size=64, artifact=art)
    r2 = p2.predict(audio, render_batch=4)
    assert r2.nframe == r1.nframe
